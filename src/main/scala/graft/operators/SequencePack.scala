package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: lay a document corpus
  * end-to-end on a token axis and chunk it into fixed context windows
  * (the concat-then-chunk discipline LLM pretraining uses — documents
  * may span window boundaries; the accounting per document is which
  * windows it lands in and at what offset).
  *
  * The core primitive is a GLOBAL ordered cumulative sum, which a naive
  * `Window.orderBy(...)` computes by shuffling everything to ONE
  * partition — a scale-killer at 100 TB. [[globalRunningOffset]] instead
  * uses the classic two-phase distributed scan:
  *
  *   1. range-repartition by the order key, sort within partitions;
  *   2. per-partition running sums via a window PARTITIONED BY the
  *      physical partition id (no cross-partition shuffle);
  *   3. per-partition totals — one row per partition, a bounded manifest
  *      (~hundreds of rows at any scale) — prefix-scanned on the driver
  *      and joined back as broadcast offsets.
  *
  * The result is identical to the single-partition window (the oracle
  * replays it as a plain SQL window function) while every data-sized
  * step stays fully parallel. Beyond-the-reference operator (SURVEY §2
  * training-pipeline tier); the per-doc token measure matches
  * q_text_tokens' whitespace tokenizer.
  */
object SequencePack {

  /** `docs(key, n)` → `(key, n, start)` where `start` is the exact sum of
    * `n` over all rows with a smaller `key` (global order). `parts` caps
    * the scan's parallelism for small inputs; pass the session shuffle
    * default for large ones. */
  def globalRunningOffset(docs: DataFrame, key: String, n: String,
      parts: Int): DataFrame = {
    // materialize the range layout ONCE (eager localCheckpoint): the
    // running-sum pass and the totals manifest must see the SAME row →
    // partition assignment, and a range partitioner re-samples per
    // execution — the same double-execution pitfall RDD.zipWithIndex
    // solves by pinning its first pass. The checkpoint is narrow
    // ((key, n) pairs only), so the pin costs far less than the global
    // single-partition sort it replaces.
    val ranged = docs.select(col(key), col(n))
      .repartitionByRange(parts, col(key))
      .sortWithinPartitions(key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // 2. intra-partition running sum (window keyed on the physical
    // partition — each partition scans independently, no global shuffle)
    val local = ranged.withColumn("__local",
      sum(col(n)).over(Window.partitionBy(col("__pid")).orderBy(col(key)))
        - col(n))
    // 3. bounded per-partition manifest → driver prefix scan → broadcast
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(n)).as("__ptot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).collect { case w if w.length == 2 => (w(1)._1, w(0)._2) }.toSeq
    val spark = docs.sparkSession
    val offsets = spark.createDataFrame(prefix).toDF("__pid", "__poff")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("start", col("__local") + col("__poff"))
      .drop("__pid", "__local", "__poff")
  }

  val all: Seq[Q] = Seq(

    // ---- concat-then-chunk packing accounting: every document's token
    //      span on the global axis, the windows it touches, and whether
    //      it straddles a boundary. The oracle replays the running offset
    //      as a plain SQL window — same numbers, single-node plan. ----
    Q("q_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
        |  FROM t)
        |SELECT doc_id, n_tokens, start,
        |  (start // 2048)::BIGINT AS first_chunk,
        |  ((start + n_tokens - 1) // 2048)::BIGINT AS last_chunk,
        |  ((start // 2048) <> ((start + n_tokens - 1) // 2048)) AS spans_boundary
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val window = 2048L
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      globalRunningOffset(toks, "doc_id", "n_tokens", parts)
        .withColumn("first_chunk", floor(col("start") / window))
        .withColumn("last_chunk", floor((col("start") + col("n_tokens") - 1) / window))
        .select(col("doc_id"), col("n_tokens"), col("start"),
          col("first_chunk"), col("last_chunk"),
          (col("first_chunk") =!= col("last_chunk")).as("spans_boundary"))
        .orderBy("doc_id")
    },

    // ---- window occupancy: tokens landing in each context window (the
    //      packing efficiency report a pipeline checks before training —
    //      full windows everywhere except the tail). A document spread
    //      over k windows contributes its per-window overlap; computed by
    //      exploding each doc's [first_chunk, last_chunk] span (bounded:
    //      a doc touches ⌈n/W⌉+1 windows), then one groupBy. ----
    Q("q_pack_occupancy",
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
        |  FROM t),
        |spans AS (
        |  SELECT c.doc_id, c.n_tokens, c.start, w.chunk_id
        |  FROM c, UNNEST(generate_series(c.start // 2048,
        |                                 (c.start + c.n_tokens - 1) // 2048)) AS w(chunk_id)),
        |occ AS (
        |  SELECT chunk_id,
        |    sum(least(start + n_tokens, (chunk_id + 1) * 2048)
        |        - greatest(start, chunk_id * 2048))::BIGINT AS tokens,
        |    count(*) AS n_docs
        |  FROM spans GROUP BY chunk_id)
        |SELECT chunk_id::BIGINT AS chunk_id, tokens, n_docs
        |FROM occ ORDER BY chunk_id""".stripMargin) { (s, d) =>
      val window = 2048L
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val c = globalRunningOffset(toks, "doc_id", "n_tokens", parts)
      c.withColumn("chunk_id",
          explode(sequence(floor(col("start") / window),
            floor((col("start") + col("n_tokens") - 1) / window))))
        .groupBy("chunk_id")
        .agg(
          sum(least(col("start") + col("n_tokens"), (col("chunk_id") + 1) * window)
            - greatest(col("start"), col("chunk_id") * window)).as("tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("chunk_id")
    }
  )
}
