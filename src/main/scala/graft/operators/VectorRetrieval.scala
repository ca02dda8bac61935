package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector retrieval completeness tier: quantization, sparse vectors,
  * score fusion (RRF / hybrid / MMR / rerank-by-recommend), score
  * transforms.
  *
  * Reference semantics re-expressed (SURVEY.md §2.9 vector tail):
  *   - int8 quantization: function/sql/vector/SQLFunctionVectorQuantizeInt8
  *     .java (min/max scale → [0,255] → shift −128; min==max → all 0;
  *     Math.round == floor(x+0.5) for the non-negative scaled values).
  *   - binary quantization: SQLFunctionVectorQuantizeBinary.java (bit i set
  *     iff v[i] >= exact median; even length → mean of middle two; packed
  *     little-endian 8 bits per byte).
  *   - sparse vectors: SparseVector.java ((indices, values, dim) — here a
  *     dim-posting DataFrame), SQLFunctionVectorDenseToSparse.java (keep
  *     |v| > threshold), SQLFunctionVectorSparsity.java (fraction of
  *     |v| < threshold; L0 = count of |v| >= threshold),
  *     SQLFunctionVectorSparseDot.java + the BMW top-k retrieval shape of
  *     index/sparsevector/BmwScorer.java — in Spark the inverted dim-posting
  *     join IS the pruning: only postings of the query's dims are scanned.
  *   - RRF: SQLFunctionVectorRRFScore.java (sum of 1/(k+rank), k=60,
  *     null/absent rank skipped).
  *   - hybrid: SQLFunctionVectorHybridScore.java (alpha*vec +
  *     (1-alpha)*keyword) over SQLFunctionVectorNormalizeScores.java
  *     min-max normalization.
  *   - MMR: SQLFunctionVectorMmr.java (greedy argmax of
  *     lambda*score − (1−lambda)*max(0, maxCosToSelected); first pick by
  *     score; candidates all in memory per query — here per-query groups,
  *     never a global collect).
  *   - recommend: SQLFunctionVectorRecommend.java (Qdrant average_vector:
  *     q = mean(pos) − mean(neg), kNN(q), examples excluded).
  *   - score transforms: SQLFunctionVectorScoreTransform.java
  *     (sigmoid/tanh/exp/linear).
  *
  * Determinism: all math in double after one explicit cast; every
  * engine-crossing score is rounded to 6 digits before ranking; ties break
  * on ids.
  *
  * Scale design (100 TB): quantize/transform/sparsity are per-row narrow
  * projections (whole-stage codegen, no shuffle). Sparse top-k shuffles
  * only the postings matching the query's dims. RRF/hybrid fuse bounded
  * top-N lists per query. MMR greedily selects inside each query's bounded
  * candidate group — the group is the unit of parallelism, so 10^6 queries
  * fan out across executors with no driver state.
  */
object VectorRetrieval {

  val SparseThreshold = 0.2

  /** Sparse posting list: one row per (vec_id, dim, w) with |w| > threshold
    * (denseToSparse semantics). `dim` is 0-based. At 100 TB this DataFrame
    * is a table bucketed by `dim` — the BMW-style index. */
  def sparsePostings(emb: DataFrame, threshold: Double): DataFrame =
    emb.select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "w")))
      .filter(abs(col("w")) > threshold)

  /** Sparse top-k: score(corpus doc) = Σ_d q_d · w_d over shared dims.
    * Postings are pruned to the query's dims before the join; the final
    * rank is TakeOrdered-shaped ([[TopK.ranked]]) — no corpus-global
    * single-partition sort. */
  def sparseTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val p = sparsePostings(emb, SparseThreshold)
    val q = p.filter(col("vec_id") === queryVecId)
      .select(col("dim"), col("w").as("qw"))
    val scored = p.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("dim"))
      .groupBy("vec_id")
      .agg(round(sum(col("w") * col("qw")), 6).as("score"))
    TopK.ranked(scored, k, "rn", col("score").desc, col("vec_id"))
  }

  /** Pruned top-k result. `postingsScored` is LAZY — the bench/query path
    * never pays its count job; the pruning specs invoke it (r5/r6 verdict:
    * the eager `count()` actions cost more than the pruning saved). */
  final case class PrunedTopK(topk: DataFrame, postingsScored: () => Long,
      postingsTotal: Long)

  /** Per-dim stats + θ seed shared by the WAND variants: ONE collect gives
    * both the upper bounds and the total posting count (≤ query-nnz rows),
    * one more gives the k-row θ seed. */
  private final case class WandPrep(
      ubs: Seq[(Int, Double)], totalPostings: Long, theta: Double)

  private def wandPrep(pq: DataFrame, k: Int): WandPrep = {
    val stats = pq.groupBy("dim")
      .agg(max(col("c")).as("ub"), count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("ub"), r.getAs[Long]("n"))).toSeq
    val ubs = stats.map(s => s._1 -> s._2)
    val total = stats.map(_._3).sum
    if (ubs.isEmpty) return WandPrep(ubs, total, Double.NegativeInfinity)
    // θ = k-th exact score among the docs of the single highest-impact
    // dim — any subset's k-th lower-bounds the true k-th. One groupBy
    // job: full score + a seed-dim hit flag per doc (no distinct, no
    // broadcast build — the r6 verdict's action-count complaint)
    val seedDim = ubs.maxBy(u => (u._2, -u._1))._1
    val seed = pq.groupBy("vec_id")
      .agg(sum(col("c")).as("s"),
        max((col("dim") === seedDim).cast("int")).as("h"))
      .filter(col("h") === 1)
      .orderBy(col("s").desc, col("vec_id")).limit(k).collect()
    val theta = if (seed.length < k) Double.NegativeInfinity
      else seed.last.getAs[Double]("s")
    WandPrep(ubs, total, theta)
  }

  /** WAND's essential-dim set: dims NOT in it can be ignored when looking
    * for candidate docs. A doc restricted to dim set S has score ≤
    * Σ_{d∈S, ub_d>0} ub_d; dims with ub ≤ 0 never RAISE a score, so when
    * θ > 0 they are non-essential for free, and the maximal
    * ascending-positive-ub prefix with Σub < θ joins them (a doc with
    * score ≥ θ must hit an essential dim — the exact invariant). */
  private def essentialDims(ubs: Seq[(Int, Double)], theta: Double): Seq[Int] = {
    val nonPos = ubs.filter(_._2 <= 0).map(_._1)
    val pos = ubs.filter(_._2 > 0).sortBy(u => (u._2, u._1))
    val cum = pos.map(_._2).scanLeft(0.0)(_ + _).drop(1)
    val posPrefix = pos.zip(cum).takeWhile(_._2 < theta).map(_._1._1)
    val nonEssential = (if (theta > 0) nonPos ++ posPrefix else Seq.empty[Int]).toSet
    ubs.map(_._1).filterNot(nonEssential)
  }

  /** Postings below this, fused single-aggregation scoring (one shuffle,
    * no candidate broadcast) beats the two-phase candidate-join shape —
    * the WAND bookkeeping costs more than the avoided scoring work saves
    * (r6 bench: 4 actions dominated at sf0.1). Above it, candidate
    * pruning pays: the candidate set is a small fraction of the corpus
    * and the avoided shuffle volume is the point. */
  val FusedScoringMaxPostings = 1000000L

  /** Fused one-shuffle exact scorer with essential-dim pruning applied
    * AFTER aggregation: every doc is scored in a single groupBy, then
    * docs with no essential-dim posting are dropped (they provably sit
    * below θ). `postingsScored` = postings of the surviving docs, the
    * same accounting as the two-phase shape. */
  private def fusedScore(pq: DataFrame, essential: Seq[Int], total: Long)
      : (DataFrame, () => Long) = {
    val essCol =
      if (essential.isEmpty) max(lit(0))
      else max(col("dim").isin(essential.map(Integer.valueOf): _*).cast("int"))
    val agg = pq.groupBy("vec_id")
      .agg(round(sum(col("c")), 6).as("score"), count(lit(1)).as("np"),
        essCol.as("ess"))
    val surviving = agg.filter(col("ess") === 1)
    (surviving.select(col("vec_id"), col("score")),
      () => surviving.agg(coalesce(sum(col("np")), lit(0L))).head().getLong(0))
  }

  /** WAND-style pruned sparse top-k (index/sparsevector/BmwScorer.java's
    * global-bound tier re-expressed for a distributed posting store):
    * identical result to [[sparseTopK]], but documents that cannot reach
    * the k-th score are never fully scored.
    *
    * Distributed WAND split: (1) per-dim contribution upper bounds
    * ub_d = max(w·q_d) — one tiny aggregate to the driver (the
    * posting-list max-score metadata); (2) the θ seed; (3) full scoring
    * runs only for candidates with ≥ 1 essential-dim posting
    * ([[essentialDims]]). */
  def sparseTopKPruned(emb: DataFrame, queryVecId: Long, k: Int): PrunedTopK = {
    val p = sparsePostings(emb, SparseThreshold)
    val q = p.filter(col("vec_id") === queryVecId).select(col("dim"), col("w").as("qw"))
    val pq = p.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("dim"))
      .select(col("vec_id"), col("dim"), (col("w") * col("qw")).as("c"))
      .persist()
    val prep = wandPrep(pq, k)
    val (scored, scoredCount) =
      if (prep.ubs.isEmpty)
        (pq.select(col("vec_id"), lit(0.0).as("score")).limit(0), () => 0L)
      else if (prep.totalPostings < FusedScoringMaxPostings)
        fusedScore(pq, essentialDims(prep.ubs, prep.theta), prep.totalPostings)
      else {
        // large-postings regime: candidate pruning BEFORE scoring — only
        // postings of docs that touch an essential dim are aggregated
        val essential = essentialDims(prep.ubs, prep.theta).map(Integer.valueOf)
        val cands = pq.filter(col("dim").isin(essential: _*)).select("vec_id").distinct()
        val hit = pq.join(broadcast(cands), Seq("vec_id"))
        (hit.groupBy("vec_id").agg(round(sum(col("c")), 6).as("score")),
          () => hit.count())
      }
    val out = TopK.ranked(scored, k, "rn", col("score").desc, col("vec_id"))
      .localCheckpoint(eager = true)
    pq.unpersist(blocking = false)
    PrunedTopK(out, scoredCount, prep.totalPostings)
  }

  /** Postings below this, the per-(dim, block) metadata costs more than
    * its extra pruning saves (r6 bench: the block bookkeeping dominated at
    * sf0.1) — [[sparseTopKBlockMax]] then falls back to the global
    * essential test alone, still exact. Block-max pays off on LONG
    * posting lists, the 100-TB regime. */
  val BlockMaxMinPostings = 1000000L

  /** Block-max WAND (the full BmwScorer.java idea): on top of
    * [[sparseTopKPruned]]'s one global upper bound per dim, each posting
    * list is split into doc-id blocks of `blockWidth` and a max
    * contribution is kept PER (dim, block) — the block-max metadata.
    * A block whose ascending-ub dim prefix sums below θ is non-essential
    * for those dims: a doc in it whose postings all fall in that prefix
    * cannot reach θ. Candidates must survive BOTH the global essential
    * test and the per-block one (each is independently sound, so the
    * intersection is — and postingsScored is ≤ the global variant's by
    * construction, strictly lower whenever some block's maxima sit well
    * under the global ones).
    *
    * Scale shape: the (dim, block) maxima and the essentiality prefix are
    * computed as DataFrames (groupBy + one window partitioned by block —
    * block count grows with the corpus, so this metadata NEVER collects
    * to the driver); only θ's k-row seed does. Below `minPostings` the
    * block tier is skipped entirely (see [[BlockMaxMinPostings]]). */
  def sparseTopKBlockMax(emb: DataFrame, queryVecId: Long, k: Int,
      blockWidth: Int = 32,
      minPostings: Long = BlockMaxMinPostings): PrunedTopK = {
    val p = sparsePostings(emb, SparseThreshold)
    val q = p.filter(col("vec_id") === queryVecId).select(col("dim"), col("w").as("qw"))
    val pq = p.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("dim"))
      .select(col("vec_id"), col("dim"), (col("w") * col("qw")).as("c"),
        floor(col("vec_id") / blockWidth).as("blk"))
      .persist()
    val prep = wandPrep(pq, k)
    val theta = prep.theta
    val (scored, scoredCount) =
      if (prep.ubs.isEmpty)
        (pq.select(col("vec_id"), lit(0.0).as("score")).limit(0), () => 0L)
      else if (theta <= 0) {
        // a non-positive θ prunes nothing (negative contributions can
        // never be excluded) — score everything, like the global variant
        (pq.groupBy("vec_id").agg(round(sum(col("c")), 6).as("score")),
          () => prep.totalPostings)
      } else if (prep.totalPostings < minPostings &&
          prep.totalPostings < FusedScoringMaxPostings) {
        // block tier gated off AND small: one fused shuffle (see
        // [[fusedScore]]) — identical candidate set to the global variant
        fusedScore(pq, essentialDims(prep.ubs, theta), prep.totalPostings)
      } else {
        val essG = essentialDims(prep.ubs, theta).map(Integer.valueOf)
        val candsG = pq.filter(col("dim").isin(essG: _*)).select("vec_id").distinct()
        val cands =
          if (prep.totalPostings < minPostings) candsG
          else {
            // per-block essential (dim, blk) pairs: ub ≤ 0 never raises a
            // score; positive ubs ascend per block, inclusive cumsum < θ
            // is the non-essential prefix
            val bubs = pq.groupBy("blk", "dim").agg(max(col("c")).as("ub"))
            val w = Window.partitionBy(col("blk"))
              .orderBy(col("ub").asc, col("dim").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            val essPairs = bubs
              .withColumn("cum", sum(when(col("ub") > 0, col("ub")).otherwise(0.0)).over(w))
              .filter(col("ub") > 0 && col("cum") >= theta)
              .select("blk", "dim")
            val candsB = pq.join(essPairs, Seq("blk", "dim")).select("vec_id").distinct()
            candsG.join(candsB, Seq("vec_id"))
          }
        val hit = pq.join(broadcast(cands), Seq("vec_id"))
        (hit.groupBy("vec_id").agg(round(sum(col("c")), 6).as("score")),
          () => hit.count())
      }
    val out = TopK.ranked(scored, k, "rn", col("score").desc, col("vec_id"))
      .localCheckpoint(eager = true)
    pq.unpersist(blocking = false)
    PrunedTopK(out, scoredCount, prep.totalPostings)
  }

  /** Greedy MMR over one query's candidate group. Scores and pairwise
    * cosines are rounded to 6 digits BEFORE the greedy loop so the
    * selection sequence is bit-identical across engines. Ties pick the
    * lowest id (strict > over ascending-id iteration). */
  private def mmrSelect(
      cands: Seq[(Long, Double, Seq[Double])], lambda: Double, k: Int): Seq[(Int, Long)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = cands.sortBy(_._1)
    val n = byId.length
    val norm = byId.map(c => math.sqrt(dot(c._3, c._3)))
    val picked = Array.fill(n)(false)
    val maxCos = Array.fill(n)(Double.NegativeInfinity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var step = 1
    while (step <= math.min(k, n)) {
      var best = -1; var bestObj = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val penalty = if (step == 1) 0.0 else math.max(0.0, maxCos(i))
          val obj = lambda * byId(i)._2 - (1.0 - lambda) * penalty
          if (obj > bestObj) { bestObj = obj; best = i }
        }
        i += 1
      }
      picked(best) = true
      out += ((step, byId(best)._1))
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val c = r6(dot(byId(j)._3, byId(best)._3) / (norm(j) * norm(best)))
          if (c > maxCos(j)) maxCos(j) = c
        }
        j += 1
      }
      step += 1
    }
    out.toSeq
  }

  /** Distributed MMR: top-`pool` cosine candidates per query, then the
    * greedy loop runs inside each query's group (mapGroups-shaped via
    * collect_list per key — bounded by `pool`, never a driver collect). */
  def mmr(emb: DataFrame, queries: DataFrame, pool: Int, lambda: Double, k: Int): DataFrame = {
    val cand = VectorOps.knnExact(emb, queries, pool)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("score"))
    val vecs = emb.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("v"))
    val withVec = cand.join(vecs, Seq("neighbor_id"))
    val mmrUdf = udf { (rows: Seq[org.apache.spark.sql.Row], l: Double, kk: Int) =>
      mmrSelect(
        rows.map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2))), l, kk)
        .map { case (s, id) => (s, id) }
    }
    withVec.groupBy("query_id")
      .agg(collect_list(struct(col("neighbor_id"), col("score"), col("v"))).as("cands"))
      .select(col("query_id"), explode(mmrUdf(col("cands"), lit(lambda), lit(k))).as("pick"))
      .select(col("query_id"), col("pick._1").as("mmr_rank"), col("pick._2").as("neighbor_id"))
  }

  // ---------- shared column helpers ----------

  private def minMaxNorm(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val mn = min(c).over(w); val mx = max(c).over(w)
    when(mn === mx, lit(0.5)).otherwise((c - mn) / (mx - mn))
  }

  val all: Seq[Q] = Seq(

    // ---- int8 quantization + round-trip error (QuantizeInt8/DequantizeInt8) ----
    Q("q_vec_quantize_int8",
      """SELECT vec_id,
        |  round(mn, 6) AS qmin, round(mx, 6) AS qmax,
        |  q[1] AS q1, q[2] AS q2, q[3] AS q3, q[4] AS q4,
        |  round(list_max(list_transform(list_zip(dq, ev), p -> abs(p[1] - p[2]))), 6) AS maxerr
        |FROM (
        |  SELECT vec_id, ev, mn, mx, q,
        |    list_transform(q, c -> mn + (c + 128) / 255.0 * (mx - mn)) AS dq
        |  FROM (
        |    SELECT vec_id, ev, mn, mx,
        |      CASE WHEN mn = mx
        |        THEN list_transform(ev, x -> 0)
        |        ELSE list_transform(ev, x ->
        |          CAST(floor((x - mn) / (mx - mn) * 255.0 + 0.5) AS INT) - 128)
        |      END AS q
        |    FROM (SELECT vec_id, embedding::DOUBLE[] AS ev,
        |            list_min(embedding::DOUBLE[]) AS mn, list_max(embedding::DOUBLE[]) AS mx
        |          FROM embeddings WHERE vec_id < 50)))
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val base = Tables.embeddings(s, d).filter(col("vec_id") < 50)
        .withColumn("ev", asDouble(col("embedding")))
        .withColumn("mn", array_min(col("ev")))
        .withColumn("mx", array_max(col("ev")))
      val quant = base.withColumn("q",
        when(col("mn") === col("mx"), transform(col("ev"), _ => lit(0)))
          .otherwise(transform(col("ev"), x =>
            floor((x - col("mn")) / (col("mx") - col("mn")) * 255.0 + 0.5).cast("int") - 128)))
        .withColumn("dq", transform(col("q"), c => col("mn") + (c + 128) / 255.0 * (col("mx") - col("mn"))))
      quant.select(col("vec_id"),
        round(col("mn"), 6).as("qmin"), round(col("mx"), 6).as("qmax"),
        element_at(col("q"), 1).as("q1"), element_at(col("q"), 2).as("q2"),
        element_at(col("q"), 3).as("q3"), element_at(col("q"), 4).as("q4"),
        round(array_max(zip_with(col("dq"), col("ev"), (a, b) => abs(a - b))), 6).as("maxerr"))
        .orderBy("vec_id")
    },

    // ---- binary (median-threshold) quantization, little-endian packed ----
    Q("q_vec_quantize_binary",
      """SELECT vec_id, round(med, 6) AS median,
        |  b[1] AS b1, b[2] AS b2, b[3] AS b3, b[4] AS b4,
        |  len(list_filter(ev, x -> x >= med)) AS popcnt
        |FROM (
        |  SELECT vec_id, ev, med,
        |    list_transform(range(len(ev) // 8), j ->
        |      CAST(list_sum(list_transform(range(8), k ->
        |        CASE WHEN ev[8*j + k + 1] >= med THEN (1 << k) ELSE 0 END)) AS INT)) AS b
        |  FROM (
        |    SELECT vec_id, ev,
        |      CASE WHEN len(ev) % 2 = 0
        |        THEN (sv[len(ev) // 2] + sv[len(ev) // 2 + 1]) / 2.0
        |        ELSE sv[len(ev) // 2 + 1] END AS med
        |    FROM (SELECT vec_id, embedding::DOUBLE[] AS ev,
        |            list_sort(embedding::DOUBLE[]) AS sv
        |          FROM embeddings WHERE vec_id < 50)))
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val base = Tables.embeddings(s, d).filter(col("vec_id") < 50)
        .withColumn("ev", asDouble(col("embedding")))
        .withColumn("sv", array_sort(col("ev")))
        .withColumn("n", size(col("ev")))
        .withColumn("med",
          when(col("n") % 2 === 0,
            (element_at(col("sv"), (col("n") / 2).cast("int")) +
             element_at(col("sv"), (col("n") / 2 + 1).cast("int"))) / 2.0)
            .otherwise(element_at(col("sv"), (col("n") / 2 + 1).cast("int"))))
      val packed = base.withColumn("b",
        transform(sequence(lit(0), (col("n") / 8).cast("int") - 1), j =>
          aggregate(sequence(lit(0), lit(7)),
            lit(0.0),
            (acc, k) => acc + when(
              element_at(col("ev"), (j * 8 + k + 1).cast("int")) >= col("med"),
              pow(lit(2.0), k)).otherwise(lit(0.0)))
            .cast("int")))
      packed.select(col("vec_id"), round(col("med"), 6).as("median"),
        element_at(col("b"), 1).as("b1"), element_at(col("b"), 2).as("b2"),
        element_at(col("b"), 3).as("b3"), element_at(col("b"), 4).as("b4"),
        size(filter(col("ev"), _ >= col("med"))).as("popcnt"))
        .orderBy("vec_id")
    },

    // ---- sparsity profile (Sparsity / L0 / DenseToSparse census) ----
    Q("q_vec_sparsity",
      s"""SELECT vec_id,
         |  len(list_filter(embedding::DOUBLE[], x -> abs(x) >= $SparseThreshold)) AS l0,
         |  round(len(list_filter(embedding::DOUBLE[], x -> abs(x) < $SparseThreshold))
         |    / CAST(len(embedding) AS DOUBLE), 6) AS sparsity,
         |  len(list_filter(embedding::DOUBLE[], x -> abs(x) > $SparseThreshold)) AS nnz
         |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).filter(col("vec_id") < 50)
        .withColumn("ev", asDouble(col("embedding")))
        .select(col("vec_id"),
          size(filter(col("ev"), x => abs(x) >= SparseThreshold)).as("l0"),
          round(size(filter(col("ev"), x => abs(x) < SparseThreshold)) /
            size(col("ev")).cast("double"), 6).as("sparsity"),
          size(filter(col("ev"), x => abs(x) > SparseThreshold)).as("nnz"))
        .orderBy("vec_id")
    },

    // ---- sparse dot-product top-k over the dim-posting inverted index ----
    Q("q_vec_sparse_topk",
      s"""WITH p AS (
         |  SELECT vec_id, idx - 1 AS dim, w FROM (
         |    SELECT vec_id, unnest(embedding::DOUBLE[]) AS w,
         |           generate_subscripts(embedding, 1) AS idx
         |    FROM embeddings)
         |  WHERE abs(w) > $SparseThreshold),
         |q AS (SELECT dim, w AS qw FROM p WHERE vec_id = 0),
         |scored AS (
         |  SELECT p.vec_id, round(sum(p.w * q.qw), 6) AS score
         |  FROM p JOIN q USING (dim) WHERE p.vec_id <> 0 GROUP BY p.vec_id)
         |SELECT vec_id, score, rn FROM (
         |  SELECT vec_id, score,
         |    row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM scored)
         |WHERE rn <= 20 ORDER BY rn""".stripMargin) { (s, d) =>
      sparseTopK(Tables.embeddings(s, d), queryVecId = 0, k = 20).orderBy("rn")
    },

    // ---- the same top-k through the WAND/BMW pruned scorer: the oracle
    //      is the EXACT path's full-scoring SQL — pruning must not change
    //      a single row (BmwScorer.java's safety invariant) ----
    Q("q_vec_sparse_topk_bmw",
      s"""WITH p AS (
         |  SELECT vec_id, idx - 1 AS dim, w FROM (
         |    SELECT vec_id, unnest(embedding::DOUBLE[]) AS w,
         |           generate_subscripts(embedding, 1) AS idx
         |    FROM embeddings)
         |  WHERE abs(w) > $SparseThreshold),
         |q AS (SELECT dim, w AS qw FROM p WHERE vec_id = 0),
         |scored AS (
         |  SELECT p.vec_id, round(sum(p.w * q.qw), 6) AS score
         |  FROM p JOIN q USING (dim) WHERE p.vec_id <> 0 GROUP BY p.vec_id)
         |SELECT vec_id, score, rn FROM (
         |  SELECT vec_id, score,
         |    row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM scored)
         |WHERE rn <= 20 ORDER BY rn""".stripMargin) { (s, d) =>
      sparseTopKBlockMax(Tables.embeddings(s, d), queryVecId = 0, k = 20).topk.orderBy("rn")
    },

    // ---- reciprocal-rank fusion of cosine + L2 rankings (RRFScore) ----
    Q("q_vec_rrf",
      """WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(qv, e.embedding::DOUBLE[])
        |      / (sqrt(list_dot_product(qv,qv))
        |         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos,
        |    sqrt(list_sum(list_transform(list_zip(qv, e.embedding::DOUBLE[]),
        |      p -> (p[1] - p[2]) * (p[1] - p[2])))) AS l2
        |  FROM qs q JOIN embeddings e ON e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r_cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY l2 ASC, neighbor_id) AS r_l2
        |  FROM scored),
        |fused AS (
        |  SELECT query_id, neighbor_id,
        |    round(CASE WHEN r_cos <= 30 THEN 1.0/(60 + r_cos) ELSE 0 END
        |        + CASE WHEN r_l2 <= 30 THEN 1.0/(60 + r_l2) ELSE 0 END, 6) AS rrf
        |  FROM ranked WHERE r_cos <= 30 OR r_l2 <= 30)
        |SELECT query_id, neighbor_id, rrf, rn FROM (
        |  SELECT query_id, neighbor_id, rrf,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn
        |  FROM fused)
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", vecCosine(col("qv"), col("cv")))
        .withColumn("l2", l2Distance(col("qv"), col("cv")))
      val byQ = Window.partitionBy(col("query_id"))
      val ranked = scored
        .withColumn("r_cos", row_number().over(byQ.orderBy(col("cos").desc, col("neighbor_id"))))
        .withColumn("r_l2", row_number().over(byQ.orderBy(col("l2").asc, col("neighbor_id"))))
        .filter(col("r_cos") <= 30 || col("r_l2") <= 30)
        .withColumn("rrf", round(
          when(col("r_cos") <= 30, lit(1.0) / (lit(60) + col("r_cos"))).otherwise(lit(0.0)) +
          when(col("r_l2") <= 30, lit(1.0) / (lit(60) + col("r_l2"))).otherwise(lit(0.0)), 6))
      ranked
        .withColumn("rn", row_number().over(byQ.orderBy(col("rrf").desc, col("neighbor_id"))))
        .filter(col("rn") <= 10)
        .select("query_id", "neighbor_id", "rrf", "rn")
        .orderBy("query_id", "rn")
    },

    // ---- hybrid vector+keyword retrieval (HybridScore over NormalizeScores) ----
    Q("q_vec_hybrid", {
      val terms = Seq("vector", "index").map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT e.vec_id AS doc_id,
         |    list_dot_product(e.embedding::DOUBLE[], qv.v)
         |      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         |         * sqrt(list_dot_product(qv.v, qv.v))) AS vscore
         |  FROM embeddings e, qv WHERE e.vec_id < 200 AND e.vec_id <> 0),
         |corpus AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |           FROM documents WHERE doc_id < 200 AND doc_id <> 0),
         |p AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
         |      FROM corpus, UNNEST(toks) AS t(term) GROUP BY 1, 2),
         |dls AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM corpus),
         |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dls),
         |qp AS (SELECT * FROM p WHERE list_contains($terms, term)),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY 1),
         |kw AS (
         |  SELECT qp.doc_id, round(sum(
         |    ln((n - df + 0.5)/(df + 0.5) + 1.0) * (tf * 2.2)
         |      / (tf + 1.2 * (0.25 + 0.75 * dl / (sumdl::DOUBLE / n)))), 6) AS kscore
         |  FROM qp JOIN dfs USING (term) JOIN dls USING (doc_id) CROSS JOIN stats
         |  GROUP BY qp.doc_id),
         |joined AS (
         |  SELECT c.doc_id, c.vscore, coalesce(k.kscore, 0.0) AS kscore
         |  FROM cand c LEFT JOIN kw k USING (doc_id)),
         |normed AS (
         |  SELECT doc_id,
         |    CASE WHEN min(vscore) OVER () = max(vscore) OVER () THEN 0.5
         |      ELSE (vscore - min(vscore) OVER ()) / (max(vscore) OVER () - min(vscore) OVER ()) END AS vn,
         |    CASE WHEN min(kscore) OVER () = max(kscore) OVER () THEN 0.5
         |      ELSE (kscore - min(kscore) OVER ()) / (max(kscore) OVER () - min(kscore) OVER ()) END AS kn
         |  FROM joined)
         |SELECT doc_id, hybrid, rn FROM (
         |  SELECT doc_id, round(0.7 * vn + 0.3 * kn, 6) AS hybrid,
         |    row_number() OVER (ORDER BY round(0.7 * vn + 0.3 * kn, 6) DESC, doc_id) AS rn
         |  FROM normed)
         |WHERE rn <= 10 ORDER BY rn""".stripMargin
    }) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("v"))
      val cand = e.filter(col("vec_id") < 200 && col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"), asDouble(col("embedding")).as("cv"))
        .crossJoin(broadcast(qv))
        .withColumn("vscore", vecCosine(col("cv"), col("v")))
        .select("doc_id", "vscore")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 200 && col("doc_id") =!= 0)
      val kw = FullText.bm25Scores(docs, Seq("vector", "index"))
        .withColumnRenamed("score", "kscore")
      val joined = cand.join(kw, Seq("doc_id"), "left_outer")
        .withColumn("kscore", coalesce(col("kscore").cast("double"), lit(0.0)))
      val w = Window.partitionBy(lit(1))
      val fused = joined
        .withColumn("vn", minMaxNorm(col("vscore"), w))
        .withColumn("kn", minMaxNorm(col("kscore"), w))
        .withColumn("hybrid", round(lit(0.7) * col("vn") + lit(0.3) * col("kn"), 6))
      TopK.ranked(fused, 10, "rn", col("hybrid").desc, col("doc_id"))
        .select("doc_id", "hybrid", "rn")
        .orderBy("rn")
    },

    // ---- MMR diversified top-k (greedy, per-query group) ----
    Q("q_vec_mmr",
      """WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < 2),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT q.query_id, e.vec_id AS id, round(list_dot_product(qv, e.embedding::DOUBLE[])
        |      / (sqrt(list_dot_product(qv,qv))*sqrt(list_dot_product(e.embedding::DOUBLE[],e.embedding::DOUBLE[]))),6) AS score,
        |      e.embedding::DOUBLE[] AS v,
        |      row_number() OVER (PARTITION BY q.query_id ORDER BY list_dot_product(qv, e.embedding::DOUBLE[])
        |        / (sqrt(list_dot_product(qv,qv))*sqrt(list_dot_product(e.embedding::DOUBLE[],e.embedding::DOUBLE[]))) DESC, e.vec_id) AS rn
        |    FROM embeddings e, qs q WHERE e.vec_id <> q.query_id)
        |  WHERE rn <= 12),
        |pc AS (
        |  SELECT a.query_id AS qid, a.id AS ia, b.id AS ib, round(list_dot_product(a.v,b.v)
        |    / (sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v))),6) AS cos
        |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id <> b.id),
        |sel AS (
        |  WITH RECURSIVE s(qid, step, picked, pickedlist) AS (
        |    SELECT q.query_id, 1,
        |      (SELECT c.id FROM cand c WHERE c.query_id = q.query_id ORDER BY c.score DESC, c.id LIMIT 1),
        |      [(SELECT c.id FROM cand c WHERE c.query_id = q.query_id ORDER BY c.score DESC, c.id LIMIT 1)]
        |    FROM qs q
        |    UNION ALL
        |    SELECT s.qid, s.step+1,
        |      (SELECT c.id FROM cand c WHERE c.query_id = s.qid AND NOT list_contains(s.pickedlist, c.id)
        |       ORDER BY 0.5*c.score - 0.5*greatest(0.0,
        |         (SELECT max(p.cos) FROM pc p WHERE p.qid = s.qid AND p.ia=c.id AND list_contains(s.pickedlist, p.ib))) DESC, c.id
        |       LIMIT 1),
        |      list_append(s.pickedlist,
        |        (SELECT c.id FROM cand c WHERE c.query_id = s.qid AND NOT list_contains(s.pickedlist, c.id)
        |         ORDER BY 0.5*c.score - 0.5*greatest(0.0,
        |           (SELECT max(p.cos) FROM pc p WHERE p.qid = s.qid AND p.ia=c.id AND list_contains(s.pickedlist, p.ib))) DESC, c.id
        |         LIMIT 1))
        |    FROM s WHERE s.step < 6)
        |  SELECT qid, step, picked FROM s)
        |SELECT sel.qid AS query_id, sel.step AS mmr_rank, sel.picked AS neighbor_id
        |FROM sel ORDER BY query_id, mmr_rank""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      mmr(e, e.filter(col("vec_id") < 2), pool = 12, lambda = 0.5, k = 6)
        .orderBy("query_id", "mmr_rank")
    },

    // ---- recommend: centroid(pos) − centroid(neg) → kNN (Recommend) ----
    Q("q_vec_recommend",
      """WITH ex AS (
        |  SELECT CASE WHEN vec_id IN (1, 2, 3) THEN 'p' ELSE 'n' END AS side,
        |    unnest(embedding::DOUBLE[]) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings WHERE vec_id IN (1, 2, 3, 4, 5)),
        |cent AS (SELECT side, i, sum(x) / count(*) AS c FROM ex GROUP BY side, i),
        |tgt AS (
        |  SELECT list(p.c - n.c ORDER BY p.i) AS t
        |  FROM cent p JOIN cent n ON p.i = n.i AND p.side = 'p' AND n.side = 'n'),
        |scored AS (
        |  SELECT e.vec_id AS neighbor_id,
        |    round(list_dot_product(t, e.embedding::DOUBLE[])
        |      / (sqrt(list_dot_product(t, t))
        |         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cos
        |  FROM embeddings e, tgt WHERE e.vec_id NOT IN (1, 2, 3, 4, 5))
        |SELECT neighbor_id, cos, rn FROM (
        |  SELECT neighbor_id, cos, row_number() OVER (ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id").isin(1L, 2L, 3L, 4L, 5L))
        .withColumn("side", when(col("vec_id").isin(1L, 2L, 3L), "p").otherwise("n"))
        .select(col("side"), posexplode(asDouble(col("embedding"))).as(Seq("i", "x")))
        .groupBy("side", "i").agg((sum("x") / count(lit(1))).as("c"))
      val tgt = cent.groupBy("i")
        .pivot("side", Seq("p", "n")).agg(first("c"))
        .select(struct(col("i"), (col("p") - col("n")).as("tx")).as("s"))
        .agg(sort_array(collect_list("s")).as("st"))
        .select(transform(col("st"), s => s.getField("tx")).as("t"))
      val scored = e.filter(!col("vec_id").isin(1L, 2L, 3L, 4L, 5L))
        .crossJoin(broadcast(tgt))
        .withColumn("cos", round(vecCosine(col("t"), asDouble(col("embedding"))), 6))
        .select(col("vec_id").as("neighbor_id"), col("cos"))
      TopK.ranked(scored, 10, "rn", col("cos").desc, col("neighbor_id")).orderBy("rn")
    },

    // ---- score transforms (ScoreTransform: sigmoid/tanh/exp) ----
    Q("q_vec_score_transform",
      """SELECT a.vec_id AS vec_id,
        |  round(1.0 / (1.0 + exp(-cos)), 6) AS sig,
        |  round((exp(2*cos) - 1.0) / (exp(2*cos) + 1.0), 6) AS th,
        |  round(exp(cos), 6) AS ex
        |FROM (
        |  SELECT a.vec_id, list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
        |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |  WHERE a.vec_id < 50) a
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val a = e.filter(col("vec_id") < 50)
        .select(col("vec_id"), asDouble(col("embedding")).as("va"))
      val b = e.select((col("vec_id") - 1).as("vid"), asDouble(col("embedding")).as("vb"))
      a.join(b, col("vec_id") === col("vid"))
        .withColumn("cos", vecCosine(col("va"), col("vb")))
        .select(col("vec_id"),
          round(lit(1.0) / (lit(1.0) + exp(-col("cos"))), 6).as("sig"),
          // tanh via the exp identity so both engines evaluate the exact
          // same expression shape (DuckDB has no tanh builtin)
          round((exp(col("cos") * 2) - 1.0) / (exp(col("cos") * 2) + 1.0), 6).as("th"),
          round(exp(col("cos")), 6).as("ex"))
        .orderBy("vec_id")
    }
  )
}
