package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (beyond the
  * reference — §"LLM-data-pipeline operators"): every selection is keyed
  * on a content hash, never a seeded RNG, so the sample is (a) stable
  * under re-runs, retries, and partition reshuffles — the property a
  * 100 TB pipeline needs for reproducible dataset builds — and (b)
  * replayable by any engine with md5, which is what the DuckDB oracles
  * do. Spark's `sample()`/`sampleBy()` are per-partition seeded and NOT
  * stable under repartitioning; these are.
  */
object SamplingOps {

  /** Keep `k` rows per `strata` group: the k smallest md5(idCol) values,
    * a uniform-at-random-but-deterministic choice. One shuffle (the
    * per-group window), no driver state. */
  def stratifiedTake(df: DataFrame, strata: String, idCol: String, k: Int): DataFrame =
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strata)).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= k)
      .drop("__h", "__rn")

  /** Hash-split: stable pct% "train" / rest "holdout" assignment from the
    * first 8 hex digits of md5(id) — the standard reproducible train/test
    * split, no RNG, no global sort. */
  def hashSplit(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("split",
      when(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100 < pct, "train").otherwise("holdout"))

  val all: Seq[Q] = Seq(

    // ---- stratified deterministic sample: k docs per source ----
    Q("q_sample_stratified",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      stratifiedTake(Tables.documents(s, d), "source", "doc_id", 5)
        .select("doc_id", "source").orderBy("source", "doc_id")
    },

    // ---- reproducible train/holdout split + per-bucket counts ----
    Q("q_sample_split",
      """SELECT split, count(*) AS n FROM (
        |  SELECT CASE WHEN CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
        |           % 100 < 80 THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      hashSplit(Tables.documents(s, d), "doc_id", 80)
        .groupBy("split").agg(count(lit(1)).as("n")).orderBy("split")
    }
  )
}
