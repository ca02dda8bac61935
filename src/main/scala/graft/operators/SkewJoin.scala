package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §6 scale design; the technique the
  * brief's partitioning checklist names alongside broadcast and AQE).
  *
  * A shuffle join hashes rows to reducers BY KEY, so one hot key =
  * one overwhelmed reducer regardless of cluster size. The salted form
  * scatters the probe side across `salts` sub-keys with a deterministic
  * row hash and replicates the build side once per salt, turning a
  * single hot partition into `salts` even ones at the cost of a
  * `salts`-way build-side fan-out.
  *
  * When NOT to use it: AQE's skew-join (on by default in
  * [[graft.GraftSession]]) already splits oversized sort-merge partitions
  * at runtime, and a broadcast join has no shuffle to skew. Reach for
  * explicit salting when the build side is too big to broadcast AND the
  * join must be hash-partitioned upstream of further keyed work (AQE
  * splitting would break the co-partitioning the next stage reuses).
  */
object SkewJoin {

  /** Inner equi-join of `probe` (large, skewed) with `build` (replicated)
    * on `key`, scattered over `salts` sub-partitions. */
  def salted(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    // deterministic per-row scatter: any row hash works, the salt only has
    // to spread a hot key's rows evenly — xxhash64 over the whole row
    val scattered = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    scattered.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val all: Seq[Q] = Seq(
    // hot-key demo: every lineitem row funneled onto ONE join key (the
    // worst case a uniform shuffle cannot spread), salted 8 ways; the
    // oracle replays the same degenerate join declaratively
    Q("q_skew_join_salted",
      """SELECT hot, sum(l_quantity::DECIMAL(28,4))::DOUBLE AS qty, count(*) AS n,
        |  max(tag) AS tag
        |FROM (
        |  SELECT 1 AS hot, l_quantity, 'dim' AS tag
        |  FROM lineitem WHERE l_orderkey < 2000)
        |GROUP BY hot""".stripMargin) { (s, d) =>
      val probe = Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
        .select(lit(1).as("hot"), col("l_quantity"))
      val build = graft.OneRow(s).select(lit(1).as("hot"), lit("dim").as("tag"))
      salted(probe, build, "hot", salts = 8)
        .groupBy("hot")
        .agg(sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("qty"),
          count(lit(1)).as("n"), max(col("tag")).as("tag"))
    }
  )
}
