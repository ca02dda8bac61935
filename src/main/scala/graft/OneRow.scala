package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-row relation for scalar/literal SELECTs.
  *
  * `spark.range(1)` plans as RangeExec, so even `SELECT 1`-shaped
  * evaluations (script IF/WHILE conditions, LET scalars, DML return
  * counts, dual-less SELECTs, single-row INSERT staging) launch a real
  * one-task Spark job per call — the script control paths run dozens per
  * statement. A LocalRelation-backed row lets the optimizer's
  * ConvertToLocalRelation rule fold any deterministic projection
  * driver-side, making `collect()` jobless (LocalTableScanExec returns
  * rows directly); non-foldable projections still execute as before.
  * (r11 optimization; guide §5 — keep the driver out of data work, and
  * don't schedule executors for constant arithmetic either.)
  */
object OneRow {
  def apply(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(1).toDF("__one")
  }
}
