package graft

import org.apache.spark.sql.SparkSession

/** One place for the session configuration every graft entry point needs.
  *
  * - `spark.sql.legacy.parquet.nanosAsLong`: `events.parquet` carries
  *   TIMESTAMP(NANOS), which Spark 4 otherwise rejects (PARQUET_TYPE_ILLEGAL).
  *   Set once at build so no table loader has to mutate session conf
  *   mid-plan (reference analog: schema-level column definition in
  *   engine/timeseries/TimeSeriesEngine.java — type handling is a schema
  *   decision, not a per-read side effect).
  * - UTC session timezone: oracle (DuckDB) compares are timezone-naive.
  * - Shuffle partitions sized to the local core count, not Spark's 200
  *   default — at cluster scale this is AQE-managed instead.
  */
object GraftSession {
  def build(master: String, shufflePartitions: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_state/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Variant-dispatch pruning: see graft.plans.ExtractThroughBranches.
    // Registering is idempotent across getOrCreate-shared sessions.
    if (!s.experimental.extraOptimizations.contains(graft.plans.ExtractThroughBranches))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.ExtractThroughBranches
    s
  }
}
