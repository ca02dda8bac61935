package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Incremental maintenance of aggregate state: continuous aggregates and
  * materialized views, re-expressed for Spark.
  *
  * Reference semantics (SURVEY.md §2.10):
  *   - Continuous aggregate: schema/ContinuousAggregate.java:23-48 holds
  *     (watermarkTs, bucketIntervalMs, bucketColumn, timestampColumn);
  *     refresh = DELETE every backing row whose bucket >= watermark, re-run
  *     the aggregate query over source rows with ts >= watermark, append,
  *     advance watermark to the max bucket seen
  *     (schema/ContinuousAggregateRefresher.java:54-96 — "delete-first
  *     design makes it safe": a failed refresh just re-processes the same
  *     window).
  *   - Materialized view: schema/MaterializedViewImpl.java:31 with refresh
  *     modes MANUAL | INCREMENTAL | PERIODIC
  *     (schema/MaterializedViewRefreshMode.java:21-25).
  *
  * Spark mapping: the backing type is a parquet directory; DELETE+INSERT is
  * an overwrite of the recomputed result unioned with the untouched
  * (< watermark) buckets. At 100 TB the backing table is partitioned by the
  * bucket column, so "delete buckets >= watermark" is a partition-level
  * overwrite (`replaceWhere` in Delta terms) touching only the tail
  * partitions — the frozen history is never rewritten or even read.
  */
object Incremental {

  /** Continuous-aggregate state: `agg(source since-filter)` must produce
    * one row per (bucket, key...) with `bucketCol` a timestamp column. */
  final case class CaggState(backingDir: String, bucketCol: String, watermark: Option[Timestamp])

  /** Initial build: aggregate everything, persist, watermark = max bucket.
    * `agg` maps a source slice to the aggregate result. */
  def caggBuild(
      spark: SparkSession, source: DataFrame, agg: DataFrame => DataFrame,
      backingDir: String, bucketCol: String): CaggState = {
    val result = agg(source)
    result.write.mode("overwrite").parquet(backingDir)
    advance(spark, backingDir, bucketCol)
  }

  /** Incremental refresh, delete-first (ContinuousAggregateRefresher:54-96):
    * recompute every bucket >= watermark from source rows in that range,
    * keep strictly-older buckets untouched, advance the watermark.
    * `tsCol` is the source timestamp column the bucket is derived from. */
  def caggRefresh(
      spark: SparkSession, state: CaggState, source: DataFrame,
      agg: DataFrame => DataFrame, tsCol: String): CaggState = {
    val refreshed = state.watermark match {
      case None => agg(source)
      case Some(w) =>
        // Buckets strictly below the watermark are frozen history; the
        // current-and-newer buckets are recomputed from scratch so late
        // rows inside the current bucket are fully absorbed.
        val frozen = spark.read.parquet(state.backingDir).filter(col(state.bucketCol) < lit(w))
        val recomputed = agg(source.filter(col(tsCol) >= lit(w)))
        frozen.unionByName(recomputed)
    }
    // Parquet overwrite reads lazily from the same dir it writes — stage
    // through a checkpoint of the plan (tiny aggregate result) instead.
    val materialized = refreshed.localCheckpoint(eager = true)
    materialized.write.mode("overwrite").parquet(state.backingDir)
    advance(spark, state.backingDir, state.bucketCol)
  }

  private def advance(spark: SparkSession, dir: String, bucketCol: String): CaggState = {
    val maxBucket = spark.read.parquet(dir)
      .agg(max(col(bucketCol))).collect()(0).getTimestamp(0)
    CaggState(dir, bucketCol, Option(maxBucket))
  }

  // -------------------------------------------------------------------

  sealed trait RefreshMode
  case object Manual      extends RefreshMode // MaterializedViewRefreshMode.MANUAL
  case object Incremental extends RefreshMode // .INCREMENTAL
  final case class Periodic(intervalMs: Long) extends RefreshMode // .EVERY n

  /** Materialized view over a monotonically-keyed source. INCREMENTAL
    * refresh recomputes only the groups that gained source rows past the
    * high-water mark (the analog of MaterializedViewChangeListener feeding
    * the refresher); MANUAL/PERIODIC recompute in full. */
  final class MaterializedView(
      val name: String,
      val mode: RefreshMode,
      backingDir: String,
      groupKey: String,
      monotonicCol: String,
      definition: DataFrame => DataFrame) {

    private var highWaterMark: Option[Long] = None
    private var lastRefreshMs: Long = 0L

    def read(spark: SparkSession): DataFrame = spark.read.parquet(backingDir)

    def build(spark: SparkSession, source: DataFrame): Unit = {
      definition(source).write.mode("overwrite").parquet(backingDir)
      highWaterMark = Option(source.agg(max(col(monotonicCol))).collect()(0).get(0))
        .map(_.asInstanceOf[Number].longValue())
      lastRefreshMs = System.currentTimeMillis()
    }

    /** PERIODIC gate: refresh only when the interval elapsed. */
    def maybeRefresh(spark: SparkSession, source: DataFrame, nowMs: Long): Boolean = mode match {
      case Periodic(interval) if nowMs - lastRefreshMs < interval => false
      case _ => { refresh(spark, source); true }
    }

    def refresh(spark: SparkSession, source: DataFrame): Unit = {
      val next = (mode, highWaterMark) match {
        case (Incremental, Some(hwm)) =>
          // Only groups with a source row past the HWM are stale; their
          // aggregates are recomputed over the FULL group history and
          // merged over the untouched groups. One semi-join + one bounded
          // aggregate — never a full-view rebuild.
          val staleKeys = source.filter(col(monotonicCol) > hwm)
            .select(groupKey).distinct()
          val untouched = read(spark)
            .join(staleKeys, Seq(groupKey), "left_anti")
          val recomputed = definition(
            source.join(staleKeys, Seq(groupKey), "left_semi"))
          untouched.unionByName(recomputed)
        case _ => definition(source)
      }
      val materialized = next.localCheckpoint(eager = true)
      materialized.write.mode("overwrite").parquet(backingDir)
      highWaterMark = Option(source.agg(max(col(monotonicCol))).collect()(0).get(0))
        .map(_.asInstanceOf[Number].longValue())
      lastRefreshMs = System.currentTimeMillis()
    }
  }
}
