package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loader for the driver-generated test data.
  *
  * Mirrors the role of ArcadeDB's bucket/type scan entry points
  * (reference: engine/src/main/java/com/arcadedb/query/sql/executor/
  * FetchFromTypeExecutionStep.java:42) — in Spark a "type scan" is just a
  * (columnar, partition-parallel) parquet read; Catalyst collapses filters
  * and projections into the scan (ScanWithFilterStep.java:43 analog is free).
  */
object Tables {
  /** Table paths resolve through the [[graft.schema.TypeCatalog]] (the
    * LocalSchema analog) — no caller hard-codes physical locations. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = graft.schema.TypeCatalog.default(name).path
      .getOrElse(throw new IllegalArgumentException(s"abstract type $name"))
    spark.read.parquet(path(dir))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos (legacy flag) and surface
    * as µs TimestampType — the same ns→µs truncation DuckDB applies.
    * The nanosAsLong conf is set at session build ([[GraftSession]]); the
    * guard below only rescues ad-hoc sessions and never flips an
    * already-configured one mid-plan.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
