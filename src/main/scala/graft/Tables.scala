package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated test data.
  *
  * Mirrors the role of ArcadeDB's bucket/type scan entry points
  * (reference: engine/src/main/java/com/arcadedb/query/sql/executor/
  * FetchFromTypeExecutionStep.java:42) — in Spark a "type scan" is just a
  * (columnar, partition-parallel) parquet read; Catalyst collapses filters
  * and projections into the scan (ScanWithFilterStep.java:43 analog is free).
  */
object Tables {
  /** Schema memo for immutable testdata parquet: `spark.read.parquet(p)`
    * with no explicit schema runs a footer-inference job (~0.05-0.1 s at
    * local[32]) on EVERY call — across a 231-query sweep that was most of
    * the residual per-query floor on trivial queries (r6 verdict #2).
    * A `StructType` is session-independent, so the memo survives the
    * bench's session recycling. Guarded to the read-only testdata root:
    * scratch copies under /tmp are rewritten by DML/stream tests and must
    * keep re-inferring. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Parquet read that skips footer inference when the path's schema is
    * already known (immutable testdata only — see [[schemaMemo]]). */
  def readCached(spark: SparkSession, path: String): DataFrame =
    if (path.startsWith("/root/testdata/")) {
      val s = schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)
      spark.read.schema(s).parquet(path)
    } else spark.read.parquet(path)

  /** Table paths resolve through the [[graft.schema.TypeCatalog]] (the
    * LocalSchema analog) — no caller hard-codes physical locations. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = graft.schema.TypeCatalog.default(name).path
      .getOrElse(throw new IllegalArgumentException(s"abstract type $name"))
    readCached(spark, path(dir))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  /** `events.ts` has drifted across testdata generations: early drops wrote
    * parquet TIMESTAMP(NANOS) — which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL), so it is read as raw ns longs under the
    * `nanosAsLong` legacy flag — while current drops write TIMESTAMP(MICROS)
    * (surfaced as TIMESTAMP_NTZ; the session runs in UTC, so the NTZ→LTZ
    * cast below is value-preserving and matches DuckDB's naive-timestamp
    * read). [[normalizeTs]] probes the *loaded* type and converges every
    * layout onto µs `TimestampType`, so no consumer hard-codes a layout.
    * The nanosAsLong conf is set at session build ([[GraftSession]]); the
    * guard below only rescues ad-hoc sessions and never flips an
    * already-configured one mid-plan.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  /** Normalize a drifted event-time column to session-tz µs TimestampType,
    * whatever physical layout the parquet carried (see [[events]]).
    * Tolerant by design: a future regeneration should fail TestdataSpec's
    * readable assertion, not 28 opaque query tests. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType | IntegerType => // legacy raw-ns long → µs timestamp
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn(colName, df(colName).cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.$colName has unsupported physical type $other — extend Tables.normalizeTs")
    }

  /** Streaming twin of [[events]]: probe the directory's physical schema
    * with a footer-only batch read (file streams require an explicit
    * schema), then apply the same [[normalizeTs]] branch to the stream.
    *
    * PRECONDITION: `srcDir` must already contain at least one parquet
    * file — the probe needs a footer. On the canonical empty-directory
    * stream start (files arrive only after `start()`), stage one file
    * first, or pass the layout explicitly via `schema`. */
  def eventsStream(spark: SparkSession, srcDir: String,
      options: Map[String, String] = Map.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = schema.getOrElse {
      try spark.read.parquet(srcDir).schema
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"eventsStream($srcDir) probes the physical ts layout from an existing " +
            "parquet file; the directory is empty — stage one file first or pass " +
            "schema= explicitly", e)
      }
    }
    normalizeTs(spark.readStream.schema(physical).options(options).parquet(srcDir))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
