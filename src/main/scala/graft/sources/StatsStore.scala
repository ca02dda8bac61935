package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping via a min/max manifest — the distributed
  * replacement for the reference's LSM range index (index/lsm/
  * LSMTreeIndex.java:78 range scans, exec/FetchFromIndexStep.java;
  * SURVEY.md §4.1), and the 1-D case of Delta/Iceberg-style file stats.
  *
  * Write path: cluster the table on the index key with
  * `repartitionByRange` — each output file then covers a narrow key range
  * (the sorted-run property an LSM level has on disk) — and collect one
  * (file, min, max, rows) row per file into a tiny manifest table.
  *
  * Read path: a range predicate consults the manifest first and reads
  * ONLY the files whose [min, max] intersects the range. At 100 TB the
  * manifest is a few thousand rows per million files — a driver-side
  * broadcast, exactly how Delta's log or an LSM's fence pointers work —
  * and a selective predicate skips >99% of files instead of scanning
  * every file that shares a partition. Partition pruning (bucket_date in
  * [[TimeSeriesStore]]) handles time; this handles any OTHER clustered
  * key.
  */
object StatsStore {

  private def manifestDir(dir: String) = s"$dir-manifest"

  /** Write `df` clustered by `key` into `numFiles` range-partitioned
    * files and collect the per-file min/max manifest. */
  def write(df: DataFrame, dir: String, key: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(key))
      .write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"),
        count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
  }

  /** The (file, kmin, kmax, cnt) manifest. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(manifestDir(dir))

  /** Range scan with file skipping: returns the pruned DataFrame (with
    * the residual filter applied) plus (filesRead, filesTotal) so callers
    * and tests can observe the pruning. The manifest collect is the same
    * driver-side boundary an LSM crosses reading its fence pointers. */
  def rangeScan(spark: SparkSession, dir: String, key: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val files = manifest(spark, dir)
      .select("file", "kmin", "kmax").collect()
    val hit = files.filter(r =>
      r.getAs[Long]("kmax") >= lo && r.getAs[Long]("kmin") <= hi)
      .map(_.getAs[String]("file"))
    val pruned =
      if (hit.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(hit.toIndexedSeq: _*)
    (pruned.filter(col(key).between(lo, hi)), hit.length, files.length)
  }
}
