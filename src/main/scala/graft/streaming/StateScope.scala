package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped state-partition sizing for the bounded streaming queries
  * (shared by [[graft.operators.StreamingOps]] and [[Sessionize]]).
  *
  * A streaming query pins its state-store partition count from
  * `spark.sql.shuffle.partitions` at START; every micro-batch then pays a
  * per-partition commit for EACH stateful operator (a stream-stream join
  * keeps four stores per partition), and the AvailableNow no-data
  * finalize batch runs those commits again over zero rows — measured
  * ~0.8 s of pure state machinery per batch at 8 partitions (r12 probe).
  *
  * Sizing: one state partition per source file, capped at the session's
  * shuffle default — for a file-stream source the file count is the
  * ingest-width proxy (a production feed landing many files per trigger
  * gets the session's full width; a bounded single-file replay gets one
  * store per operator). Data-derived, not a local-mode constant: the cap
  * follows the cluster, the floor follows the input.
  */
object StateScope {

  /** Parquet file count in a staged stream-source directory. */
  def sourceFiles(srcDir: String): Int = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(srcDir))
    try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count().toInt
    finally s.close()
  }

  def statePartitionsFor(spark: SparkSession, srcDir: String): Int =
    math.max(1, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, sourceFiles(srcDir)))

  /** Run `body` (which must START its stream inside) with the session's
    * shuffle-partition count scoped down; restored afterwards so
    * concurrent batch work in the same session is unaffected. */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
