package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage probe for optimization rounds (not part of the
  * driver contract). Edited freely per investigation.
  *
  * r12 shape: where does q_stream_join's wall-clock go — per-micro-batch
  * durationMs from StreamingQueryProgress, under the bench's exact setup.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-scratch")
    s.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()

    val srcDir = s"/tmp/graft_state/stream_src3_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val (df, prog) = graft.operators.StreamingOps.streamSelfJoin(s, srcDir)
      val ordered = df.orderBy("a_id", "b_id")
      ordered.withColumn("__h", xxhash64(struct(ordered.columns.map(col): _*)))
        .agg(count(lit(1)), expr("bit_xor(__h)")).collect()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"PROBE run$r total=$total%.3f s, ${prog.length} batches")
      prog.foreach { p =>
        println(s"PROBE   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} stateOps=${p.stateOperators.map(o =>
            s"(commit=${o.commitTimeMs}ms rows=${o.numRowsTotal} mem=${o.memoryUsedBytes})").mkString}")
      }
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    s.stop()
  }
}
