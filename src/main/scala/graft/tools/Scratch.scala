package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage probe for optimization rounds (not part of the
  * driver contract). Edited freely per investigation.
  *
  * r12 shape: Spark job count for q_graph_astar (verdict #7 evidence —
  * the A* goal probe is the loop's only driver action; counting jobs
  * before/after the every-2nd-round batching).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-scratch")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
    })
    for (r <- 1 to 2) {
      jobs.set(0)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_graph_astar")(s, sfDir)
      df.withColumn("__h", xxhash64(struct(df.columns.map(col): _*)))
        .agg(count(lit(1)), expr("bit_xor(__h)")).collect()
      Thread.sleep(300) // let listener drain
      println(f"PROBE astar run$r jobs=${jobs.get} wall=${(System.nanoTime()-t0)/1e9}%.2f s")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    s.stop()
  }
}
