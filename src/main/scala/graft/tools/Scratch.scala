package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage probe for optimization rounds (not part of the
  * driver contract). Edited freely per investigation.
  *
  * r12 shape: q_dedup_semantic recall stability at sf0.001 — print the
  * (n_exact, recall_ok) row several times in one session.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-scratch")
    for (r <- 1 to 4) {
      val rows = graft.SparkEntry.queries("q_dedup_semantic")(s, sfDir).collect()
      println(s"PROBE run$r " + rows.mkString(","))
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    s.stop()
  }
}
