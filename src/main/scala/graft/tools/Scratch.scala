package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway stage-by-stage probe for optimization rounds (not part of the
  * driver contract). Edited freely per investigation.
  *
  * r12 shape: same-session interleaved A/B over the three r11-contested
  * optimizations (verdict #2), toggled by system properties the probed
  * code paths read at plan-construction time:
  *   - graft.ab.graphwrite=checkpoint  (MutableGraph: r10 protocol)
  *   - graft.ab.textpin=persist        (TextPipeline: r10 pinning)
  *   - graft.ab.ivf=posexplode         (VectorOps: r10 centroid update)
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-scratch")
    s.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(s, sfDir)
      df.withColumn("__h", xxhash64(struct(df.columns.map(col): _*)))
        .agg(count(lit(1)), expr("bit_xor(__h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val trials: Seq[(String, String, String)] = Seq(
      ("q_cypher_create",  "graft.ab.graphwrite", "checkpoint"),
      ("q_dedup_minhash",  "graft.ab.textpin",    "persist"),
      ("q_dedup_clusters", "graft.ab.textpin",    "persist"),
      ("q_dedup_ngram",    "graft.ab.textpin",    "persist"),
      ("q_vec_ann_ivf",    "graft.ab.ivf",        "posexplode"),
      ("q_dedup_semantic", "graft.ab.ivf",        "posexplode"))

    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"AB load_avg_start=$loadStart%.2f")
    for ((q, prop, oldVal) <- trials) {
      sys.props -= prop
      once(q); reset() // uncounted warm run (JIT, layout, parse cache)
      val news = scala.collection.mutable.Buffer[Double]()
      val olds = scala.collection.mutable.Buffer[Double]()
      for (i <- 1 to 5) {
        // alternate order inside the pair so slot effects cancel
        if (i % 2 == 1) {
          sys.props -= prop;        news += once(q); reset()
          sys.props(prop) = oldVal; olds += once(q); reset()
        } else {
          sys.props(prop) = oldVal; olds += once(q); reset()
          sys.props -= prop;        news += once(q); reset()
        }
        sys.props -= prop
      }
      println(f"AB $q%-20s new(r11) med=${med(news.toSeq)}%6.3f runs=${news.map(x => f"$x%.3f").mkString(",")}")
      println(f"AB $q%-20s old(r10) med=${med(olds.toSeq)}%6.3f runs=${olds.map(x => f"$x%.3f").mkString(",")}")
    }
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"AB load_avg_end=$loadEnd%.2f")
    s.stop()
  }
}
