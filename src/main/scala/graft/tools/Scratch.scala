package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway stage-by-stage probe for optimization rounds (not part of the
  * driver contract). Edited freely per investigation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-scratch")
    s.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def traverseAB(lazyChk: Boolean): Unit = {
      val co = graft.graph.PropertyGraph.coPurchase(s, sfDir).localCheckpoint(eager = true)
      val edges = co.select(col("a").as("src"), col("b").as("dst"))
        .union(co.select(col("b").as("src"), col("a").as("dst")))
      var visited = graft.Tables.part(s, sfDir).filter(col("p_partkey") === 1)
        .select(col("p_partkey").as("id")).distinct().withColumn("depth", lit(0))
      var frontier = visited.select("id")
      for (d <- 1 to 3) {
        var next = frontier.alias("f")
          .join(edges.alias("e"), col("f.id") === col("e.src"))
          .select(col("e.dst").as("id"))
          .distinct()
          .join(visited.select(col("id").as("vid")), col("id") === col("vid"), "left_anti")
        if (lazyChk) next = next.localCheckpoint(eager = false)
        visited = visited.union(next.withColumn("depth", lit(d)))
        frontier = next
      }
      val out = visited.groupBy("id").agg(min("depth").as("depth"))
      out.agg(count(lit(1)), sum("depth")).collect().foreach(println)
    }

    for (r <- 1 to 2) t(s"traverse-old-$r") { traverseAB(lazyChk = false) }
    for (r <- 1 to 2) t(s"traverse-new-$r") { traverseAB(lazyChk = true) }
    for (r <- 1 to 2) t(s"traverse-old-again-$r") { traverseAB(lazyChk = false) }
    s.stop()
  }
}
