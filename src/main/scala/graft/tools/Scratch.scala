package graft.tools

import org.apache.spark.sql.functions._

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

    // ---- variant A: current coPurchase (distinct + self-join + distinct)
    val e0a = graft.graph.PropertyGraph.coPurchase(s, sfDir)
    t("A-coPurchase-count") { println("  edges=" + e0a.count()) }

    // ---- variant B: one-shuffle coPurchase (groupBy collect_set + explode²)
    val l = graft.Tables.lineitem(s, sfDir)
    val byOrder = l.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val e0b = byOrder
      .select(explode(col("parts")).as("a"), col("parts"))
      .select(col("a"), explode(col("parts")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    t("B-coPurchase-count") { println("  edges=" + e0b.count()) }
    t("B-again") { e0b.count() }

    // ---- full triangles, restructured: e0 checkpointed once, lazy orient,
    //      localCheckpoint nowhere else
    def triangles(e0src: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val e0 = t(s"$tag-e0-chkpt") { e0src.localCheckpoint(true) }
      val und = e0.select(col("a").as("u")).union(e0.select(col("b").as("u")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      val aFirst = col("dega") < col("degb") ||
        (col("dega") === col("degb") && col("a") < col("b"))
      val e = e0
        .join(deg.select(col("u").as("a"), col("deg").as("dega")), Seq("a"))
        .join(deg.select(col("u").as("b"), col("deg").as("degb")), Seq("b"))
        .select(
          when(aFirst, col("a")).otherwise(col("b")).as("u"),
          when(aFirst, col("b")).otherwise(col("a")).as("v"))
      val adj = e.groupBy("u").agg(sort_array(collect_list(col("v"))).as("nbrs"))
      val out = e
        .join(adj.select(col("u").as("x"), col("nbrs").as("nu")), col("u") === col("x"))
        .join(adj.select(col("u").as("y"), col("nbrs").as("nv")), col("v") === col("y"))
        .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
      t(s"$tag-triangles") { out.collect().foreach(println) }
    }
    triangles(e0a, "A")
    triangles(e0b, "B")
    s.stop()
  }
}
