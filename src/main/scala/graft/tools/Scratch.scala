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
    import graft.functions.VectorFunctions._

    val emb = graft.Tables.embeddings(s, sfDir)
    println("n=" + emb.count() + " dim=" + emb.select(size(col("embedding"))).head.getInt(0))

    val corpus = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    def assign(c: DataFrame, cents: DataFrame): DataFrame =
      c.crossJoin(broadcast(cents))
        .withColumn("d2", vecL2Sq(col("v"), col("cv")))
        .groupBy("vec_id")
        .agg(min_by(struct(col("cid"), col("v")), struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.v").as("v"), col("m.cid").as("cid"))

    val k = 16; val dim = 64
    def init = corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    // old shape
    for (rep <- 1 to 2) t(s"old-ivf-$rep") {
      var cents = init
      for (_ <- 1 until 3) {
        cents = assign(corpus, cents)
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cid", "dim").agg(avg(col("x")).as("cx"))
          .groupBy("cid")
          .agg(sort_array(collect_list(struct(col("dim"), col("cx")))).as("s"))
          .select(col("cid"), expr("transform(s, p -> p.cx)").as("cv"))
      }
      cents.localCheckpoint(true).count()
    }
    // new shape
    for (rep <- 1 to 2) t(s"new-ivf-$rep") {
      var cents = init
      for (_ <- 1 until 3) {
        val avgs = (0 until dim).map(i => avg(col("v")(i)).as(s"__c$i"))
        cents = assign(corpus, cents)
          .groupBy("cid").agg(avgs.head, avgs.tail: _*)
          .select(col("cid"), array((0 until dim).map(i => col(s"__c$i")): _*).as("cv"))
      }
      cents.localCheckpoint(true).count()
    }
    s.stop()
  }
}
