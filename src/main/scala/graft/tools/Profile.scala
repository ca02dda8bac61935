package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc perf probe (not part of the driver contract): run the named
  * queries N times each, splitting DataFrame construction (analysis) from
  * action time, to localize fixed per-query overhead. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val names = args.toSeq
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-profile")
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()
    for (n <- names; q = graft.SparkEntry.queries(n); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      val t1 = System.nanoTime()
      df.withColumn("__h", xxhash64(struct(df.columns.map(col): _*)))
        .agg(count(lit(1)), expr("bit_xor(__h)")).collect()
      val t2 = System.nanoTime()
      println(f"PROF $n%-28s rep=$r build=${(t1 - t0) / 1e9}%7.3f exec=${(t2 - t1) / 1e9}%7.3f")
    }
    spark.stop()
  }
}
