package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-capture probe (not part of the driver contract): write
  * `.explain("formatted")` for the named queries (args; or a regex via
  * SPARK_GRAFT_ONLY) to `<outDir>/<query><suffix>.txt` — the before/after
  * artifacts the optimization rounds commit under plans/rNN/. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r11")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.findFirstIn(n).isDefined))
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus, "graft-explain")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$n$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"EXPLAIN ok   $n")
      } catch { case t: Throwable =>
        println(s"EXPLAIN FAIL $n: ${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(120)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
