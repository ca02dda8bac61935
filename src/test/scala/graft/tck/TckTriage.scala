package graft.tck

/** Triage main: run every scenario in the selected TCK slice and print
  * one line per scenario (PASS/FAIL + reason) — used to maintain
  * `src/test/resources/tck-expected-failures.txt`.
  *
  * sbt 'Test/runMain graft.tck.TckTriage [subdir ...]'
  */
object TckTriage {
  val Root = "/root/reference/engine/src/test/resources/opencypher/tck/features"
  val DefaultSlice = Seq(
    "clauses/call", "clauses/create", "clauses/delete", "clauses/match",
    "clauses/match-where", "clauses/merge", "clauses/remove",
    "clauses/return", "clauses/return-orderby", "clauses/return-skip-limit",
    "clauses/set", "clauses/union", "clauses/unwind", "clauses/with",
    "clauses/with-orderBy", "clauses/with-skip-limit", "clauses/with-where",
    "expressions/aggregation", "expressions/boolean", "expressions/comparison",
    "expressions/conditional", "expressions/existentialSubqueries",
    "expressions/graph", "expressions/list", "expressions/literals",
    "expressions/map", "expressions/mathematical", "expressions/null",
    "expressions/path", "expressions/pattern", "expressions/precedence",
    "expressions/quantifier", "expressions/string", "expressions/temporal",
    "expressions/typeConversion",
    "useCases/countingSubgraphMatches", "useCases/triadicSelection")

  def featureFiles(slice: Seq[String]): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    slice.flatMap { sub =>
      val d = java.nio.file.Paths.get(Root, sub)
      if (java.nio.file.Files.isDirectory(d))
        java.nio.file.Files.list(d).iterator().asScala.toSeq
          .filter(_.toString.endsWith(".feature")).sortBy(_.toString)
      else Seq.empty
    }
  }

  def main(args: Array[String]): Unit = {
    // args: slice dirs, optionally "name=<substring>" to run matching scenarios only
    val (nameFilters, dirs) = args.toSeq.partition(_.startsWith("name="))
    val nameFilter = nameFilters.map(_.stripPrefix("name="))
    val slice = if (dirs.nonEmpty) dirs else DefaultSlice
    val spark = graft.GraftSession.build("local[4]", "4", "graft-tck")
    var pass = 0; var fail = 0
    featureFiles(slice).foreach { f =>
      TckFeatureParser.parseFile(f).foreach { sc =>
        val key = s"${sc.feature}::${sc.name}"
        if (nameFilter.nonEmpty && !nameFilter.exists(key.contains)) ()
        else {
        val t0 = System.nanoTime()
        TckRunner.run(spark, sc) match {
          case None =>
            pass += 1
            println(f"[tck] PASS  $key  (${(System.nanoTime() - t0) / 1e9}%.1fs)")
          case Some(reason) =>
            fail += 1
            println(s"[tck] FAIL  $key  -- ${reason.linesIterator.mkString(" / ").take(300)}")
        }
        }
      }
    }
    println(s"[tck] == $pass pass, $fail fail")
    spark.stop()
  }
}
