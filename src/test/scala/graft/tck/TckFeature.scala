package graft.tck

/** Minimal Gherkin reader for the openCypher TCK `.feature` corpus
  * (reference runs the same files through Cucumber —
  * engine/src/test/java/com/arcadedb/query/opencypher/tck/TCKStepDefinitions.java).
  * Supports the subset the TCK uses: Feature/Scenario/Scenario Outline,
  * Given/When/Then/And steps, docstrings, data tables, Examples
  * expansion. Not a general Gherkin implementation.
  */
final case class TckStep(text: String, doc: String, table: Vector[Vector[String]])
final case class TckScenario(feature: String, name: String, steps: Vector[TckStep])

object TckFeatureParser {

  def parseFile(path: java.nio.file.Path): Seq[TckScenario] = {
    val src = scala.io.Source.fromFile(path.toFile, "UTF-8")
    try parse(src.getLines().toVector, path.getFileName.toString.stripSuffix(".feature"))
    finally src.close()
  }

  def parse(lines: Vector[String], defaultFeature: String): Seq[TckScenario] = {
    var feature = defaultFeature
    var background = Vector.empty[TckStep]
    val out = Vector.newBuilder[TckScenario]

    var i = 0
    val n = lines.length

    def isStepLine(t: String) =
      Seq("Given ", "When ", "Then ", "And ", "But ").exists(t.startsWith)

    while (i < n) {
      val t = lines(i).trim
      if (t.startsWith("Feature:")) { feature = t.stripPrefix("Feature:").trim; i += 1 }
      else if (t.startsWith("Background:")) {
        // shared setup steps prepended to every scenario of the feature
        i += 1
        val steps = Vector.newBuilder[TckStep]
        var done = false
        while (i < n && !done) {
          val s = lines(i).trim
          if (s.startsWith("Scenario") || s.startsWith("Feature:")) done = true
          else if (s.isEmpty || s.startsWith("#") || s.startsWith("@")) i += 1
          else if (s == "\"\"\"") {
            i += 1
            val docLines = Vector.newBuilder[String]
            while (i < n && lines(i).trim != "\"\"\"") { docLines += lines(i); i += 1 }
            i += 1
            val raw = docLines.result()
            val indent = raw.filter(_.trim.nonEmpty)
              .map(_.takeWhile(_ == ' ').length).minOption.getOrElse(0)
            val doc = raw.map(l => if (l.length >= indent) l.drop(indent) else l.trim)
              .mkString("\n")
            val cur = steps.result()
            if (cur.nonEmpty) {
              val last = cur.last
              steps.clear(); cur.dropRight(1).foreach(steps += _)
              steps += last.copy(doc = doc)
            }
          } else if (isStepLine(s)) { steps += TckStep(s, "", Vector.empty); i += 1 }
          else i += 1
        }
        background = steps.result()
      }
      else if (t.startsWith("Scenario Outline:") || t.startsWith("Scenario:")) {
        val isOutline = t.startsWith("Scenario Outline:")
        val name = t.dropWhile(_ != ':').drop(1).trim
        i += 1
        val steps = Vector.newBuilder[TckStep]
        var examples = Vector.empty[Vector[String]]
        var inExamples = false
        var done = false
        while (i < n && !done) {
          val s = lines(i).trim
          if (s.startsWith("Scenario") || s.startsWith("Feature:")) done = true
          else if (s.isEmpty || s.startsWith("#") || s.startsWith("@")) i += 1
          else if (s == "Examples:") { inExamples = true; i += 1 }
          else if (s.startsWith("|")) {
            val row = splitTableRow(s)
            if (inExamples) examples :+= row
            else {
              val cur = steps.result()
              if (cur.nonEmpty) {
                // attach to the preceding step
                val last = cur.last
                steps.clear(); cur.dropRight(1).foreach(steps += _)
                steps += last.copy(table = last.table :+ row)
              }
            }
            i += 1
          } else if (s == "\"\"\"") {
            // docstring attaches to the preceding step
            i += 1
            val docLines = Vector.newBuilder[String]
            while (i < n && lines(i).trim != "\"\"\"") { docLines += lines(i); i += 1 }
            i += 1 // closing fence
            val raw = docLines.result()
            val indent = raw.filter(_.trim.nonEmpty)
              .map(_.takeWhile(_ == ' ').length).minOption.getOrElse(0)
            val doc = raw.map(l => if (l.length >= indent) l.drop(indent) else l.trim)
              .mkString("\n")
            val cur = steps.result()
            if (cur.nonEmpty) {
              val last = cur.last
              steps.clear(); cur.dropRight(1).foreach(steps += _)
              steps += last.copy(doc = doc)
            }
          } else if (isStepLine(s)) { steps += TckStep(s, "", Vector.empty); i += 1 }
          else i += 1
        }
        val base = TckScenario(feature, name, background ++ steps.result())
        if (!isOutline || examples.length < 2) out += base
        else {
          val header = examples.head
          examples.tail.zipWithIndex.foreach { case (row, k) =>
            def subst(x: String): String =
              header.zip(row).foldLeft(x) { case (acc, (h, v)) => acc.replace(s"<$h>", v) }
            out += TckScenario(feature, s"$name #${k + 1}",
              base.steps.map(st => st.copy(text = subst(st.text), doc = subst(st.doc),
                table = st.table.map(_.map(subst)))))
          }
        }
      } else i += 1
    }
    out.result()
  }

  /** `| a | b |` → cells; Gherkin cell escapes: `\|` a literal pipe,
    * `\\` a literal backslash, `\n` a newline. */
  private def splitTableRow(s: String): Vector[String] = {
    val body = s.trim
    val cells = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 1 // skip leading |
    while (i < body.length) {
      val c = body(i)
      if (c == '\\' && i + 1 < body.length && body(i + 1) == '|') { cur += '|'; i += 2 }
      else if (c == '\\' && i + 1 < body.length && body(i + 1) == '\\') { cur += '\\'; i += 2 }
      else if (c == '\\' && i + 1 < body.length && body(i + 1) == 'n') { cur += '\n'; i += 2 }
      else if (c == '|') { cells += cur.toString.trim; cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    cells.result()
  }
}
