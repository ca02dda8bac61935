package graft.tck

import graft.cypher.Cypher
import graft.graph.MutableGraph
import org.apache.spark.sql.SparkSession

/** Executes one TCK scenario against the engine: builds a fresh empty
  * graph, applies the `having executed` setup through the Cypher write
  * path, runs the query, and compares against the expected table in the
  * canonical [[TV]] domain. Returns None on pass, Some(reason) on fail.
  * Side-effect assertions are not checked (result conformance only).
  */
object TckRunner {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  def run(spark: SparkSession, sc: TckScenario): Option[String] =
    try runInner(spark, sc)
    catch {
      case u: TckUnsupported => Some(s"unsupported: ${u.getMessage}")
      case e: Throwable =>
        if (sys.env.contains("TCK_STACK")) e.printStackTrace()
        Some(s"error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def runInner(spark: SparkSession, sc: TckScenario): Option[String] = {
    val setups = Vector.newBuilder[String]
    var query: String = null
    var expectError = false
    var expectEmpty = false
    var ordered = false
    var unorderedLists = false
    var expectTable: Vector[Vector[String]] = null
    var params = Map.empty[String, Any]

    sc.steps.foreach { st =>
      val t = st.text
      if (t.contains("having executed")) setups += st.doc
      else if (t.contains("executing query") || t.contains("executing control query"))
        query = st.doc
      else if (t.contains("parameters are"))
        params = st.table.map(r => r(0) -> toAny(TckValues.parse(r(1)))).toMap
      else if (t.contains("should be raised")) expectError = true
      else if (t.contains("the result should be empty")) expectEmpty = true
      else if (t.contains("the result should be")) {
        ordered = t.contains(", in order") && !t.contains("in any order")
        unorderedLists = t.contains("ignoring element order for lists")
        expectTable = st.table
      }
      // side-effect steps intentionally ignored
    }
    if (query == null) return Some("no query step")

    val dir = s"/tmp/graft_tck/s${counter.incrementAndGet()}"
    val mg = MutableGraph.empty(spark, dir)
    // newlines stay: `//` comments run to end-of-line
    setups.result().foreach(s => Cypher.execute(mg, s))

    def exec(): Array[org.apache.spark.sql.Row] = {
      val text = query
      val q = Cypher.parse(text)
      val df =
        if (q.clauses.exists(_.isInstanceOf[Cypher.WriteClause])) Cypher.execute(mg, text, params)
        else Cypher.query(mg.graph, text, params)
      df.collect()
    }

    if (expectError) {
      try { exec(); Some("expected an error, query succeeded") }
      catch { case _: Throwable => None }
    } else {
      val rows = exec()
      if (expectEmpty) {
        if (rows.isEmpty) None else Some(s"expected empty result, got ${rows.length} rows")
      } else if (expectTable == null) {
        None // write-only scenario with side-effect assertions: result unchecked
      } else {
        compare(rows, expectTable, ordered, unorderedLists)
      }
    }
  }

  /** TCK parameter value → plain Scala value for Cypher.query's params. */
  private def toAny(tv: TV): Any = tv match {
    case VNull      => null
    case VBool(b)   => b
    case VInt(v)    => v
    case VFloat(v)  => v
    case VStr(s)    => s
    case VList(xs)  => xs.map(toAny)
    case VMap(m)    => m.view.mapValues(toAny).toMap
    case other => throw new TckUnsupported(s"parameter value $other")
  }

  /** "(ignoring element order for lists)" — canonicalize every list as a
    * sorted multiset, recursively, on both sides before comparing. */
  private def canonLists(tv: TV): TV = tv match {
    case VList(xs) => VList(xs.map(canonLists).sortBy(_.toString))
    case VMap(m) => VMap(m.view.mapValues(canonLists).toMap)
    case VNode(ls, ps) => VNode(ls, ps.view.mapValues(canonLists).toMap)
    case VRel(t, ps) => VRel(t, ps.view.mapValues(canonLists).toMap)
    case other => other
  }

  private def compare(rows: Array[org.apache.spark.sql.Row],
      table: Vector[Vector[String]], ordered: Boolean,
      unorderedLists: Boolean): Option[String] = {
    val header = table.head
    val expected0 = table.tail.map(_.map(TckValues.parse))
    val gotCols = if (rows.isEmpty) header else rows.head.schema.fieldNames.toVector
    if (gotCols.map(_.trim) != header.map(_.trim))
      return Some(s"columns [${gotCols.mkString(", ")}] != expected [${header.mkString(", ")}]")
    val got0 = rows.toVector.map(r => header.indices.map(ix => TckValues.fromSpark(r.get(ix))).toVector)
    val (got, expected) =
      if (unorderedLists) (got0.map(_.map(canonLists)), expected0.map(_.map(canonLists)))
      else (got0, expected0)
    if (got.length != expected.length)
      return Some(s"row count ${got.length} != expected ${expected.length}\n" +
        s"got: ${got.take(5).mkString("; ")}\nexp: ${expected.take(5).mkString("; ")}")
    val (g, e) =
      if (ordered) (got, expected)
      else (got.sortBy(_.toString()), expected.sortBy(_.toString()))
    if (g == e) None
    else Some(s"rows differ\ngot: ${g.take(8).mkString("; ")}\nexp: ${e.take(8).mkString("; ")}")
  }
}
