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
  // JVM-unique scratch root: the triage main and the sbt test suite both
  // run scenarios concurrently on this machine; a shared /tmp/graft_tck
  // with per-JVM counters from 0 had the two JVMs clobbering each other's
  // vertex/edge parquet mid-scenario.
  private val scratchRoot =
    s"/tmp/graft_tck/j${java.lang.ProcessHandle.current().pid()}"

  def run(spark: SparkSession, sc: TckScenario): Option[String] =
    try runInner(spark, sc)
    catch {
      case u: TckUnsupported => Some(s"unsupported: ${u.getMessage}")
      case e: Throwable =>
        if (sys.env.contains("TCK_STACK")) e.printStackTrace()
        Some(s"error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** One executed query plus the expectations that follow it. A TCK
    * scenario may hold SEVERAL (main query, then `executing control
    * query` verification reads) — every one must RUN, in order, each
    * checked against its own Then-steps; collapsing them to the last
    * query silently skips the main write and false-passes/fails on the
    * control read. */
  private final class Seg(val query: String) {
    var expectError = false
    var expectEmpty = false
    var ordered = false
    var unorderedLists = false
    var table: Vector[Vector[String]] = null
  }

  /** The TCK's named binary-tree graphs (useCases/triadicSelection):
    * one :A root, two :KNOWS and two :FOLLOWS children, each with two
    * :FRIEND leaves, plus a :FRIEND ring over the middle tier. tree-2
    * differs only in the second leaf of each pair being :Y. */
  private val BinaryTree1 =
    """CREATE (a:A {name: 'a'}), (b1:X {name: 'b1'}), (b2:X {name: 'b2'}),
      | (b3:X {name: 'b3'}), (b4:X {name: 'b4'}),
      | (c11:X {name: 'c11'}), (c12:X {name: 'c12'}),
      | (c21:X {name: 'c21'}), (c22:X {name: 'c22'}),
      | (c31:X {name: 'c31'}), (c32:X {name: 'c32'}),
      | (c41:X {name: 'c41'}), (c42:X {name: 'c42'})
      |CREATE (a)-[:KNOWS]->(b1), (a)-[:KNOWS]->(b2),
      | (a)-[:FOLLOWS]->(b3), (a)-[:FOLLOWS]->(b4)
      |CREATE (b1)-[:FRIEND]->(c11), (b1)-[:FRIEND]->(c12),
      | (b2)-[:FRIEND]->(c21), (b2)-[:FRIEND]->(c22),
      | (b3)-[:FRIEND]->(c31), (b3)-[:FRIEND]->(c32),
      | (b4)-[:FRIEND]->(c41), (b4)-[:FRIEND]->(c42)
      |CREATE (b1)-[:FRIEND]->(b2), (b2)-[:FRIEND]->(b3),
      | (b3)-[:FRIEND]->(b4), (b4)-[:FRIEND]->(b1)""".stripMargin
  private val BinaryTree2 = BinaryTree1
    .replace("(c12:X", "(c12:Y").replace("(c22:X", "(c22:Y")
    .replace("(c32:X", "(c32:Y").replace("(c42:X", "(c42:Y")

  private def runInner(spark: SparkSession, sc: TckScenario): Option[String] = {
    val setups = Vector.newBuilder[String]
    val segs = scala.collection.mutable.Buffer.empty[Seg]
    var params = Map.empty[String, Any]

    val procs = Vector.newBuilder[(String, graft.cypher.Procedures.TableProc)]
    sc.steps.foreach { st =>
      val t = st.text
      if (t.contains("having executed")) setups += st.doc
      else if (t.contains("the binary-tree-1 graph")) setups += BinaryTree1
      else if (t.contains("the binary-tree-2 graph")) setups += BinaryTree2
      else if (t.contains("executing query") || t.contains("executing control query"))
        segs += new Seg(st.doc)
      else if (t.contains("parameters are"))
        params = st.table.map(r => r(0) -> toAny(TckValues.parse(r(1)))).toMap
      else if (t.contains("there exists a procedure")) {
        // `test.my.proc(name :: STRING?, …) :: (city :: STRING?, …):` plus
        // a fixture table (header = in+out columns; void procs have none)
        val sig = t.substring(t.indexOf("procedure") + "procedure".length)
          .trim.stripSuffix(":")
        val nameEnd = sig.indexOf('(')
        val name = sig.substring(0, nameEnd).trim
        val argsPart = sig.substring(nameEnd + 1, sig.indexOf(')', nameEnd))
        val outPart = sig.substring(sig.indexOf("::", sig.indexOf(')', nameEnd)) + 2)
          .trim.stripPrefix("(").stripSuffix(")")
        def colNames(s0: String): Seq[String] =
          s0.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(_.split("::")(0).trim)
        def colTypes(s0: String): Seq[String] =
          s0.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
            .map(x => x.split("::").lift(1).map(_.trim).getOrElse("ANY?"))
        val rows = st.table.drop(1).map(_.map(c =>
          if (c.isEmpty) null else toAny(TckValues.parse(c))))
        procs += name -> graft.cypher.Procedures.TableProc(
          colNames(argsPart), colNames(outPart), rows, colTypes(argsPart))
      }
      else if (t.contains("should be raised") && segs.nonEmpty)
        segs.last.expectError = true
      else if (t.contains("the result should be empty") && segs.nonEmpty)
        segs.last.expectEmpty = true
      else if (t.contains("the result should be") && segs.nonEmpty) {
        segs.last.ordered = t.contains(", in order") && !t.contains("in any order")
        segs.last.unorderedLists = t.contains("ignoring element order for lists")
        segs.last.table = st.table
      }
      // side-effect steps intentionally ignored
    }
    if (segs.isEmpty) return Some("no query step")

    val dir = s"$scratchRoot/s${counter.incrementAndGet()}"
    val mg = MutableGraph.empty(spark, dir)
    graft.cypher.Procedures.clearTables()
    procs.result().foreach { case (n, tp) =>
      graft.cypher.Procedures.registerTable(n, tp) }
    // newlines stay: `//` comments run to end-of-line
    setups.result().foreach(s => Cypher.execute(mg, s))

    def exec(text: String): Array[org.apache.spark.sql.Row] = {
      val q = Cypher.parse(text)
      if (q.clauses.exists(_.isInstanceOf[Cypher.WriteClause])) {
        val df = Cypher.execute(mg, text, params)
        // a write query without RETURN yields no result rows (openCypher);
        // execute()'s 1-row ok frame is its API-level acknowledgement
        if (q.items.isEmpty) Array.empty else df.collect()
      } else Cypher.query(mg.graph, text, params).collect()
    }

    segs.zipWithIndex.foldLeft(None: Option[String]) { case (bad, (seg, i)) =>
      bad.orElse {
        def at(msg: String) =
          if (segs.length == 1) msg else s"[query ${i + 1}/${segs.length}] $msg"
        if (seg.expectError) {
          try { exec(seg.query); Some(at("expected an error, query succeeded")) }
          catch { case _: Throwable => None }
        } else {
          try {
            val rows = exec(seg.query)
            if (seg.expectEmpty) {
              if (rows.isEmpty) None
              else Some(at(s"expected empty result, got ${rows.length} rows"))
            } else if (seg.table == null) {
              None // write-only: side-effect assertions unchecked
            } else {
              compare(rows, seg.table, seg.ordered, seg.unorderedLists).map(at)
            }
          } catch { case e: TckUnsupported => throw e
            case e: Throwable =>
              Some(at(s"error: ${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        }
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
      else (got.sortBy(rowKey), expected.sortBy(rowKey))
    if (g == e) None
    else Some(s"rows differ\ngot: ${g.take(8).mkString("; ")}\nexp: ${e.take(8).mkString("; ")}")
  }

  /** Canonical per-row sort key for the unordered bag compare. The
    * default `toString` is NOT canonical across equal values — a props
    * map with ≥5 entries prints "HashMap(…)" with hash-order entries
    * while a small one prints "Map(…)" in insertion order, so two equal
    * bags could sort into different sequences and falsely mismatch. */
  private def rowKey(row: Vector[TV]): String = row.map(canonKey).mkString(" ")
  private def canonKey(tv: TV): String = tv match {
    case VList(xs) => xs.map(canonKey).mkString("L[", ",", "]")
    case VMap(m) =>
      m.toSeq.sortBy(_._1).map { case (k, v) => k + ":" + canonKey(v) }
        .mkString("M{", ",", "}")
    case VNode(ls, ps) =>
      ls.toSeq.sorted.mkString("N<", ":", ">") +
        ps.toSeq.sortBy(_._1).map { case (k, v) => k + ":" + canonKey(v) }
          .mkString("{", ",", "}")
    case VRel(t, ps) =>
      "R<" + t + ">" + ps.toSeq.sortBy(_._1).map { case (k, v) => k + ":" + canonKey(v) }
        .mkString("{", ",", "}")
    case VPath(ns, ss) =>
      "P<" + ns.map(canonKey).mkString(",") + "|" +
        ss.map { case (r, f) => canonKey(r) + f }.mkString(",") + ">"
    case other => other.toString
  }
}
