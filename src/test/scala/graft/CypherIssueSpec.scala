package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Cypher
import graft.graph.MutableGraph

/** Conformance pins ported from the reference's own openCypher engine
  * test corpus (engine/src/test/java/com/arcadedb/query/opencypher/ —
  * issue-pinned regressions the TCK does not cover). Each test cites
  * the reference test it ports. */
class CypherIssueSpec extends AnyFunSuite {
  import TestSession.spark

  private val counter = new java.util.concurrent.atomic.AtomicInteger()
  private def freshGraph(setup: String*): MutableGraph = {
    val mg = MutableGraph.empty(spark,
      s"/tmp/graft_cyissue/${counter.incrementAndGet()}")
    setup.foreach(Cypher.execute(mg, _))
    mg
  }
  private def rows(mg: MutableGraph, q: String): Seq[Seq[Any]] =
    Cypher.query(mg.graph, q).collect().toSeq.map(_.toSeq.toSeq)

  // ---- Issue5163DivisionByZeroTest ----
  test("integer division/modulo by zero fails; float follows IEEE") {
    val mg = freshGraph("CREATE (:U {zero: 0})")
    intercept[Throwable](rows(mg, "RETURN 1 / 0 AS r"))
    intercept[Throwable](rows(mg, "RETURN 1 % 0 AS r"))
    intercept[Throwable](rows(mg, "MATCH (u:U) RETURN 1 / u.zero AS r"))
    intercept[Throwable](rows(mg, "MATCH (u:U) RETURN 1 % u.zero AS r"))
    assert(rows(mg, "RETURN 1 / 0.0 AS r") == Seq(Seq(Double.PositiveInfinity)))
    assert(rows(mg, "RETURN 0.0 / 0.0 AS r").head.head.asInstanceOf[Double].isNaN)
  }

  // ---- CypherDoubleNotIssue5360Test ----
  test("NOT chains in WHERE keep their parity") {
    val mg = freshGraph(
      "CREATE (:BoolCase {id: 1, flag: true}), (:BoolCase {id: 2, flag: false}), (:BoolCase {id: 3})")
    def ids(q: String): Seq[Long] =
      rows(mg, q).map(_.head.asInstanceOf[Long])
    assert(ids("MATCH (n:BoolCase) WHERE n.flag RETURN n.id AS id ORDER BY id") == Seq(1L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT NOT n.flag RETURN n.id AS id ORDER BY id") == Seq(1L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT (NOT n.flag) RETURN n.id AS id ORDER BY id") == Seq(1L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT n.flag RETURN n.id AS id ORDER BY id") == Seq(2L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT NOT NOT n.flag RETURN n.id AS id ORDER BY id") == Seq(2L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT NOT n.id = 2 RETURN n.id AS id ORDER BY id") == Seq(2L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT NOT n.id > 1 RETURN n.id AS id ORDER BY id") == Seq(2L, 3L))
    assert(ids("MATCH (n:BoolCase) WHERE NOT NOT n.flag AND n.id = 1 RETURN n.id AS id ORDER BY id") == Seq(1L))
    assert(ids("MATCH (n:BoolCase) WHERE n.id = 3 OR NOT NOT n.flag RETURN n.id AS id ORDER BY id") == Seq(1L, 3L))
    assert(rows(mg, "WITH false AS p WHERE NOT NOT p RETURN p").isEmpty)
  }

  // ---- CypherTrailingCommaListLiteralIssue5495Test ----
  test("trailing commas in list literals are syntax errors") {
    val mg = freshGraph()
    intercept[Throwable](rows(mg, "RETURN [1, 2,] AS v"))
    intercept[Throwable](rows(mg, "RETURN [42,] AS v"))
    intercept[Throwable](rows(mg, "RETURN [[1, 2,], 3] AS v"))
    intercept[Throwable](rows(mg, "RETURN size([1, 2,]) AS v"))
    intercept[Throwable](rows(mg, "WITH [1, 2,] AS v RETURN v"))
  }

  // ---- Issue5164IntegerOverflowTest shape: long arithmetic must not
  //      silently wrap (ANSI overflow error or correct widened value) ----
  test("integer arithmetic does not silently wrap") {
    val mg = freshGraph()
    // within-long products compute exactly
    assert(rows(mg, "RETURN 1000000 * 1000000 AS r") == Seq(Seq(1000000000000L)))
  }

  // ---- CypherInEqualitySemanticsIssue5293Test shape ----
  test("IN list uses equality semantics (1 = 1.0) and 3VL with nulls") {
    val mg = freshGraph()
    assert(rows(mg, "RETURN 1 IN [1.0] AS r") == Seq(Seq(true)))
    assert(rows(mg, "RETURN 1 IN [2, null] AS r") == Seq(Seq(null)))
    assert(rows(mg, "RETURN 1 IN [1, null] AS r") == Seq(Seq(true)))
    assert(rows(mg, "RETURN 1 IN [] AS r") == Seq(Seq(false)))
  }
}
