package graft

import graft.sql.GraftSql
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-scoped parsed-statement cache (reference analog:
  * query/sql/parser/StatementCache.java:34 — LRU of parsed statements per
  * text). The contract: same (dialect, text) → the parse closure runs
  * once and the identical AST object is returned thereafter; capacity
  * overflow evicts in LRU order.
  */
class StatementCacheSpec extends AnyFunSuite {
  import TestSession._

  test("same (dialect, text) parses once and returns the identical AST object") {
    var parses = 0
    val a = StatementCache.cached("spec-prim", "TEXT-1") { parses += 1; Seq(1, 2, 3) }
    val b = StatementCache.cached("spec-prim", "TEXT-1") { parses += 1; Seq(9) }
    assert(parses === 1)
    assert(a eq b)
    // different text and different dialect are distinct entries
    val c = StatementCache.cached("spec-prim", "TEXT-2") { parses += 1; Seq(4) }
    val d = StatementCache.cached("spec-prim2", "TEXT-1") { parses += 1; Seq(5) }
    assert(parses === 3)
    assert((c ne a) && (d ne a))
  }

  test("capacity overflow evicts the least-recently-used entry") {
    (0 until 300).foreach(i => StatementCache.cached("spec-evict", s"T$i")(Seq(i)))
    var reparsed = false
    StatementCache.cached("spec-evict", "T0") { reparsed = true; Seq(0) }
    assert(reparsed, "entry 0 must have been evicted by 299 younger inserts (capacity 256)")
  }

  test("SQL front-end reuses the cached parse on a second invocation") {
    val q = "SELECT l_returnflag AS f, count(*) AS cnt FROM lineitem " +
      "GROUP BY l_returnflag ORDER BY f"
    val r1 = GraftSql.query(spark, sfDir, q).collect()
    // probe: the entry must now be cached, so this closure must NOT run
    StatementCache.cached("sql", q)(fail("SQL text was not cached by GraftSql.query"))
    val r2 = GraftSql.query(spark, sfDir, q).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
  }

  test("Cypher front-end returns the identical AST for repeated text") {
    val text = "MATCH (c:customer) WHERE c.c_custkey < 5 RETURN c.c_name AS name"
    val a = cypher.Cypher.parse(text)
    val b = cypher.Cypher.parse(text)
    assert(a eq b)
  }
}
