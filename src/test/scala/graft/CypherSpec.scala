package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.scalatest.funsuite.AnyFunSuite

/** Cypher parser/translator coverage beyond the oracled q_cypher_*. */
class CypherSpec extends AnyFunSuite {
  import TestSession._

  test("parses chains, directions, optional, return items") {
    val q = Cypher.parse(
      "MATCH (a:customer)-[:placed]->(b:order) OPTIONAL MATCH (b)-[:contains]->(p:part) " +
        "WHERE a.key < 10 RETURN a.key AS k, count(DISTINCT p.key) AS n ORDER BY k SKIP 1 LIMIT 5")
    val matches = q.clauses.collect { case m: Cypher.MatchC => m }
    assert(matches.length == 2)
    assert(matches(1).chains.head.optional)
    assert(matches(1).where.isDefined)
    assert(q.items.map(_.alias) == Seq(Some("k"), Some("n")))
    assert(q.skip.contains(1L) && q.limit.contains(5L))
  }

  test("WITH carries variables, UNWIND explodes literals, inline props filter") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val lits = Cypher.query(g, "UNWIND [3, 1, 2] AS x RETURN x ORDER BY x")
    assert(lits.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val carried = Cypher.query(g,
      "MATCH (c:customer)-[:placed]->(o:order) WITH c, o WHERE c.key = 1 " +
        "RETURN c.key AS ck, count(*) AS n")
    val direct = Cypher.query(g,
      "MATCH (c:customer {key: 1})-[:placed]->(o:order) RETURN c.key AS ck, count(*) AS n")
    assert(carried.collect().toSeq == direct.collect().toSeq)
  }

  test("reverse direction parses to the same join as forward") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val fwd = Cypher.query(g,
      "MATCH (o:order)-[:contains]->(p:part) WHERE p.key < 20 RETURN p.key AS k, count(*) AS n ORDER BY k")
    val rev = Cypher.query(g,
      "MATCH (p:part)<-[:contains]-(o:order) WHERE p.key < 20 RETURN p.key AS k, count(*) AS n ORDER BY k")
    assert(fwd.collect().toSeq == rev.collect().toSeq)
  }

  test("multi-clause MATCH joins on shared variables") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val two = Cypher.query(g,
      "MATCH (c:customer)-[:placed]->(o:order) MATCH (o)-[:contains]->(p:part) " +
        "WHERE c.key = 1 RETURN count(DISTINCT p.key) AS n")
    val one = Cypher.query(g,
      "MATCH (c:customer)-[:placed]->(o:order)-[:contains]->(p:part) " +
        "WHERE c.key = 1 RETURN count(DISTINCT p.key) AS n")
    assert(two.collect()(0).getLong(0) == one.collect()(0).getLong(0))
  }

  test("RETURN DISTINCT deduplicates") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val df = Cypher.query(g,
      "MATCH (c:customer)-[:placed]->(o:order) RETURN DISTINCT o.name AS st ORDER BY st")
    val vals = df.collect().map(_.getString(0)).toSeq
    assert(vals == vals.distinct && vals.nonEmpty)
  }
}
