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
    assert(q.patterns.length == 2)
    assert(q.patterns(1).optional)
    assert(q.where.isDefined)
    assert(q.items.map(_.alias) == Seq(Some("k"), Some("n")))
    assert(q.skip.contains(1L) && q.limit.contains(5L))
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
