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

  test("pattern predicates split from the WHERE conjunction; semi ≡ exists") {
    val q = Cypher.parse(
      "MATCH (c:customer) WHERE c.key BETWEEN 10 AND 40 AND (c)-[:placed]->(:order) " +
        "AND NOT (c)-[:placed]->(:order {name: 'X'}) RETURN c.key AS ck ORDER BY ck")
    val m = q.clauses.collect { case mc: Cypher.MatchC => mc }.head
    assert(m.patternPreds.map(_._2) == Seq(false, true)) // pos + negated
    assert(m.where.isDefined) // the BETWEEN survived (its AND not split)
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val got = Cypher.query(g,
      "MATCH (c:customer) WHERE c.key < 100 AND (c)-[:placed]->(:order {name: 'F'}) " +
        "RETURN c.key AS ck ORDER BY ck").collect().map(_.getLong(0))
    import org.apache.spark.sql.functions._
    val exp = Tables.customer(spark, sfDir).filter(col("c_custkey") < 100).alias("c")
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").alias("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select(col("c_custkey")).orderBy("c_custkey").collect().map(_.getLong(0))
    assert(got.sameElements(exp))
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

  test("write clauses: CREATE / MERGE / SET / DETACH DELETE mutate state") {
    import org.apache.spark.sql.functions._
    import graft.graph.MutableGraph
    val src = PropertyGraph(
      spark.range(3).select(col("id"), lit("n").as("label"), col("id").as("key"),
        concat(lit("v"), col("id")).as("name")),
      spark.range(2).select(col("id").as("src"), (col("id") + 1).as("dst"),
        lit("next").as("label")))
    val mg = MutableGraph.copyOf(spark, src, "/tmp/graft_state/cyspec_write")
    // CREATE node + edge
    Cypher.execute(mg, "CREATE (x:n {id: 10, key: 10, name: 'v10'})")
    Cypher.execute(mg, "MATCH (a:n {key: 2}), (b:n {key: 10}) CREATE (a)-[:next]->(b)")
    assert(mg.vertices.count() == 4 && mg.edges.count() == 3)
    // MERGE: existing no-op, new creates
    Cypher.execute(mg, "MERGE (x:n {id: 10, key: 10})")
    assert(mg.vertices.count() == 4)
    Cypher.execute(mg, "MERGE (x:n {id: 11, key: 11, name: 'v11'})")
    assert(mg.vertices.count() == 5)
    // SET with self-referencing expression
    Cypher.execute(mg, "MATCH (x:n) WHERE x.key <= 1 SET x.name = upper(x.name)")
    val names = mg.vertices.orderBy("key").collect().map(_.getAs[String]("name")).toSeq
    assert(names == Seq("V0", "V1", "v2", "v10", "v11"))
    // DETACH DELETE removes the vertex and its incident edges
    Cypher.execute(mg, "MATCH (x:n {key: 2}) DETACH DELETE x")
    assert(mg.vertices.count() == 4)
    assert(mg.edges.count() == 1) // 1->2 and 2->10 both gone
    // write clause rejected in read entry point
    intercept[graft.sql.Parser.ParseException] {
      Cypher.query(mg.graph, "MATCH (x:n) DELETE x")
    }
  }

  test("RETURN DISTINCT deduplicates") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val df = Cypher.query(g,
      "MATCH (c:customer)-[:placed]->(o:order) RETURN DISTINCT o.name AS st ORDER BY st")
    val vals = df.collect().map(_.getString(0)).toSeq
    assert(vals == vals.distinct && vals.nonEmpty)
  }
}
