package graft.operators

import graft.Q
import graft.cypher.Cypher
import graft.graph.PropertyGraph

/** End-to-end openCypher queries: each Spark side parses real Cypher text
  * (MATCH / OPTIONAL MATCH / WHERE / RETURN with implicit grouping) and
  * compiles to DataFrame joins over the property graph; the oracle is the
  * equivalent relational SQL over the base tables.
  */
object CypherOps {

  private def cy(text: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => Cypher.query(PropertyGraph.fromTpch(s, d), text)

  /** Undirected co-purchase graph induced on p_partkey < 300 (both edge
    * directions, label "co") for variable-length path queries. */
  private def coGraph(s: org.apache.spark.sql.SparkSession, d: String): PropertyGraph = {
    import org.apache.spark.sql.functions._
    val canon = PropertyGraph.coPurchase(s, d).filter(col("a") < 300 && col("b") < 300)
    val edges = canon.select(col("a").as("src"), col("b").as("dst"))
      .union(canon.select(col("b").as("src"), col("a").as("dst")))
      .withColumn("label", lit("co"))
    val verts = graft.Tables.part(s, d).filter(col("p_partkey") < 300)
      .select(col("p_partkey").as("id"), lit("part").as("label"),
        col("p_partkey").as("key"), col("p_name").as("name"))
    PropertyGraph(verts, edges)
  }

  val all: Seq[Q] = Seq(

    // ---- two-hop pattern chain with aggregate ----
    Q("q_cypher_2hop",
      """SELECT c_custkey, count(DISTINCT l_partkey) AS n_parts
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_custkey <= 50 GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)-[:contains]->(p:part)
           | WHERE c.key <= 50
           | RETURN c.key AS c_custkey, count(DISTINCT p.key) AS n_parts
           | ORDER BY c_custkey""".stripMargin.replace("\n", ""))),

    // ---- OPTIONAL MATCH (left-outer pattern) ----
    Q("q_cypher_optional",
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 300
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)(
      cy("""MATCH (n:customer) OPTIONAL MATCH (n)-[:placed]->(o:order)
           | WHERE n.key < 300
           | RETURN n.key AS c_custkey, count(o.key) AS n_orders
           | ORDER BY c_custkey""".stripMargin.replace("\n", ""))),

    // ---- reversed-direction pattern ----
    Q("q_cypher_reverse",
      """SELECT l_partkey AS p_partkey, count(*) AS n_orders FROM (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |WHERE l_partkey < 100 GROUP BY l_partkey ORDER BY p_partkey""".stripMargin)(
      cy("""MATCH (p:part)<-[:contains]-(o:order)
           | WHERE p.key < 100
           | RETURN p.key AS p_partkey, count(*) AS n_orders
           | ORDER BY p_partkey""".stripMargin.replace("\n", ""))),

    // ---- variable-length path *1..2 (walk semantics ≡ recursive CTE) ----
    Q("q_cypher_varlength",
      """WITH RECURSIVE ce AS (
        |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  WHERE l1.l_partkey < 300 AND l2.l_partkey < 300),
        |e AS (SELECT a AS src, b AS dst FROM ce UNION ALL SELECT b, a FROM ce),
        |r(id, d) AS (
        |  SELECT CAST(17 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 2)
        |SELECT DISTINCT id AS p_partkey FROM r WHERE d >= 1 ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
      Cypher.query(coGraph(s, d),
        "MATCH (a:part)-[:co*1..2]->(b:part) WHERE a.key = 17 " +
          "RETURN DISTINCT b.key AS p_partkey ORDER BY p_partkey")
    },

    // ---- predicate on both pattern endpoints + top-k on the aggregate ----
    Q("q_cypher_filter_order",
      """SELECT c_custkey, count(*) AS n
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderstatus = 'F' AND c_custkey < 200
        |GROUP BY c_custkey
        |ORDER BY n DESC, c_custkey LIMIT 15""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WHERE o.name = 'F' AND c.key < 200
           | RETURN c.key AS c_custkey, count(*) AS n
           | ORDER BY n DESC, c_custkey LIMIT 15""".stripMargin.replace("\n", "")))
  )
}
