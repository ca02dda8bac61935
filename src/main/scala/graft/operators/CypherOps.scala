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
