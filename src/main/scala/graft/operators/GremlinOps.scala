package graft.operators

import graft.Q
import graft.gremlin.Gremlin
import graft.graph.PropertyGraph

/** End-to-end Gremlin traversals (reference gremlin/ module — TinkerPop over
  * ArcadeGraph, e.g. ArcadeGraph.java, ArcadeTraversalStrategy.java): each
  * Spark side parses real Gremlin text and compiles to one DataFrame plan
  * over the property graph; the oracle is the equivalent relational SQL over
  * the base tables. Traverser bag semantics (no implicit dedup) are what the
  * oracles encode.
  */
object GremlinOps {

  private def gr(text: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => Gremlin.query(PropertyGraph.fromTpch(s, d), text)

  val all: Seq[Q] = Seq(

    // ---- filtered hop + terminal count (ArcadeCountGlobalStep analog):
    //      one traverser per placed edge → count of matching orders ----
    Q("q_gremlin_count",
      "SELECT count(*) AS value FROM orders WHERE o_custkey < 100")(
      gr("g.V().hasLabel('customer').has('key', lt(100)).out('placed').count()")),

    // ---- two-hop values + dedup + order + limit ----
    Q("q_gremlin_values",
      """SELECT DISTINCT l_partkey AS value
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_custkey IN (1, 2, 3, 5, 8)
        |ORDER BY value LIMIT 25""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', within(1, 2, 3, 5, 8))" +
        ".out('placed').out('contains').values('key').dedup().order().limit(25)")),

    // ---- groupCount().by(property): the rendered TinkerPop result map ----
    Q("q_gremlin_groupcount",
      """SELECT o_orderstatus AS name, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)(
      gr("g.V().hasLabel('order').groupCount().by('name')")),

    // ---- as()/select().by(): path-step capture projected to columns ----
    Q("q_gremlin_select",
      """SELECT c_custkey AS c, o_orderkey AS o
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_custkey < 30 ORDER BY c, o""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(30)).as('c')" +
        ".out('placed').as('o').select('c','o').by('key').order().by('c').by('o')")),

    // ---- edge-object traversal: E().has(prop pred).outV() ----
    Q("q_gremlin_edge_filter",
      """SELECT DISTINCT l_orderkey AS value FROM (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_orderkey, l_partkey)
        |WHERE qty > 90 ORDER BY value""".stripMargin)(
      gr("g.E().hasLabel('contains').has('qty', gt(90))" +
        ".outV().values('key').dedup().order()")),

    // ---- terminal sum over an edge property (decimal-exact) ----
    Q("q_gremlin_sum",
      """SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS value
        |FROM orders WHERE o_custkey < 200""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(200))" +
        ".outE('placed').values('qty').sum()"))
  )
}
