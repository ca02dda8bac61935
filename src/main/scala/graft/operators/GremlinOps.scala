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
        ".outE('placed').values('qty').sum()")),

    // ---- repeat(out()).times(2): fixed-iteration unrolled traversal
    //      (TinkerPop RepeatStep; reference runs it via full TinkerPop,
    //      gremlin/ArcadeGraph.java:80) ----
    Q("q_gremlin_repeat",
      """SELECT DISTINCT l_partkey AS value
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey < 50 ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(50))" +
        ".repeat(out()).times(2).values('key').dedup().order()")),

    // ---- repeat(out()).emit().times(2): every post-pass frontier joins
    //      the output — pass 1 emits orders, pass 2 emits parts (bag) ----
    Q("q_gremlin_emit",
      """SELECT value FROM (
        |  SELECT o_orderkey AS value FROM orders WHERE o_custkey < 10
        |  UNION ALL
        |  SELECT l_partkey AS value
        |  FROM orders JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
        |    ON li.l_orderkey = o_orderkey
        |  WHERE o_custkey < 10)
        |ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(10))" +
        ".repeat(out()).emit().times(2).values('key').order()")),

    // ---- sample(n): deterministic md5-ordered draw (the engine's
    //      reproducible-sampling convention) of n traversers ----
    Q("q_gremlin_sample",
      """SELECT value FROM (
        |  SELECT c_custkey AS value FROM customer
        |  ORDER BY md5(CAST(c_custkey AS VARCHAR)) LIMIT 10)
        |ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer').values('key').sample(10).order()")),

    // ---- repeat(out()).until(hasLabel): do-while emission, bag semantics
    //      (one traverser per (customer,order) x (order,part) edge pair) ----
    Q("q_gremlin_until",
      """SELECT l_partkey AS value
        |FROM orders JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
        |  ON li.l_orderkey = o_orderkey
        |WHERE o_custkey < 20 ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(20))" +
        ".repeat(out()).until(hasLabel('part')).values('key').order()")),

    // ---- path().by('key'): per-traverser visited-element list, accumulated
    //      at hop time (rendered as a '/'-joined string for the oracle) ----
    Q("q_gremlin_path",
      """SELECT CAST(c_custkey AS VARCHAR) || '/' || CAST(o_orderkey AS VARCHAR)
        |    || '/' || CAST(l_partkey AS VARCHAR) AS path
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
        |  ON li.l_orderkey = o_orderkey
        |WHERE c_custkey < 5 ORDER BY path""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      Gremlin.query(PropertyGraph.fromTpch(s, d),
        "g.V().hasLabel('customer').has('key', lt(5))" +
          ".out('placed').out('contains').path().by('key')")
        .select(concat_ws("/", transform(col("path"), _.cast("string"))).as("path"))
        .orderBy("path")
    },

    // ---- as()/where(neq): orders sharing a part with a DIFFERENT order ----
    Q("q_gremlin_where",
      """SELECT DISTINCT b.l_orderkey AS value
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |  ON a.l_partkey = b.l_partkey AND b.l_orderkey <> a.l_orderkey
        |WHERE a.l_orderkey < 200
        |ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('order').has('key', lt(200)).as('a')" +
        ".out('contains').in('contains').where(neq('a'))" +
        ".values('key').dedup().order()")),

    // ---- group().by(k).by(count()): the rendered TinkerPop group map ----
    Q("q_gremlin_group",
      """SELECT o_orderstatus AS name, count(*) AS value
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)(
      gr("g.V().hasLabel('order').group().by('name').by(count())")),

    // ---- group().by(k).by(values(p).sum()): grouped decimal-exact sum ----
    Q("q_gremlin_group_sum",
      """SELECT o_orderstatus AS o,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS value
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)(
      gr("g.V().hasLabel('customer').outE('placed').as('e').inV().as('o')" +
        ".select('o','e').by('name').by('qty')" +
        ".group().by('o').by(values('e').sum())")),

    // ---- and()/or()/not() boolean filter composition ----
    Q("q_gremlin_bool",
      """SELECT c_custkey AS value FROM customer
        |WHERE (c_custkey < 100 AND c_custkey > 50 AND c_custkey <> 77)
        |   OR c_custkey IN (7, 11)
        |ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer')" +
        ".or(and(has('key', lt(100)), has('key', gt(50)), not(has('key', eq(77)))), " +
        "has('key', within(7, 11))).values('key').order()")),

    // ---- valueMap(): rendered property map (values as string lists);
    //      scalars extracted for the oracle, like q_map_funcs ----
    Q("q_gremlin_valuemap",
      """SELECT CAST(c_custkey AS VARCHAR) AS key, c_name AS name
        |FROM customer WHERE c_custkey < 10 ORDER BY name""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      Gremlin.query(PropertyGraph.fromTpch(s, d),
        "g.V().hasLabel('customer').has('key', lt(10)).valueMap('key', 'name')")
        .select(element_at(col("valueMap"), "key").getItem(0).as("key"),
          element_at(col("valueMap"), "name").getItem(0).as("name"))
        .orderBy("name")
    },

    // ---- project('a','b').by(k): named multi-column projection ----
    Q("q_gremlin_project",
      """SELECT o_orderkey AS k, o_orderstatus AS status
        |FROM orders WHERE o_orderkey < 100 ORDER BY k""".stripMargin)(
      gr("g.V().hasLabel('order').has('key', lt(100))" +
        ".project('k', 'status').by('key').by('name').order().by('k')")),

    // ---- union(out, in): branch traversals bag-unioned ----
    Q("q_gremlin_union",
      """SELECT value FROM (
        |  SELECT l_partkey AS value
        |  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |  WHERE l_orderkey < 50
        |  UNION ALL
        |  SELECT o_custkey AS value FROM orders WHERE o_orderkey < 50
        |) ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('order').has('key', lt(50))" +
        ".union(out('contains'), in('placed')).values('key').order()")),

    // ---- simplePath(): cycle filter — orders reached via a shared part,
    //      excluding the path that returns to its own origin ----
    Q("q_gremlin_simplepath",
      """SELECT b.l_orderkey AS value
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |  ON a.l_partkey = b.l_partkey AND b.l_orderkey <> a.l_orderkey
        |WHERE a.l_orderkey < 30
        |ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('order').has('key', lt(30))" +
        ".out('contains').in('contains').simplePath().values('key').order()")),

    // ---- choose(): per-element conditional projection ----
    Q("q_gremlin_choose",
      """SELECT CASE WHEN c_custkey < 15 THEN CAST(c_custkey AS VARCHAR)
        |            ELSE c_name END AS value
        |FROM customer WHERE c_custkey < 30 ORDER BY value""".stripMargin)(
      gr("g.V().hasLabel('customer').has('key', lt(30))" +
        ".choose(has('key', lt(15)), 'key', 'name').order()"))
  )
}
