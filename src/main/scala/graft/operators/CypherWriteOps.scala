package graft.operators

import graft.{Q, Tables}
import graft.cypher.Cypher
import graft.graph.{MutableGraph, PropertyGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cypher write statements (CREATE / MERGE / SET / DETACH DELETE —
  * reference opencypher planner write steps over MutableVertex.java:42 /
  * GraphEngine edge creation): each query parses REAL Cypher write text,
  * mutates a writable graph copy, and returns the resulting state; the
  * DuckDB oracle derives the same post-mutation state declaratively from
  * the immutable source tables — a pass proves the write semantics.
  *
  * State lives under /tmp/graft_state keyed by scale factor; every run
  * re-copies the source graph first, so the queries are idempotent.
  */
object CypherWriteOps {

  private def slug(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")
  private def stateDir(q: String, d: String): String = s"/tmp/graft_state/${q}_${slug(d)}"

  /** nation/region demo graph: nation vertices (id = nationkey), region
    * vertices (id = 100 + regionkey), one in_region edge per nation. */
  private def natGraph(s: SparkSession, d: String): PropertyGraph = {
    val nv = Tables.nation(s, d).select(
      col("n_nationkey").cast("long").as("id"), lit("nation").as("label"),
      col("n_nationkey").cast("long").as("key"), col("n_name").as("name"))
    val rv = Tables.region(s, d).select(
      (col("r_regionkey") + 100).cast("long").as("id"), lit("region").as("label"),
      col("r_regionkey").cast("long").as("key"), col("r_name").as("name"))
    val e = Tables.nation(s, d).select(
      col("n_nationkey").cast("long").as("src"),
      (col("n_regionkey") + 100).cast("long").as("dst"),
      lit("in_region").as("label"))
    PropertyGraph(nv.unionByName(rv), e)
  }

  private def copied(s: SparkSession, d: String, q: String): MutableGraph =
    MutableGraph.copyOf(s, natGraph(s, d), stateDir(q, d))

  val all: Seq[Q] = Seq(

    // ---- CREATE: a new vertex, then an edge between matched nodes ----
    Q("q_cypher_create",
      """SELECT nkey, name, rkey FROM (
        |  SELECT n_nationkey AS nkey, n_name AS name, n_regionkey AS rkey FROM nation
        |  UNION ALL SELECT 999, 'GRAFTLAND', 1)
        |ORDER BY nkey""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_create")
      Cypher.execute(mg, "CREATE (n:nation {id: 999, key: 999, name: 'GRAFTLAND'})")
      Cypher.execute(mg,
        "MATCH (a:nation {key: 999}), (b:region {key: 1}) CREATE (a)-[:in_region]->(b)")
      Cypher.query(mg.graph,
        """MATCH (n:nation)-[:in_region]->(r:region)
          | RETURN n.key AS nkey, n.name AS name, r.key AS rkey
          | ORDER BY nkey""".stripMargin.replace("\n", ""))
    },

    // ---- SET with an expression over the matched row's own props ----
    Q("q_cypher_set",
      """SELECT n_nationkey AS key,
        |  CASE WHEN n_regionkey = 2 THEN lower(n_name) ELSE n_name END AS name
        |FROM nation ORDER BY key""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_set")
      Cypher.execute(mg,
        "MATCH (n:nation)-[:in_region]->(r:region {key: 2}) SET n.name = lower(n.name)")
      Cypher.query(mg.graph,
        "MATCH (n:nation) RETURN n.key AS key, n.name AS name ORDER BY key")
    },

    // ---- DETACH DELETE: vertices and incident edges both go ----
    Q("q_cypher_delete",
      """SELECT count(*) AS n_vertices, count(*) AS n_edges
        |FROM nation WHERE n_nationkey < 20""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_delete")
      Cypher.execute(mg, "MATCH (n:nation) WHERE n.key >= 20 DETACH DELETE n")
      mg.vertices.filter(col("label") === "nation")
        .agg(count(lit(1)).as("n_vertices"))
        .crossJoin(mg.edges.agg(count(lit(1)).as("n_edges")))
    },

    // ---- MERGE: existing key binds (no-op), missing key creates ----
    Q("q_cypher_merge",
      """SELECT key, name FROM (
        |  SELECT n_nationkey AS key, n_name AS name FROM nation
        |  UNION ALL SELECT 500, 'NEWLAND')
        |ORDER BY key""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_merge")
      Cypher.execute(mg, "MERGE (n:nation {id: 3, key: 3})")              // exists → no-op
      Cypher.execute(mg, "MERGE (n:nation {id: 500, key: 500, name: 'NEWLAND'})") // → create
      Cypher.query(mg.graph,
        "MATCH (n:nation) RETURN n.key AS key, n.name AS name ORDER BY key")
    },

    // ---- MERGE with ON MATCH SET / ON CREATE SET ----
    Q("q_cypher_merge_on",
      """SELECT key, name FROM (
        |  SELECT n_nationkey AS key,
        |    CASE WHEN n_nationkey = 3 THEN 'SEEN' ELSE n_name END AS name
        |  FROM nation
        |  UNION ALL SELECT 600, 'MADE')
        |ORDER BY key""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_merge_on")
      Cypher.execute(mg,
        "MERGE (n:nation {id: 3, key: 3}) ON MATCH SET n.name = 'SEEN' " +
          "ON CREATE SET n.name = 'NEVER'")
      Cypher.execute(mg,
        "MERGE (n:nation {id: 600, key: 600}) ON CREATE SET n.name = 'MADE' " +
          "ON MATCH SET n.name = 'NEVER'")
      Cypher.query(mg.graph,
        "MATCH (n:nation) RETURN n.key AS key, n.name AS name ORDER BY key")
    },

    // ---- SQL-dialect graph DML: CREATE VERTEX / CREATE EDGE (one edge
    //      per from×to pair) through the parser, shared write backend ----
    Q("q_sql_create_vertex_edge",
      """SELECT nkey, rkey FROM (
        |  SELECT n_nationkey AS nkey, n_regionkey AS rkey FROM nation
        |  UNION ALL SELECT 999, 1)
        |ORDER BY nkey""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "sql_cve")
      graft.sql.GraphDml.execute(mg,
        "CREATE VERTEX nation SET id = 999, key = 999, name = 'GRAFTLAND'")
      graft.sql.GraphDml.execute(mg,
        "CREATE EDGE in_region FROM (SELECT FROM nation WHERE key = 999) " +
          "TO (SELECT FROM region WHERE key = 1)")
      Cypher.query(mg.graph,
        """MATCH (n:nation)-[:in_region]->(r:region)
          | RETURN n.key AS nkey, r.key AS rkey ORDER BY nkey"""
          .stripMargin.replace("\n", ""))
    },

    // ---- SQL-dialect DELETE VERTEX (detaches incident edges) ----
    Q("q_sql_delete_vertex",
      """SELECT count(*) AS n_vertices, count(*) AS n_edges
        |FROM nation WHERE n_nationkey >= 10""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "sql_delv")
      graft.sql.GraphDml.execute(mg, "DELETE VERTEX nation WHERE key < 10")
      mg.vertices.filter(col("label") === "nation")
        .agg(count(lit(1)).as("n_vertices"))
        .crossJoin(mg.edges.agg(count(lit(1)).as("n_edges")))
    },

    // ---- SQL-dialect MOVE VERTEX: relabel to the target type; the
    //      stable surrogate id keeps every incident edge valid without a
    //      repointing pass (MoveVertexStep.java does delete+reinsert) ----
    Q("q_sql_move_vertex",
      """SELECT label, count(*) AS n FROM (
        |  SELECT CASE WHEN n_nationkey < 5 THEN 'micronation' ELSE 'nation' END AS label
        |  FROM nation)
        |GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "sql_move")
      graft.sql.GraphDml.execute(mg, "MOVE VERTEX nation TO TYPE:micronation WHERE key < 5")
      mg.vertices.filter(col("label").isin("nation", "micronation"))
        .groupBy("label").agg(count(lit(1)).as("n")).orderBy("label")
    },

    // ---- REMOVE: property removal (null-out on the matched set) ----
    Q("q_cypher_remove",
      """SELECT n_nationkey AS key,
        |  CASE WHEN n_nationkey < 10 THEN NULL ELSE n_name END AS name
        |FROM nation ORDER BY key""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_remove")
      Cypher.execute(mg, "MATCH (n:nation) WHERE n.key < 10 REMOVE n.name")
      Cypher.query(mg.graph,
        "MATCH (n:nation) RETURN n.key AS key, n.name AS name ORDER BY key")
    },

    // ---- read pattern with inline relationship props {k: v} ----
    Q("q_cypher_rel_props",
      """SELECT l_orderkey AS okey, l_partkey AS pkey
        |FROM lineitem WHERE l_orderkey < 500
        |GROUP BY 1, 2 HAVING sum(l_quantity) = 5
        |ORDER BY okey, pkey""".stripMargin) { (s, d) =>
      Cypher.query(PropertyGraph.fromTpch(s, d),
        """MATCH (o:order)-[r:contains {qty: 5.0}]->(p:part)
          | WHERE o.key < 500
          | RETURN o.key AS okey, p.key AS pkey ORDER BY okey, pkey"""
          .stripMargin.replace("\n", ""))
    },

    // ---- FOREACH: list-driven writes — marks every node on the matched
    //      paths (nodes(p) → ids, exploded into one bulk SET), then a
    //      second FOREACH over a literal list creates tag vertices ----
    Q("q_cypher_foreach",
      """SELECT key, seen FROM (
        |  SELECT n_nationkey AS key,
        |    CASE WHEN n_regionkey = 1 THEN 1 ELSE NULL END AS seen FROM nation
        |  UNION ALL SELECT r_regionkey,
        |    CASE WHEN r_regionkey = 1 THEN 1 ELSE NULL END FROM region
        |  UNION ALL SELECT 900 + x, NULL
        |    FROM (SELECT UNNEST(generate_series(1, 3)) AS x))
        |ORDER BY key""".stripMargin) { (s, d) =>
      val mg = copied(s, d, "cy_foreach")
      Cypher.execute(mg,
        "MATCH p = (n:nation)-[:in_region]->(r:region {key: 1}) " +
          "FOREACH (x IN nodes(p) | SET x.seen = 1)")
      Cypher.execute(mg,
        "FOREACH (i IN [1, 2, 3] | CREATE (:tag {id: 900 + i, key: 900 + i}))")
      Cypher.query(mg.graph,
        "MATCH (v) RETURN v.key AS key, v.seen AS seen ORDER BY key")
    }
  )
}
