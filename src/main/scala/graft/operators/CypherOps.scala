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

  /** Nation chain graph (consecutive nations within a region, both edge
    * directions, label "next") for the CALL algo.* procedures — the same
    * construction GraphAlgoOps oracles with an unrolled recurrence. */
  private def nationGraph(s: org.apache.spark.sql.SparkSession, d: String): PropertyGraph = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val n = graft.Tables.nation(s, d)
    val byRegion = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    val canon = n.withColumn("b", lead(col("n_nationkey"), 1).over(byRegion))
      .filter(col("b").isNotNull)
      .select(col("n_nationkey").as("a"), col("b"))
    val edges = canon.select(col("a").as("src"), col("b").as("dst"))
      .union(canon.select(col("b").as("src"), col("a").as("dst")))
      .withColumn("label", lit("next"))
    val verts = n.select(col("n_nationkey").as("id"), lit("nation").as("label"),
      col("n_nationkey").as("key"), col("n_name").as("name"))
    PropertyGraph(verts, edges)
  }

  /** Order-only graph carrying the order date as a vertex property, for
    * the temporal-function surface (no edges needed). */
  private def orderGraph(s: org.apache.spark.sql.SparkSession, d: String): PropertyGraph = {
    import org.apache.spark.sql.functions._
    val ords = graft.Tables.orders(s, d).select(
      PropertyGraph.vid(PropertyGraph.TOrder, col("o_orderkey")).as("id"),
      lit("order").as("label"), col("o_orderkey").as("key"),
      col("o_orderdate").as("odate"))
    val edges = ords.limit(0).select(col("id").as("src"), col("id").as("dst"),
      lit("x").as("label"))
    PropertyGraph(ords, edges)
  }

  /** Undirected co-purchase graph induced on p_partkey < 300 (both edge
    * directions, label "co") for variable-length path queries. */
  private def coGraph(s: org.apache.spark.sql.SparkSession, d: String): PropertyGraph = {
    import org.apache.spark.sql.functions._
    // r11: the endpoint bound pushes into the lineitem scan (see
    // coPurchase), and iterative path queries reference the edge relation
    // per hop — materialize the small induced subgraph once
    val canon = graft.Materialize.once(
      PropertyGraph.coPurchase(s, d, maxPart = Some(300)))
    val edges = canon.select(col("a").as("src"), col("b").as("dst"))
      .union(canon.select(col("b").as("src"), col("a").as("dst")))
      .withColumn("label", lit("co"))
    val verts = graft.Tables.part(s, d).filter(col("p_partkey") < 300)
      .select(col("p_partkey").as("id"), lit("part").as("label"),
        col("p_partkey").as("key"), col("p_name").as("name"))
    PropertyGraph(verts, edges)
  }

  val all: Seq[Q] = Seq(

    // ---- LOAD CSV: rows stream into the pattern pipeline and join
    //      back to graph data (reference cy/steps/LoadCSVStep.java:61).
    //      The CSV is exported deterministically from the customer table
    //      first, so the oracle can derive the same result relationally. ----
    Q("q_cypher_load_csv",
      """SELECT c_name AS name, count(*)::BIGINT AS n_orders
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_custkey < 50
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.col
      val csvDir = s"/tmp/graft_state/load_csv_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.Tables.customer(s, d).filter(col("c_custkey") < 50)
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
      Cypher.query(PropertyGraph.fromTpch(s, d),
        s"LOAD CSV WITH HEADERS FROM 'file://$csvDir' AS row " +
          "MATCH (c:customer)-[:placed]->(o:order) WHERE c.key = toInteger(row.key) " +
          "RETURN row.name AS name, count(o) AS n_orders ORDER BY name")
    },

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
      // WHERE belongs to the MATCH clause it follows: on the OPTIONAL
      // MATCH it would null-extend non-qualifying rows (TCK Match7 [11]),
      // not filter them — the left-side restriction goes on the first MATCH
      cy("""MATCH (n:customer) WHERE n.key < 300
           | OPTIONAL MATCH (n)-[:placed]->(o:order)
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

    // ---- WITH pipeline: aggregate a horizon, then keep expanding from the
    //      carried node variable (UnwindStep/WITH-chaining analog) ----
    Q("q_cypher_with",
      """WITH f AS (
        |  SELECT c_custkey, count(*) AS nf
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  WHERE o_orderstatus = 'F' AND c_custkey < 200
        |  GROUP BY 1)
        |SELECT f.c_custkey, nf, count(*) AS total
        |FROM f JOIN orders ON o_custkey = f.c_custkey
        |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WHERE o.name = 'F' AND c.key < 200
           | WITH c, count(*) AS nf
           | MATCH (c)-[:placed]->(o2:order)
           | RETURN c.key AS c_custkey, nf, count(*) AS total
           | ORDER BY c_custkey""".stripMargin.replace("\n", ""))),

    // ---- WITH ... WHERE (the HAVING analog on the projected horizon) ----
    Q("q_cypher_with_where",
      """SELECT c_custkey AS ck, count(*) AS n
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 HAVING count(*) >= 15 ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WITH c.key AS ck, count(*) AS n WHERE n >= 15
           | RETURN ck, n ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- WITH … ORDER BY … LIMIT (sorted/paginated horizon) ----
    Q("q_cypher_with_topk",
      """SELECT ck, n FROM (
        |  SELECT c_custkey AS ck, count(*) AS n
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1 ORDER BY n DESC, ck LIMIT 5)
        |ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WITH c.key AS ck, count(*) AS n ORDER BY n DESC, ck LIMIT 5
           | RETURN ck, n ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- undirected relationship -[:t]- (either orientation matches) ----
    Q("q_cypher_undirected",
      """SELECT l_partkey AS p_partkey, count(*) AS n_orders FROM (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |WHERE l_partkey < 100 GROUP BY l_partkey ORDER BY p_partkey""".stripMargin)(
      cy("""MATCH (p:part)-[:contains]-(o:order)
           | WHERE p.key < 100
           | RETURN p.key AS p_partkey, count(*) AS n_orders
           | ORDER BY p_partkey""".stripMargin.replace("\n", ""))),

    // ---- UNWIND a collected list back into rows (UnwindStep.java:54) ----
    Q("q_cypher_unwind",
      """SELECT c_custkey AS k, c_custkey * 2 AS dbl
        |FROM customer WHERE c_custkey <= 10 ORDER BY k""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 10
           | WITH collect(c.key) AS ks
           | UNWIND ks AS k
           | RETURN k, k * 2 AS dbl ORDER BY k""".stripMargin.replace("\n", ""))),

    // ---- relationship variable: project an edge property ----
    Q("q_cypher_rel_var",
      """SELECT l_orderkey AS o_orderkey, l_partkey AS p_partkey,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE AS qty
        |FROM lineitem WHERE l_orderkey < 50
        |GROUP BY 1, 2 ORDER BY o_orderkey, p_partkey""".stripMargin)(
      cy("""MATCH (o:order)-[r:contains]->(p:part)
           | WHERE o.key < 50
           | RETURN o.key AS o_orderkey, p.key AS p_partkey, r.qty AS qty
           | ORDER BY o_orderkey, p_partkey""".stripMargin.replace("\n", ""))),

    // ---- inline property predicate {k: v} on a pattern node ----
    Q("q_cypher_inline_props",
      "SELECT o_orderkey FROM orders WHERE o_custkey = 42 ORDER BY o_orderkey")(
      cy("""MATCH (c:customer {key: 42})-[:placed]->(o:order)
           | RETURN o.key AS o_orderkey ORDER BY o_orderkey""".stripMargin.replace("\n", ""))),

    // ---- graph metadata functions: id() / labels() / type() ----
    Q("q_cypher_meta_fns",
      """SELECT c_custkey * 8 AS cid, 'customer' AS lbls, 'placed' AS rt,
        |  o_orderkey AS okey, c_custkey + 0 AS ck
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey <= 5 ORDER BY cid, okey""".stripMargin)(
      cy("""MATCH (c:customer)-[r:placed]->(o:order)
           | WHERE c.key <= 5
           | RETURN id(c) AS cid, array_join(labels(c), ',') AS lbls, type(r) AS rt,
           |   o.key AS okey, toInteger(c.key) AS ck
           | ORDER BY cid, okey""".stripMargin.replace("\n", ""))),

    // ---- CASE inside an aggregate (conditional counting) ----
    Q("q_cypher_case",
      """SELECT c_custkey AS key,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS nf
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 100 GROUP BY 1 ORDER BY key""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WHERE c.key < 100
           | RETURN c.key AS key,
           |   sum(CASE WHEN o.name = 'F' THEN 1 ELSE 0 END) AS nf
           | ORDER BY key""".stripMargin.replace("\n", ""))),

    // ---- dynamic typing (variant calculus): one UNWIND column holding
    //      strings, integers, floats, booleans and nulls per row; count
    //      skips nulls, min/max use openCypher's cross-type aggregation
    //      order (lists < strings < booleans < numbers); the canonical
    //      render restores each ORIGINAL kind (Cypher.Variant) ----
    Q("q_cypher_mixed",
      """SELECT c_custkey AS key,
        |  (3 + (c_custkey % 2 = 0)::INT)::BIGINT AS cnt,
        |  '''' || c_name || '''' AS mn,
        |  CASE WHEN c_custkey % 2 = 0 AND c_custkey > 2
        |       THEN c_custkey::VARCHAR ELSE '2.5' END AS mx
        |FROM customer WHERE c_custkey <= 40 ORDER BY key""".stripMargin)(
      (s, d) => {
        import org.apache.spark.sql.functions.col
        Cypher.query(PropertyGraph.fromTpch(s, d),
          """MATCH (c:customer) WHERE c.key <= 40
            | UNWIND [c.name, CASE WHEN c.key % 2 = 0 THEN c.key ELSE null END,
            |         2.5, true, null] AS v
            | RETURN c.key AS key, count(v) AS cnt, min(v) AS mn, max(v) AS mx
            | ORDER BY key""".stripMargin.replace("\n", ""))
          .select(col("key"), col("cnt"),
            col("mn").getField("_vtck").as("mn"),
            col("mx").getField("_vtck").as("mx"))
      }),

    // ---- shortestPath: min-depth BFS bound to a path variable ----
    Q("q_cypher_shortest_path",
      """WITH RECURSIVE ce AS (
        |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        |  WHERE l1.l_partkey < 300 AND l2.l_partkey < 300),
        |e AS (SELECT a AS src, b AS dst FROM ce UNION ALL SELECT b, a FROM ce),
        |r(id, d) AS (
        |  SELECT CAST(17 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 3)
        |SELECT id AS pkey, min(d) AS len FROM r
        |GROUP BY id HAVING min(d) >= 1 ORDER BY pkey""".stripMargin) { (s, d) =>
      Cypher.query(coGraph(s, d),
        "MATCH p = shortestPath((a:part {key: 17})-[:co*1..3]->(b:part)) " +
          "RETURN b.key AS pkey, p.length AS len ORDER BY pkey")
    },

    // ---- string predicates STARTS WITH / ENDS WITH + exists() ----
    Q("q_cypher_string_preds",
      """SELECT c_custkey AS key, c_name AS name FROM customer
        |WHERE c_name LIKE '%7' AND c_name LIKE 'Customer%' AND c_custkey < 200
        |ORDER BY key""".stripMargin)(
      cy("""MATCH (c:customer)
           | WHERE c.name ENDS WITH '7' AND c.name STARTS WITH 'Customer'
           |   AND exists(c.name) AND c.key < 200
           | RETURN c.key AS key, c.name AS name ORDER BY key"""
        .stripMargin.replace("\n", ""))),

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
           | ORDER BY n DESC, c_custkey LIMIT 15""".stripMargin.replace("\n", ""))),

    // ---- WHERE pattern predicate → semi join (the reference planner's
    //      ExpandInto rewrite of a bare pattern in WHERE) ----
    Q("q_cypher_pattern_pred",
      """SELECT c_custkey AS ck FROM customer
        |WHERE c_custkey < 300 AND EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)
           | WHERE c.key < 300 AND (c)-[:placed]->(:order {name: 'F'})
           | RETURN c.key AS ck ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- NOT pattern predicate → anti join ----
    Q("q_cypher_pattern_pred_not",
      """SELECT c_custkey AS ck FROM customer
        |WHERE c_custkey < 300 AND NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)
           | WHERE c.key < 300 AND NOT (c)-[:placed]->(:order {name: 'F'})
           | RETURN c.key AS ck ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- SKIP pagination on a sorted WITH horizon ----
    Q("q_cypher_skip",
      """SELECT ck, n FROM (
        |  SELECT c_custkey AS ck, count(*) AS n
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1 ORDER BY n DESC, ck LIMIT 5 OFFSET 3)
        |ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)-[:placed]->(o:order)
           | WITH c.key AS ck, count(*) AS n ORDER BY n DESC, ck SKIP 3 LIMIT 5
           | RETURN ck, n ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- openCypher list surface: range/head/tail/size over UNWIND ----
    Q("q_cypher_list_funcs",
      """SELECT x, len(generate_series(1, x)) AS sz,
        |  generate_series(x, 20)[1] AS hd,
        |  len(generate_series(1, x)[2:]) AS tl
        |FROM (SELECT UNNEST(generate_series(1, 12)) AS x)
        |ORDER BY x""".stripMargin)(
      cy("""UNWIND range(1, 12) AS x
           | RETURN x, size(range(1, x)) AS sz, head(range(x, 20)) AS hd,
           |   size(tail(range(1, x))) AS tl
           | ORDER BY x""".stripMargin.replace("\n", ""))),

    // ---- percentileCont aggregate over a relationship property ----
    Q("q_cypher_percentile",
      """SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS p50
        |FROM orders""".stripMargin)(
      cy("""MATCH (c:customer)-[r:placed]->(o:order)
           | RETURN round(percentileCont(r.qty, 0.5), 4) AS p50"""
        .stripMargin.replace("\n", ""))),

    // ---- list comprehension [v IN list WHERE p | m] → codegen'd
    //      higher-order filter/transform (Cypher25Parser.g4
    //      listComprehension) ----
    Q("q_cypher_listcomp",
      """SELECT x,
        |  coalesce(array_to_string(list_transform(list_filter(generate_series(1, x),
        |    y -> y % 2 = 0), y -> (y * y)::VARCHAR), ','), '') AS sq,
        |  len(list_filter(generate_series(1, x), y -> y % 3 = 0)) AS n3
        |FROM (SELECT UNNEST(generate_series(1, 12)) AS x) ORDER BY x""".stripMargin)(
      cy("""UNWIND range(1, 12) AS x
           | RETURN x, array_join([y IN range(1, x) WHERE y % 2 = 0 | toString(y * y)], ',') AS sq,
           |   toInteger(size([y IN range(1, x) WHERE y % 3 = 0])) AS n3
           | ORDER BY x""".stripMargin.replace("\n", ""))),

    // ---- pattern comprehension [(c)-[:T]->(o) WHERE p | m] → one grouped
    //      collect over the pattern frame + one left join (never a per-row
    //      subquery; elements sorted for determinism) ----
    Q("q_cypher_patterncomp",
      """SELECT c_custkey AS ck,
        |  coalesce((SELECT array_to_string(list_sort(list(o_orderkey::VARCHAR)), ',')
        |            FROM orders
        |            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'), '') AS fo,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)::BIGINT AS n
        |FROM customer WHERE c_custkey <= 30 ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 30
           | RETURN c.key AS ck,
           |   array_join([(c)-[:placed]->(o:order) WHERE o.name = 'F' | toString(o.key)], ',') AS fo,
           |   toInteger(size([(c)-[:placed]->(o2:order) | o2.key])) AS n
           | ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- temporal constructors + truncation + durations (reference
    //      function/temporal/*.java): durations are total seconds, the
    //      flat engine-portable encoding ----
    Q("q_cypher_temporal",
      """SELECT o_orderkey AS k,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mo,
        |  date_diff('second', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') AS secs
        |FROM orders
        |WHERE o_orderkey < 500
        |  AND date_diff('second', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') > 1460 * 86400
        |ORDER BY k""".stripMargin) { (s, d) =>
      Cypher.query(orderGraph(s, d),
        "MATCH (o:order) WHERE o.key < 500 AND " +
          "duration.between(o.odate, datetime('2001-08-01 00:00:00')) > duration('P1460D') " +
          "RETURN o.key AS k, toString(date.truncate('month', o.odate)) AS mo, " +
          "duration.between(o.odate, datetime('2001-08-01 00:00:00')) AS secs ORDER BY k")
    },

    // ---- named plain paths: nodes()/relationships()/length() resolve
    //      statically on fixed-hop chains ----
    Q("q_cypher_path_fns",
      """SELECT c_custkey AS ck, o_orderkey AS ok, 1::BIGINT AS len, 2::BIGINT AS nn,
        |  'placed' AS rels
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey <= 5 ORDER BY ck, ok""".stripMargin)(
      cy("""MATCH p = (c:customer)-[:placed]->(o:order) WHERE c.key <= 5
           | RETURN c.key AS ck, o.key AS ok, length(p) AS len,
           |   toInteger(size(nodes(p))) AS nn, array_join(relationships(p), ',') AS rels
           | ORDER BY ck, ok""".stripMargin.replace("\n", ""))),

    // ---- keys(n) / properties(n): the property map of a bound variable
    //      (schema facts — keys resolve to a literal list, properties to
    //      a struct over the flattened prop columns, emitted as JSON for
    //      cross-engine hashing) ----
    Q("q_cypher_props_fns",
      """SELECT c_custkey AS ck, 'key,name' AS ks,
        |  to_json({'key': c_custkey, 'name': c_name})::VARCHAR AS props
        |FROM customer WHERE c_custkey <= 20 ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 20
           | RETURN c.key AS ck, array_join(keys(c), ',') AS ks,
           |   to_json(properties(c)) AS props
           | ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- UNION ALL across branches, trailing ORDER BY modifies the
    //      combined result (TCK clauses/union) ----
    Q("q_cypher_union",
      """SELECT k, src FROM (
        |  SELECT c_custkey AS k, 'cust' AS src FROM customer WHERE c_custkey <= 5
        |  UNION ALL
        |  SELECT o_orderkey AS k, 'ord' AS src FROM orders WHERE o_orderkey <= 8)
        |ORDER BY src, k""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 5 RETURN c.key AS k, 'cust' AS src
           | UNION ALL MATCH (o:order) WHERE o.key <= 8 RETURN o.key AS k, 'ord' AS src
           | ORDER BY src, k""".stripMargin.replace("\n", ""))),

    // ---- plain UNION deduplicates across branches ----
    Q("q_cypher_union_distinct",
      """SELECT c_custkey AS k FROM customer WHERE c_custkey <= 6
        |UNION
        |SELECT c_custkey AS k FROM customer WHERE c_custkey BETWEEN 4 AND 9
        |ORDER BY k""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 6 RETURN c.key AS k
           | UNION MATCH (c2:customer) WHERE c2.key >= 4 AND c2.key <= 9 RETURN c2.key AS k
           | ORDER BY k""".stripMargin.replace("\n", ""))),

    // ---- list quantifiers all/any/none/single (TCK expressions/
    //      quantifier) → higher-order forall/exists, inside codegen ----
    Q("q_cypher_quantifiers",
      """SELECT x,
        |  len(list_filter(generate_series(1, x), y -> y < 8)) = len(generate_series(1, x)) AS qall,
        |  len(list_filter(generate_series(1, x), y -> y % 4 = 0)) > 0 AS qany,
        |  len(list_filter(generate_series(1, x), y -> y % 7 = 0)) = 0 AS qnone,
        |  len(list_filter(generate_series(1, x), y -> y % 3 = 0)) = 1 AS qsingle
        |FROM (SELECT UNNEST(generate_series(1, 10)) AS x) ORDER BY x""".stripMargin)(
      cy("""UNWIND range(1, 10) AS x
           | RETURN x,
           |   all(y IN range(1, x) WHERE y < 8) AS qall,
           |   any(y IN range(1, x) WHERE y % 4 = 0) AS qany,
           |   none(y IN range(1, x) WHERE y % 7 = 0) AS qnone,
           |   single(y IN range(1, x) WHERE y % 3 = 0) AS qsingle
           | ORDER BY x""".stripMargin.replace("\n", ""))),

    // ---- map projection n{.prop, key: expr} → struct (JSON-emitted for
    //      cross-engine hashing) ----
    Q("q_cypher_map_projection",
      """SELECT c_custkey AS ck,
        |  to_json({'name': c_name, 'double_key': c_custkey * 2})::VARCHAR AS mp
        |FROM customer WHERE c_custkey <= 20 ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer) WHERE c.key <= 20
           | RETURN c.key AS ck, to_json(c {.name, double_key: c.key * 2}) AS mp
           | ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- EXISTS{} / COUNT{} subquery blocks (TCK expressions/
    //      existentialSubqueries): per-anchor grouped counts, one left
    //      join — never a per-row subquery ----
    Q("q_cypher_exists_count",
      """SELECT c_custkey AS ck,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)::BIGINT AS n
        |FROM customer
        |WHERE c_custkey <= 30 AND EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY ck""".stripMargin)(
      cy("""MATCH (c:customer)
           | WHERE c.key <= 30 AND EXISTS { (c)-[:placed]->(o:order) WHERE o.name = 'F' }
           | RETURN c.key AS ck, toInteger(COUNT { (c)-[:placed]->(o2:order) }) AS n
           | ORDER BY ck""".stripMargin.replace("\n", ""))),

    // ---- CALL db.labels() — schema introspection procedure (reference
    //      CallStep.java + ProcedureRegistry.java) ----
    Q("q_cypher_call_labels",
      """SELECT label FROM (
        |  SELECT 'customer' AS label UNION ALL SELECT 'order' UNION ALL SELECT 'part')
        |ORDER BY label""".stripMargin)(
      cy("CALL db.labels() YIELD label RETURN label ORDER BY label")),

    // ---- chained CALLs: relationship types × property keys (the second
    //      CALL cross-joins the first's horizon) ----
    Q("q_cypher_call_schema",
      """SELECT relationshipType, pk FROM
        |  (SELECT 'contains' AS relationshipType UNION ALL SELECT 'placed'),
        |  (SELECT 'key' AS pk UNION ALL SELECT 'name' UNION ALL SELECT 'qty')
        |ORDER BY relationshipType, pk""".stripMargin)(
      cy("CALL db.relationshipTypes() YIELD relationshipType " +
        "CALL db.propertyKeys() YIELD propertyKey AS pk " +
        "RETURN relationshipType, pk ORDER BY relationshipType, pk")),

    // ---- CALL algo.pageRank — algo procedure, oracled by the unrolled
    //      recurrence (same graph + recurrence as q_graph_pagerank_small) ----
    Q("q_cypher_call_pagerank", {
      val iters = (1 to 10).map { i =>
        s"""pr$i AS MATERIALIZED (
           |  SELECT v.id, 0.15 + 0.85 * coalesce(s.msum, 0.0) AS rank
           |  FROM pr${i - 1} v LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.rank / d.outdeg) AS msum
           |    FROM e JOIN pr${i - 1} p ON e.src = p.id JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s ON s.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ce AS (
         |  SELECT a.n_nationkey AS a, min(b.n_nationkey) AS b
         |  FROM nation a JOIN nation b
         |    ON a.n_regionkey = b.n_regionkey AND b.n_nationkey > a.n_nationkey
         |  GROUP BY a.n_nationkey),
         |e AS (SELECT a AS src, b AS dst FROM ce UNION ALL SELECT b, a FROM ce),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |pr0 AS (SELECT n_nationkey AS id, CAST(1.0 AS DOUBLE) AS rank FROM nation),
         |$iters
         |SELECT id, round(rank, 6) AS rank FROM pr10 ORDER BY id""".stripMargin
    }) { (s, d) =>
      Cypher.query(nationGraph(s, d),
        "CALL algo.pageRank(10, 0.15) YIELD id, rank " +
          "RETURN id, round(rank, 6) AS rank ORDER BY id")
    }
  )
}
