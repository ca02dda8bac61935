package graft.operators

import graft.Q
import graft.sql.GraftSql

/** End-to-end front-end queries: every Spark side here goes through
  * `GraftSql.query(text)` — lexer → parser → AST → Catalyst — and must
  * match the DuckDB oracle, proving the dialect front-end at the same
  * gate as the hand-built operators (the round-1 verdict's #1 gap).
  */
object SqlOps {

  private def sql(text: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => GraftSql.query(s, d, text)

  val all: Seq[Q] = Seq(

    // ---- the flagship aggregate, but arriving via the parser ----
    Q("q_sql_agg",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(
      sql("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
            | FROM lineitem WHERE l_shipdate < '1998-01-01'
            | GROUP BY l_returnflag, l_linestatus
            | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", ""))),

    // ---- scan + compound predicate + top-k through the parser ----
    Q("q_sql_where_order",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 200000
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)(
      sql("""SELECT o_orderkey, o_totalprice FROM orders
            | WHERE o_orderstatus = 'O' AND o_totalprice > 200000
            | ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin.replace("\n", ""))),

    // ---- method-call surface (SQLMethod chain) ----
    Q("q_sql_methods",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  length(c_name) AS ln,
        |  substring(c_name, 1, 8) AS pre
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin)(
      sql("""SELECT c_custkey, c_name.toUpperCase() AS uname,
            | c_name.length() AS ln, c_name.substring(0, 8) AS pre
            | FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin.replace("\n", ""))),

    // ---- IN / LIKE / SKIP+LIMIT pagination ----
    Q("q_sql_like_in",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_brand IN ('Brand#1', 'Brand#2') AND p_name LIKE '%el%'
        |ORDER BY p_partkey LIMIT 10 OFFSET 5""".stripMargin)(
      sql("""SELECT p_partkey, p_name FROM part
            | WHERE p_brand IN ('Brand#1', 'Brand#2') AND p_name LIKE '%el%'
            | ORDER BY p_partkey SKIP 5 LIMIT 10""".stripMargin.replace("\n", ""))),

    // ---- GROUP BY + HAVING on an aggregate alias ----
    Q("q_sql_having",
      """SELECT o_custkey, count(*) AS n,
        |  sum(o_totalprice::DECIMAL(28,4))::DOUBLE AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) > 8
        |ORDER BY o_custkey""".stripMargin)(
      sql("""SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
            | FROM orders GROUP BY o_custkey HAVING n > 8
            | ORDER BY o_custkey""".stripMargin.replace("\n", ""))),

    // ---- arithmetic projections + BETWEEN + string concat ----
    // ---- DEFINE FUNCTION: SQL-bodied function inlined at compile time ----
    Q("q_sql_define_function",
      """SELECT l_orderkey, l_linenumber,
        |  round((l_extendedprice * (1 - l_discount))::DECIMAL(28,4), 2)::DOUBLE AS net
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, net""".stripMargin) { (s, d) =>
      import graft.sql.{FunctionRegistry, GraftSql}
      val fns = new FunctionRegistry
      GraftSql.execute(graft.schema.TypeCatalog.default,
        "DEFINE FUNCTION net(price, disc) AS price * (1 - disc)", fns)
      GraftSql.query(s, d,
        """SELECT l_orderkey, l_linenumber,
          | round(net(l_extendedprice, l_discount).asDecimal(), 2).asFloat() AS net
          | FROM lineitem WHERE l_orderkey < 100
          | ORDER BY l_orderkey, l_linenumber, net""".stripMargin.replace("\n", ""),
        fns = fns)
    },

    // ---- scalar subquery in WHERE (evaluated once, global-LET style) ----
    Q("q_sql_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (
        |  SELECT (sum(o_totalprice::DECIMAL(28,4)) / count(o_totalprice))::DOUBLE FROM orders)
        |ORDER BY o_orderkey LIMIT 50""".stripMargin)(
      sql("""SELECT o_orderkey, o_totalprice FROM orders
            | WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
            | ORDER BY o_orderkey LIMIT 50""".stripMargin.replace("\n", ""))),

    // ---- LET bindings: subquery binding runs once, expression binding
    //      inlines per record (SelectExecutionPlanner.splitLet) ----
    Q("q_sql_let",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) - 2000
        |ORDER BY c_custkey""".stripMargin)(
      sql("""SELECT c_custkey, c_acctbal FROM customer
            | LET $top = (SELECT max(c_acctbal) FROM customer), $cut = $top - 2000
            | WHERE c_acctbal > $cut
            | ORDER BY c_custkey""".stripMargin.replace("\n", ""))),

    // net goes through a decimal cast before the 2-digit round: Spark
    // rounds doubles on their shortest decimal repr, DuckDB on the binary
    // value — ties like x.745 diverge unless both round an exact decimal
    Q("q_sql_exprs",
      """SELECT l_orderkey, l_linenumber,
        |  round((l_extendedprice * (1 - l_discount))::DECIMAL(28,4), 2)::DOUBLE AS net,
        |  l_returnflag || '/' || l_linestatus AS flags
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, net""".stripMargin)(
      sql("""SELECT l_orderkey, l_linenumber,
            | round((l_extendedprice * (1 - l_discount)).asDecimal(), 2).asFloat() AS net,
            | l_returnflag || '/' || l_linestatus AS flags
            | FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_orderkey < 200
            | ORDER BY l_orderkey, l_linenumber, net""".stripMargin.replace("\n", ""))),

    // ---- breadth of the function registry through the parser: math,
    //      string, crypto, date, collection families in one projection
    //      (DefaultSQLFunctionFactory.java:187 registers ~200 names; these
    //      are the most-used tail mapped to Spark built-ins) ----
    Q("q_sql_funcs_wide",
      """SELECT o_orderkey,
        |  sign(o_totalprice - 150000)::DOUBLE AS sgn,
        |  round(ln(o_orderkey + 1), 6) AS lnv,
        |  round(log10(o_orderkey + 1), 6) AS l10,
        |  round(exp(o_orderkey % 3), 6) AS ex,
        |  round(sin(o_orderkey), 6) AS sn,
        |  round(cos(o_orderkey), 6) AS cs,
        |  round(atan2(o_orderkey, 7), 6) AS at2,
        |  round(degrees(1), 6) AS dg,
        |  round(radians(90), 6) AS rd,
        |  greatest(o_orderkey % 7, 3) AS gr,
        |  least(o_orderkey % 7, 3) AS ls,
        |  upper(o_orderpriority) AS up,
        |  lower(o_orderpriority) AS lo,
        |  reverse(o_orderstatus) AS rv,
        |  lpad(o_orderstatus, 5, '*') AS lp,
        |  rpad(o_orderstatus, 5, '#') AS rp,
        |  repeat(o_orderstatus, 3) AS rep,
        |  instr(o_orderpriority, '-') AS ins,
        |  levenshtein(o_orderpriority, o_orderstatus) AS lev,
        |  starts_with(o_orderpriority, '1') AS sw,
        |  md5(o_orderstatus) AS m5,
        |  sha256(o_orderstatus) AS sh,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  quarter(o_orderdate) AS qt,
        |  isodow(o_orderdate) - 1 AS wd,
        |  week(o_orderdate) AS wk,
        |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS dd,
        |  array_to_string(['a', o_orderstatus], '/') AS aj,
        |  list_contains([1, 2, 3], o_orderkey % 5) AS ac,
        |  list_max([o_orderkey % 10, 5]) AS amx
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin)(
      sql("""SELECT o_orderkey,
            | sign(o_totalprice - 150000) AS sgn,
            | round(ln(o_orderkey + 1), 6) AS lnv,
            | round(log10(o_orderkey + 1), 6) AS l10,
            | round(exp(o_orderkey % 3), 6) AS ex,
            | round(sin(o_orderkey), 6) AS sn,
            | round(cos(o_orderkey), 6) AS cs,
            | round(atan2(o_orderkey, 7), 6) AS at2,
            | round(degrees(1), 6) AS dg,
            | round(radians(90), 6) AS rd,
            | greatest(o_orderkey % 7, 3) AS gr,
            | least(o_orderkey % 7, 3) AS ls,
            | upper(o_orderpriority) AS up,
            | lower(o_orderpriority) AS lo,
            | reverse(o_orderstatus) AS rv,
            | lpad(o_orderstatus, 5, '*') AS lp,
            | rpad(o_orderstatus, 5, '#') AS rp,
            | repeat(o_orderstatus, 3) AS rep,
            | instr(o_orderpriority, '-') AS ins,
            | levenshtein(o_orderpriority, o_orderstatus) AS lev,
            | starts_with(o_orderpriority, '1') AS sw,
            | md5(o_orderstatus) AS m5,
            | sha256(o_orderstatus) AS sh,
            | year(o_orderdate) AS yr,
            | month(o_orderdate) AS mo,
            | quarter(o_orderdate) AS qt,
            | weekday(o_orderdate) AS wd,
            | weekofyear(o_orderdate) AS wk,
            | datediff(o_orderdate, '1995-01-01') AS dd,
            | array_join(['a', o_orderstatus], '/') AS aj,
            | array_contains([1, 2, 3], o_orderkey % 5) AS ac,
            | array_max([o_orderkey % 10, 5]) AS amx
            | FROM orders WHERE o_orderkey < 100
            | ORDER BY o_orderkey""".stripMargin.replace("\n", ""))),

    // ---- registry batch 3: similarity, math/string/date long tail,
    //      the remaining DefaultSQLFunctionFactory names with clean
    //      DuckDB equivalents ----
    // ---- the reference's vector.* SQL-callable family through SQL TEXT
    //      (function/sql/vector/SQLFunctionVector*.java — 24 names here;
    //      query-shaped members are the q_vec_* operators) ----
    Q("q_sql_funcs_vec",
      """SELECT vec_id,
        |  round(list_sum(list_transform(ev, x -> x * x)), 6) AS dp,
        |  round(sqrt(list_sum(list_transform(ev, x -> x * x))), 6) AS mag,
        |  round(list_sum(list_transform(ev, x -> abs(x))), 6) AS l1,
        |  round(list_max(list_transform(ev, x -> abs(x))), 6) AS li,
        |  len(ev) AS dim,
        |  round(list_sum(ev), 6) AS sm,
        |  round(list_sum(ev) / len(ev), 6) AS av,
        |  round(list_min(ev), 6) AS mn,
        |  round(list_max(ev), 6) AS mx,
        |  round(list_sum(list_transform(ev, x -> pow(x - list_sum(ev)/len(ev), 2))) / len(ev), 6) AS vr,
        |  round(sqrt(list_sum(list_transform(ev, x -> pow(x - list_sum(ev)/len(ev), 2))) / len(ev)), 6) AS sd,
        |  false AS nan, false AS inf, false AS nul, true AS isn,
        |  round(sqrt(list_sum(list_transform(ev, x -> pow(least(greatest(x, -0.1), 0.1), 2)))), 6) AS clipmag,
        |  round(len(list_filter(ev, x -> abs(x) < 0.05)) / CAST(len(ev) AS DOUBLE), 6) AS sp,
        |  round(sqrt(list_sum(list_transform(ev, x -> x * x))), 6) AS l2s,
        |  round(2 * list_sum(ev), 6) AS s2,
        |  0.0 AS s0,
        |  round(list_sum(list_transform(ev, x -> x * x)), 6) AS smul,
        |  round(1/61.0 + 1/65.0 + 1/70.0, 6) AS rrf,
        |  0.68 AS hyb, 0.9 AS ms,
        |  round(1.0 / (1.0 + exp(-0.5)), 6) AS st,
        |  true AS dqok, 1.0 AS nmx
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
        |      WHERE vec_id < 30) ORDER BY vec_id""".stripMargin)(
      sql("""SELECT vec_id,
            | round(vector.dotProduct(embedding, embedding), 6) AS dp,
            | round(vector.magnitude(embedding), 6) AS mag,
            | round(vector.l1Norm(embedding), 6) AS l1,
            | round(vector.lInfNorm(embedding), 6) AS li,
            | vector.dimension(embedding) AS dim,
            | round(vector.sum(embedding), 6) AS sm,
            | round(vector.avg(embedding), 6) AS av,
            | round(vector.min(embedding), 6) AS mn,
            | round(vector.max(embedding), 6) AS mx,
            | round(vector.variance(embedding), 6) AS vr,
            | round(vector.stdDev(embedding), 6) AS sd,
            | vector.hasNaN(embedding) AS nan,
            | vector.hasInf(embedding) AS inf,
            | vector.hasNull(embedding) AS nul,
            | vector.isNormalized(vector.normalize(embedding), 0.000001) AS isn,
            | round(vector.magnitude(vector.clip(embedding, -0.1, 0.1)), 6) AS clipmag,
            | round(vector.sparsity(embedding, 0.05), 6) AS sp,
            | round(vector.l2Distance(embedding, vector.scale(embedding, 2.0)), 6) AS l2s,
            | round(vector.sum(vector.add(embedding, embedding)), 6) AS s2,
            | round(vector.sum(vector.subtract(embedding, embedding)), 6) AS s0,
            | round(vector.sum(vector.multiply(embedding, embedding)), 6) AS smul,
            | round(vector.rrfScore([1, 5, 10]), 6) AS rrf,
            | round(vector.hybridScore(0.8, 0.4, 0.7), 6) AS hyb,
            | round(vector.multiScore([0.9, 0.7, 0.8], 'MAX'), 6) AS ms,
            | round(vector.scoreTransform(0.5, 'SIGMOID'), 6) AS st,
            | vector.l2Distance(vector.dequantizeInt8(vector.quantizeInt8(embedding)), embedding) < 0.1 AS dqok,
            | round(vector.max(vector.normalizeScores(embedding)), 6) AS nmx
            | FROM embeddings WHERE vec_id < 30
            | ORDER BY vec_id""".stripMargin.replace("\n", ""))),

    Q("q_sql_funcs_tail",
      """SELECT o_orderkey AS k,
        |  round(exp(o_orderkey % 5) - 1, 6) AS e1,
        |  round(ln(1 + o_orderkey), 6) AS l1,
        |  round(sqrt(pow(o_orderkey % 10, 2) + 9), 6) AS hy,
        |  CASE WHEN o_orderstatus < 'O' THEN -1 WHEN o_orderstatus = 'O' THEN 0 ELSE 1 END AS sc,
        |  translate(o_orderpriority, '-', '_') AS tr,
        |  split_part(o_orderpriority, '-', 1) AS si,
        |  bin(o_orderkey % 16) AS bn,
        |  CAST(octet_length(o_orderstatus::BLOB) AS BIGINT) AS ol,
        |  CAST(bit_length(o_orderstatus) AS BIGINT) AS bl,
        |  CAST(hamming(o_orderstatus, 'O') AS BIGINT) AS hm,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)::VARCHAR AS am,
        |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ut
        |FROM orders WHERE o_orderkey < 200 ORDER BY k""".stripMargin)(
      sql("""SELECT o_orderkey AS k,
            | round(expm1(o_orderkey % 5), 6) AS e1,
            | round(log1p(o_orderkey), 6) AS l1,
            | round(hypot(o_orderkey % 10, 3), 6) AS hy,
            | strcmp(o_orderstatus, 'O') AS sc,
            | translate(o_orderpriority, '-', '_') AS tr,
            | substring_index(o_orderpriority, '-', 1) AS si,
            | bin(o_orderkey % 16) AS bn,
            | octet_length(o_orderstatus).asInteger() AS ol,
            | bit_length(o_orderstatus).asInteger() AS bl,
            | hamming(o_orderstatus, 'O').asInteger() AS hm,
            | add_months(o_orderdate, 2).asString() AS am,
            | unix_timestamp(o_orderdate) AS ut
            | FROM orders WHERE o_orderkey < 200
            | ORDER BY k""".stripMargin.replace("\n", ""))),

    // ---- the SQL dialect's own MATCH statement (MatchExecutionPlanner),
    //      compiled onto the shared Cypher pattern backend ----
    Q("q_sql_match",
      """SELECT c_custkey, count(DISTINCT l_partkey) AS n_parts
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_custkey <= 50 GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      graft.sql.Match.query(graft.graph.PropertyGraph.fromTpch(s, d),
        """MATCH {type: customer, as: c, where: (key <= 50)}
          | -placed->{type: order, as: o}
          | .out('contains'){type: part, as: p}
          | RETURN c.key AS c_custkey, count(DISTINCT p.key) AS n_parts
          | ORDER BY c_custkey""".stripMargin.replace("\n", ""))
    },

    // ---- MATCH while/maxDepth depth-window traversal + optional chain
    //      (MatchStatementExecutionTest testWhile/maxDepth/optional):
    //      maxDepth:1 spans depth 0 (the customer itself) and depth 1
    //      (its orders); where:($depth=1) pins the window to the orders ----
    Q("q_sql_match_depth",
      """SELECT k FROM (
        |  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey <= 3
        |  UNION ALL
        |  SELECT o_orderkey AS k FROM orders WHERE o_custkey <= 3)
        |ORDER BY k""".stripMargin) { (s, d) =>
      graft.sql.Match.query(graft.graph.PropertyGraph.fromTpch(s, d),
        "MATCH {type: customer, as: c, where: (key <= 3)}" +
          ".out('placed'){as: x, maxDepth: 1} RETURN x.key AS k ORDER BY k")
    },
    Q("q_sql_match_optional",
      """SELECT c_custkey AS k, CAST(NULL AS BIGINT) AS bk
        |FROM customer WHERE c_custkey < 10 ORDER BY k""".stripMargin) { (s, d) =>
      graft.sql.Match.query(graft.graph.PropertyGraph.fromTpch(s, d),
        "MATCH {type: customer, as: c, where: (key < 10)} -nonexisting-> " +
          "{as: b, optional: true} RETURN c.key AS k, b.key AS bk ORDER BY k")
    },

    // ---- NOT pattern (negativePattern): anti-join over bound aliases ----
    Q("q_sql_match_not",
      """SELECT c_custkey AS k, o_orderkey AS ok
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_custkey < 30
        |  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY k, ok""".stripMargin) { (s, d) =>
      // r11: traversal view — the pattern tests pure connectivity (an
      // anti-join on edge existence), so the qty aggregation barrier
      // fromTpch pays over lineitem buys nothing here
      graft.sql.Match.query(graft.graph.PropertyGraph.fromTpchTraversal(s, d),
        "MATCH {type: customer, as: c, where: (key < 30)} --> {as: o}, " +
          "NOT {as: o} --> {as: x} RETURN c.key AS k, o.key AS ok ORDER BY k, ok")
    },

    // ---- RETURN $pathElements: one row per distinct element on any
    //      matched path (returnPathElements) ----
    Q("q_sql_match_pathelements",
      """SELECT label, key FROM (
        |  SELECT 'customer' AS label, CAST(c_custkey AS BIGINT) AS key
        |  FROM customer WHERE c_custkey = 1 AND EXISTS (
        |    SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |    WHERE o_custkey = 1 AND l_partkey < 100)
        |  UNION
        |  SELECT 'order' AS label, o_orderkey AS key FROM orders
        |  WHERE o_custkey = 1 AND EXISTS (
        |    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_partkey < 100)
        |  UNION
        |  SELECT 'part' AS label, l_partkey AS key
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_custkey = 1 AND l_partkey < 100)
        |ORDER BY label, key""".stripMargin) { (s, d) =>
      // r11: traversal view — $pathElements dedups elements, so raw
      // (order, part) connectivity rows give the identical result without
      // fromTpch's per-(order, part) aggregation barrier
      graft.sql.Match.query(graft.graph.PropertyGraph.fromTpchTraversal(s, d),
        "MATCH {type: customer, where: (key = 1)}.out('placed'){as: o}" +
          ".out('contains'){type: part, where: (key < 100)} RETURN $pathElements")
        .select("label", "key").orderBy("label", "key")
    },

    // ---- derived-table FROM (SELECT …) (FetchFromResultsetStep) ----
    Q("q_sql_from_subquery",
      """SELECT o_orderstatus, count(*) AS n FROM (
        |  SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)(
      sql("""SELECT o_orderstatus, count(*) AS n FROM (
            |  SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000)
            | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replace("\n", ""))),

    // ---- CASE expressions: searched and simple forms (openCypher
    //      caseExpression; superset on the SQL side) ----
    Q("q_sql_case",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS band,
        |  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
        |       ELSE 'other' END AS st
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)(
      sql("""SELECT o_orderkey,
            | CASE WHEN o_totalprice > 300000 THEN 'high'
            |      WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS band,
            | CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
            |      ELSE 'other' END AS st
            | FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin.replace("\n", ""))),

    // ---- CUBE: multi-dimensional aggregate in one Expand pass (free
    //      Spark capability; the reference grammar has only plain
    //      GROUP BY — SQLParser.g4:1262, SURVEY.md §2.4) ----
    Q("q_sql_cube",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_orderkey < 1000
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(
      sql("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
            | FROM lineitem WHERE l_orderkey < 1000
            | GROUP BY CUBE (l_returnflag, l_linestatus)
            | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", ""))),

    // ---- GROUPING SETS: explicit set list, including the grand total ----
    Q("q_sql_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders WHERE o_orderkey < 2000
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)(
      sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
            | FROM orders WHERE o_orderkey < 2000
            | GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            | ORDER BY o_orderstatus, o_orderpriority""".stripMargin.replace("\n", ""))),

    // ---- second function-registry batch: hyperbolics, string/date tail,
    //      conditional nvl/nvl2, two-arg log ----
    Q("q_sql_funcs_more",
      """SELECT o_orderkey,
        |  round((exp(o_orderkey % 5) - exp(-(o_orderkey % 5))) / 2, 6) AS sh,
        |  round((exp(o_orderkey % 5) + exp(-(o_orderkey % 5))) / 2, 6) AS ch,
        |  round((exp(o_orderkey % 5) - exp(-(o_orderkey % 5)))
        |      / (exp(o_orderkey % 5) + exp(-(o_orderkey % 5))), 6) AS th,
        |  round(cos(o_orderkey + 1) / sin(o_orderkey + 1), 6) AS ct,
        |  round(log(2, o_orderkey + 1), 6) AS lg2,
        |  factorial((o_orderkey % 6)::INTEGER)::BIGINT AS fct,
        |  bit_count(o_orderkey) AS bc,
        |  mod(o_orderkey, 7) AS md,
        |  chr((65 + o_orderkey % 26)::INTEGER) AS ch1,
        |  left(o_orderpriority, 3) AS lf,
        |  right(o_orderpriority, 4) AS rt,
        |  replace(o_orderpriority, '-', '_') AS rp,
        |  strpos(o_orderpriority, '-') AS sp,
        |  last_day(o_orderdate::DATE)::VARCHAR AS ld,
        |  make_date(2020, 1 + o_orderkey % 12, 1)::VARCHAR AS mkd,
        |  date_part('year', o_orderdate) AS dp,
        |  coalesce(NULL, o_orderkey) AS nv,
        |  CASE WHEN o_orderstatus IS NOT NULL THEN 'has' ELSE 'none' END AS nv2
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin)(
      sql("""SELECT o_orderkey,
            | round(sinh(o_orderkey % 5), 6) AS sh,
            | round(cosh(o_orderkey % 5), 6) AS ch,
            | round(tanh(o_orderkey % 5), 6) AS th,
            | round(cot(o_orderkey + 1), 6) AS ct,
            | round(log(2, o_orderkey + 1), 6) AS lg2,
            | factorial(o_orderkey % 6) AS fct,
            | bit_count(o_orderkey) AS bc,
            | mod(o_orderkey, 7) AS md,
            | chr(65 + o_orderkey % 26) AS ch1,
            | left(o_orderpriority, 3) AS lf,
            | right(o_orderpriority, 4) AS rt,
            | replace(o_orderpriority, '-', '_') AS rp,
            | strpos(o_orderpriority, '-') AS sp,
            | last_day(o_orderdate.asDate()).asString() AS ld,
            | make_date(2020, 1 + o_orderkey % 12, 1).asString() AS mkd,
            | date_part('year', o_orderdate) AS dp,
            | nvl(NULL, o_orderkey) AS nv,
            | nvl2(o_orderstatus, 'has', 'none') AS nv2
            | FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin.replace("\n", ""))),

    // ---- new aggregate registry batch over a grouped scan ----
    Q("q_sql_agg_more",
      """SELECT o_orderstatus,
        |  count_if(o_totalprice > 150000)::BIGINT AS nbig,
        |  round(corr(o_totalprice, o_orderkey), 6) AS cr,
        |  round(covar_pop(o_totalprice, o_custkey), 6) AS cvp,
        |  bit_and(o_orderkey % 16) AS ba,
        |  bit_or(o_orderkey % 16) AS bo,
        |  bit_xor(o_orderkey % 16) AS bx,
        |  bool_and(o_totalprice > 0) AS ball,
        |  bool_or(o_totalprice > 400000) AS bany,
        |  string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS sa
        |FROM orders WHERE o_orderkey < 1000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)(
      sql("""SELECT o_orderstatus,
            | count_if(o_totalprice > 150000) AS nbig,
            | round(corr(o_totalprice, o_orderkey), 6) AS cr,
            | round(covar_pop(o_totalprice, o_custkey), 6) AS cvp,
            | bit_and(o_orderkey % 16) AS ba,
            | bit_or(o_orderkey % 16) AS bo,
            | bit_xor(o_orderkey % 16) AS bx,
            | bool_and(o_totalprice > 0) AS ball,
            | bool_or(o_totalprice > 400000) AS bany,
            | string_agg_distinct(o_orderpriority, '|') AS sa
            | FROM orders WHERE o_orderkey < 1000
            | GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replace("\n", ""))),

    // ---- nested projections `expr:{f1, f2}` / `expr:{*, !f}` over
    //      embedded documents (NestedProjection.java), emitted as JSON so
    //      the struct shape is hash-comparable across engines ----
    Q("q_sql_nested_projection",
      """SELECT doc_id,
        |  to_json({'lang': lang, 'nc': n_chars})::VARCHAR AS m,
        |  to_json({'lang': lang, 'src': source})::VARCHAR AS pub
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)(
      sql("""SELECT doc_id, to_json(meta:{lang, nc}) AS m, to_json(info:{*, !secret}) AS pub
            | FROM documents
            | LET meta = {'lang': lang, 'nc': n_chars, 'src': source},
            |     info = {'lang': lang, 'secret': doc_id, 'src': source}
            | WHERE doc_id < 50 ORDER BY doc_id""".stripMargin.replace("\n", ""))),

    // ---- TRAVERSE statement (grammar SQLParser.g4:220-229, executor
    //      BreadthFirstTraverseStep.java:34): BFS frontier loop from the
    //      seed set, min reach depth per vertex; out() with no edge type
    //      follows every edge label ----
    Q("q_sql_traverse",
      """SELECT key, label, depth FROM (
        |  SELECT c_custkey AS key, 'customer' AS label, 0 AS depth
        |  FROM customer WHERE c_custkey <= 3
        |  UNION ALL
        |  SELECT o_orderkey, 'order', 1 FROM orders WHERE o_custkey <= 3
        |  UNION ALL
        |  SELECT DISTINCT l_partkey, 'part', 2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey <= 3)
        |ORDER BY depth, label, key""".stripMargin) { (s, d) =>
      graft.sql.Traverse.query(graft.graph.PropertyGraph.fromTpchTraversal(s, d),
        "TRAVERSE out() FROM customer WHERE key <= 3 MAXDEPTH 2")
    },

    // ---- STRATEGY DEPTH_FIRST + WHILE bound + FROM (subquery): same
    //      visited set as BFS (order is the strategies' only observable
    //      difference, pinned in SqlFrontendSpec) ----
    Q("q_sql_traverse_dfs",
      """SELECT key, label, depth FROM (
        |  SELECT c_custkey AS key, 'customer' AS label, 0 AS depth
        |  FROM customer WHERE c_custkey <= 3
        |  UNION ALL
        |  SELECT o_orderkey, 'order', 1 FROM orders WHERE o_custkey <= 3)
        |ORDER BY depth, key""".stripMargin) { (s, d) =>
      graft.sql.Traverse.query(graft.graph.PropertyGraph.fromTpchTraversal(s, d),
        "TRAVERSE out() FROM (SELECT FROM customer WHERE key <= 3) " +
          "WHILE $depth < 2 STRATEGY DEPTH_FIRST")
    },

    // ---- INSERT INTO … VALUES through the parser (InsertExecutionPlanner)
    //      — result is the post-insert table state re-read via the dialect ----
    Q("q_sql_insert",
      """SELECT n_nationkey, n_name, n_regionkey FROM (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  UNION ALL SELECT 90, 'GRAFTLAND', 1
        |  UNION ALL SELECT 91, 'DUCKLAND', 2)
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val cat = writable(s, d, graft.Tables.nation(s, d), "nation_w", "sql_ins")
      GraftSql.statement(s, d,
        "INSERT INTO nation_w (n_nationkey, n_name, n_regionkey) " +
          "VALUES (90, 'GRAFTLAND', 1), (91, 'DUCKLAND', 2)", cat)
      GraftSql.query(s, d,
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_w ORDER BY n_nationkey", cat)
    },

    // ---- UPDATE … SET … UPSERT WHERE (UpsertStep: hit → update,
    //      miss → insert the key-carrying record) ----
    Q("q_sql_update_upsert",
      """SELECT n_nationkey, n_name, n_regionkey FROM (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey <> 7
        |  UNION ALL
        |  SELECT 7, 'KINGDOM OF GRAFT', n_regionkey FROM nation WHERE n_nationkey = 7
        |  UNION ALL
        |  SELECT 98, 'DUCKLANDIA', NULL)
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val cat = writable(s, d, graft.Tables.nation(s, d), "nation_u", "sql_ups")
      GraftSql.statement(s, d,
        "UPDATE nation_u SET n_name = 'KINGDOM OF GRAFT' UPSERT WHERE n_nationkey = 7", cat)
      GraftSql.statement(s, d,
        "UPDATE nation_u SET n_name = 'DUCKLANDIA' UPSERT WHERE n_nationkey = 98", cat)
      GraftSql.query(s, d,
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_u ORDER BY n_nationkey", cat)
    },

    // ---- UPDATE … RETURN AFTER WHERE (post-images, not the state) ----
    Q("q_sql_update_returning",
      """SELECT o_orderkey, round((o_totalprice * 0.95)::DECIMAL(28,4), 2)::DOUBLE AS o_totalprice
        |FROM orders WHERE o_orderkey < 300 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.col
      val src = graft.Tables.orders(s, d).filter(col("o_orderkey") < 300)
      val cat = writable(s, d, src, "orders_r", "sql_upd_ret")
      GraftSql.statement(s, d,
        "UPDATE orders_r SET o_totalprice = round((o_totalprice * 0.95).asDecimal(), 2).asFloat() " +
          "RETURN AFTER WHERE o_orderkey < 300 AND o_orderstatus = 'O'", cat)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ---- script control flow: LET / FOREACH / IF / RETURN orchestrating
    //      DML batches (ScriptExecutionPlan; grammar SQLParser.g4:1004) ----
    // ---- transactions: BEGIN / COMMIT / ROLLBACK in a script (reference
    //      BeginStatement / CommitStatement / RollbackStatement +
    //      TransactionContext): the rolled-back mutations leave no trace,
    //      the committed one persists ----
    Q("q_sql_transaction",
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey = 0 THEN 'COMMITTED' ELSE n_name END AS n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val cat = writable(s, d, graft.Tables.nation(s, d), "nation_t", "sql_tx")
      graft.sql.Script.run(s, d,
        """BEGIN;
          |DELETE FROM nation_t WHERE n_nationkey >= 10;
          |UPDATE nation_t SET n_name = 'DOOMED' WHERE n_nationkey < 10;
          |ROLLBACK;
          |BEGIN;
          |UPDATE nation_t SET n_name = 'COMMITTED' WHERE n_nationkey = 0;
          |COMMIT;
          |RETURN SELECT n_nationkey, n_name FROM nation_t ORDER BY n_nationkey
          |""".stripMargin, cat)
    },

    Q("q_sql_script",
      """WITH cut AS (SELECT max(o_totalprice) AS c FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_totalprice > c * 0.9 THEN o_orderstatus
        |       ELSE o_orderpriority END AS o_orderpriority,
        |  o_totalprice
        |FROM orders, cut
        |WHERE o_orderkey < 500 AND NOT (o_totalprice < c * 0.05)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.col
      val src = graft.Tables.orders(s, d).filter(col("o_orderkey") < 500)
      val cat = writable(s, d, src, "orders_s", "sql_script")
      graft.sql.Script.run(s, d,
        """LET $cut = (SELECT max(o_totalprice) FROM orders);
          |FOREACH ($st IN ['F', 'O', 'P']) {
          |  UPDATE orders_s SET o_orderpriority = $st
          |    WHERE o_orderstatus = $st AND o_totalprice > $cut * 0.9;
          |}
          |IF ($cut > 0) {
          |  DELETE FROM orders_s WHERE o_totalprice < $cut * 0.05;
          |}
          |RETURN SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
          |  FROM orders_s ORDER BY o_orderkey""".stripMargin, cat)
    },

    // ---- WHILE loop + statement-valued LET in a script (reference
    //      WhileBlockExecutionTest / Issue4915Test): the loop inserts one
    //      row per iteration off a LET counter, and a LET binds an INSERT's
    //      result set ----
    Q("q_sql_while",
      """SELECT n_nationkey + 100 AS k, n_nationkey * 2 AS v
        |FROM nation WHERE n_nationkey < 4
        |UNION ALL SELECT 999, 0
        |ORDER BY k""".stripMargin) { (s, d) =>
      val cat = writable(s, d,
        graft.Tables.nation(s, d).limit(0)
          .selectExpr("n_nationkey + 100 AS k", "n_nationkey * 2 AS v"),
        "while_t", "sql_while")
      graft.sql.Script.run(s, d,
        """LET $i = 0;
          |WHILE ($i < 4) {
          |  INSERT INTO while_t SET k = $i + 100, v = $i * 2;
          |  LET $i = $i + 1;
          |}
          |LET $ins = INSERT INTO while_t SET k = 999, v = 0;
          |RETURN SELECT k, v FROM while_t ORDER BY k""".stripMargin, cat)
    },

    // ---- DELETE FROM … WHERE through the parser (DeleteExecutionPlanner) ----
    Q("q_sql_delete",
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 600 AND NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.col
      val src = graft.Tables.orders(s, d).filter(col("o_orderkey") < 600)
      val cat = writable(s, d, src, "orders_w", "sql_del")
      GraftSql.statement(s, d,
        "DELETE FROM orders_w WHERE o_orderstatus = 'F' AND o_totalprice < 100000", cat)
      GraftSql.query(s, d,
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_w ORDER BY o_orderkey", cat)
    }
  )

  /** Register a writable state-dir copy of `source` as catalog type
    * `typeName` (the DML statements' mutation target — the sf tables
    * themselves are read-only). */
  private def writable(s: org.apache.spark.sql.SparkSession, d: String,
      source: org.apache.spark.sql.DataFrame, typeName: String, q: String): graft.schema.TypeCatalog = {
    val state = s"/tmp/graft_state/${q}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.sources.MutableTable.copyOf(s, source, state)
    val cat = graft.schema.TypeCatalog.fresh()
    cat.createType(typeName, "DOCUMENT", path = Some(_ => state))
    cat
  }
}
