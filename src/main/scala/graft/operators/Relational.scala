package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational core: scans, filters, projections, hash/sort aggregation,
  * joins (link-dereference, semi, anti, cross), sorts/top-k, set ops,
  * unwind, scalar function surface.
  *
  * Reference semantics being re-expressed (see SURVEY.md §2):
  *   - FetchFromTypeExecutionStep / ScanWithFilterStep
  *     (query/sql/executor/FetchFromTypeExecutionStep.java:42,
  *     ScanWithFilterStep.java:43) → parquet scan with Catalyst-pushed
  *     filters and pruned columns.
  *   - AggregateProjectionCalculationStep
  *     (executor/AggregateProjectionCalculationStep.java:35) → Tungsten
  *     hash aggregate, partial+final split for free.
  *   - Link dereference / MATCH joins (executor/ExpandStep.java:36,
  *     MatchExecutionPlanner.java:59) → equi-joins; small dimension sides
  *     are broadcast so the fact side never shuffles.
  *   - OrderByStep top-k compaction (executor/OrderByStep.java:128-136) →
  *     orderBy().limit(k) = Spark TakeOrderedAndProject.
  *   - DistinctExecutionStep / UnionStep / SQLFunctionIntersect etc →
  *     distinct / union / intersect / except.
  *   - UnwindStep (executor/UnwindStep.java:33) → explode().
  *
  * Scale notes (100 TB): every query here is a single declarative plan —
  * filters/projections reach the parquet scan (PushedFilters/ReadSchema),
  * dimension joins are broadcast (no fact shuffle), aggregations are
  * map-side partial, top-k never materializes a full sort.
  */
object Relational {

  /** Exact, order-independent sum of a money/quantity double column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)
  /** Exact product-of-two-money-columns sum (decimal mult is exact). */
  private def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4))).cast(DoubleType)

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  val all: Seq[Q] = Seq(

    // ---- aggregation spine (TPC-H Q1 shape: scan→filter→hash-agg→sort) ----
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE AS sum_qty,
        |  sum(l_extendedprice::DECIMAL(28,4))::DOUBLE AS sum_base_price,
        |  sum(l_extendedprice::DECIMAL(18,4) * (1 - l_discount)::DECIMAL(18,4))::DOUBLE AS sum_disc_price,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- scan + filter + projection (pushdown-verified shape) ----
    Q("q_scan_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_discount > 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      li(s, d)
        .filter(col("l_shipdate").between(to_timestamp(lit("1996-01-01")), to_timestamp(lit("1996-12-31")))
          && col("l_discount") > 0.05 && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- point lookups by key list (FetchFromRidsStep analog) ----
    Q("q_point_lookup",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey IN (1, 7, 32, 100, 999)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      li(s, d)
        .filter(col("l_orderkey").isin(1, 7, 32, 100, 999))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- top-k (OrderByStep heap compaction → TakeOrderedAndProject) ----
    Q("q_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, d) =>
      li(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },

    // ---- OFFSET / LIMIT (SkipExecutionStep / LimitExecutionStep) ----
    Q("q_skip_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 5 OFFSET 10""".stripMargin) { (s, d) =>
      ord(s, d).select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(10).limit(5)
    },

    // ---- DISTINCT (DistinctExecutionStep) ----
    Q("q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      li(s, d).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- count(*) / min-max fast paths (CountFromTypeStep, MaxMinFromIndexStep) ----
    Q("q_count_minmax",
      """SELECT count(*) AS cnt, strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
        |       strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship FROM lineitem""".stripMargin) { (s, d) =>
      li(s, d).agg(
        count(lit(1)).as("cnt"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
    },

    // ---- link dereference join (ExpandStep / RID FK): orders -> customer ----
    Q("q_join_link",
      """SELECT c_mktsegment,
        |  sum(o_totalprice::DECIMAL(28,4))::DOUBLE AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      ord(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // ---- 3-way MATCH-chain style join with selective dims broadcast ----
    Q("q_join_chain",
      """SELECT n_name,
        |  sum(l_extendedprice::DECIMAL(18,4) * (1 - l_discount)::DECIMAL(18,4))::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      li(s, d)
        .join(ord(s, d).filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- semi join (IN subquery / ExpandInto existence check) ----
    Q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      cust(s, d)
        .join(ord(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ---- anti join (AntiJoinChainOp / NOT EXISTS pattern) ----
    Q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ---- cartesian product (CartesianProductStep) ----
    Q("q_cross",
      """SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
        |ORDER BY r1, r2""".stripMargin) { (s, d) =>
      val r = Tables.region(s, d)
      r.select(col("r_name").as("r1"))
        .crossJoin(r.select(col("r_name").as("r2")))
        .orderBy("r1", "r2")
    },

    // ---- theta self-join (cross + filter, same strategy as reference) ----
    Q("q_self_join",
      """SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a
        |JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
        |ORDER BY n1, n2""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d)
      val a = n.select(col("n_name").as("n1"), col("n_regionkey").as("rk1"))
      val b = n.select(col("n_name").as("n2"), col("n_regionkey").as("rk2"))
      a.join(b, col("rk1") === col("rk2") && col("n1") < col("n2"))
        .select("n1", "n2").orderBy("n1", "n2")
    },

    // ---- UNION (UnionStep + distinct) across two typed sources ----
    Q("q_union",
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 9000
        |ORDER BY k""".stripMargin) { (s, d) =>
      cust(s, d).filter(col("c_acctbal") > 9000).select(col("c_custkey").as("k"))
        .union(Tables.supplier(s, d).filter(col("s_acctbal") > 9000).select(col("s_suppkey").as("k")))
        .distinct().orderBy("k")
    },

    // ---- INTERSECT / EXCEPT (SQLFunctionIntersect / Difference) ----
    Q("q_intersect",
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |INTERSECT SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin) { (s, d) =>
      cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
        .intersect(ord(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    Q("q_except",
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |EXCEPT SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin) { (s, d) =>
      cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
        .except(ord(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    // ---- UNWIND / expand (UnwindStep → explode generator) ----
    Q("q_unwind",
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 20)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 20)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50)
    },

    // ---- GROUP BY + HAVING ----
    Q("q_having",
      """SELECT o_custkey, count(*) AS n_orders,
        |  sum(o_totalprice::DECIMAL(28,4))::DOUBLE AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 20
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      ord(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n_orders") >= 20)
        .orderBy("o_custkey")
    },

    // ---- statistical aggregates (median/percentile/stddev/variance/mode) ----
    Q("q_agg_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  median(l_quantity) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          median(col("l_quantity")).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9D)"), 4).as("p90_qty"))
        .orderBy("l_returnflag")
    },

    // ---- deterministic mode (smallest most-frequent value; reference
    //      SQLFunctionMode with a defined tie-break) ----
    Q("q_agg_mode",
      """SELECT l_quantity AS mode_qty, n FROM (
        |  SELECT l_quantity, count(*) AS n FROM lineitem GROUP BY l_quantity)
        |ORDER BY n DESC, l_quantity LIMIT 1""".stripMargin) { (s, d) =>
      li(s, d).groupBy(col("l_quantity")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l_quantity")).limit(1)
        .select(col("l_quantity").as("mode_qty"), col("n"))
    },

    // ---- collection aggregates (SQLFunctionSet/List → collect_set) ----
    Q("q_agg_collect",
      """SELECT l_returnflag,
        |  (SELECT string_agg(x, ',' ORDER BY x)
        |   FROM (SELECT DISTINCT l_linestatus AS x FROM lineitem i
        |         WHERE i.l_returnflag = o.l_returnflag)) AS statuses
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) o
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"))
        .orderBy("l_returnflag")
    },

    // ---- CASE / coalesce / nullif scalar surface ----
    Q("q_case_expr",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      ord(s, d).filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"))
        .orderBy("o_orderkey")
    },

    // ---- string function surface (method/string/* analogs) ----
    Q("q_string_funcs",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 12) AS name12,
        |  length(p_name) AS name_len,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  replace(p_type, ' ', '_') AS type_u,
        |  levenshtein(p_brand, 'Brand#33') AS lev
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 12).as("name12"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"),
          levenshtein(col("p_brand"), lit("Brand#33")).as("lev"))
        .orderBy("p_partkey")
    },

    // ---- date function surface (function/date/* analogs) ----
    Q("q_date_funcs",
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        |  count(*) AS n, sum(o_totalprice::DECIMAL(28,4))::DOUBLE AS total
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY month""".stripMargin) { (s, d) =>
      ord(s, d).filter(year(col("o_orderdate")) === 1997)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("month")
    },

    // ---- math function surface (function/math/* analogs) ----
    // Parity notes (r1 hash-fail fix): the driver hashes values after a
    // column sort, so REPRESENTATION must match, not just value — DuckDB
    // floor() returns DOUBLE while Spark returns LONG (cast oracle to
    // BIGINT), and power() goes through libm on both engines (replaced
    // with an exact single multiply on both sides).
    Q("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  abs(l_discount - 0.05) AS ad,
        |  floor(l_quantity / 7)::BIGINT AS fl,
        |  (l_tax + 1) * (l_tax + 1) AS pw
        |FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      li(s, d).filter(col("l_orderkey") <= 40)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          abs(col("l_discount") - 0.05).as("ad"),
          floor(col("l_quantity") / 7).as("fl"),
          ((col("l_tax") + 1) * (col("l_tax") + 1)).as("pw"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- JSON extraction (SQLMethodAsJSON / from_json surface) ----
    Q("q_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS kmod,
        |  count(*) AS n FROM events
        |GROUP BY 1 ORDER BY kmod""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).as("kmod"))
        .agg(count(lit(1)).as("n"))
        .orderBy("kmod")
    },

    // ---- ROLLUP (free Spark capability beyond the reference's GROUP BY) ----
    Q("q_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(28,4))::DOUBLE AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      li(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- correlated scalar subquery (SubQueryStep / LET analog) ----
    Q("q_subquery_scalar",
      """SELECT c_mktsegment, count(*) AS n_above FROM customer
        |WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(28,4))::DOUBLE / count(*) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val c = cust(s, d)
      val avgBal = c.agg((dsum(col("c_acctbal")) / count(lit(1))).as("a"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("a"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_above"))
        .orderBy("c_mktsegment")
    }
  )
}
