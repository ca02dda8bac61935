package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Predicate surface, array selectors, map functions, defaults, and text
  * similarity — the §2.2/§2.9 long tail the round-1 verdict flagged as
  * implemented-but-unverified or missing.
  *
  * Reference anchors: predicate grammar SQLParser.g4:1236-1248 (LIKE,
  * ILIKE, MATCHES, CONTAINS, CONTAINSALL, CONTAINSANY), array selectors
  * g4:1389,1452-1455 ([n], [n..m], [WHERE]), map functions
  * function/map/Map*.java, ApplyDefaultsStep.java, text similarity
  * function/text/TextJaroWinklerDistance.java / TextHammingDistance.java /
  * TextSorensenDiceSimilarity.java / TextSlug.java / TextSnakeCase.java.
  *
  * All are per-row expressions or one grouped collect — narrow, shuffle-
  * free (or single-shuffle) at any scale.
  */
object MiscOps {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(28, 4))).cast(DoubleType)

  /** Per-order sorted array of distinct part keys (the collection the
    * selector/predicate queries operate on). */
  private def orderParts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("l"))

  private val OrderPartsSql =
    """op AS (
      |  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS l
      |  FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- LIKE / ILIKE / MATCHES predicates ----
    Q("q_pred_like",
      """SELECT p_partkey,
        |  p_name LIKE '%el%' AS has_el,
        |  p_type ILIKE '%BRASS%' AS is_brass,
        |  regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_ok
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 200)
        .select(col("p_partkey"),
          col("p_name").like("%el%").as("has_el"),
          col("p_type").ilike("%BRASS%").as("is_brass"),
          col("p_brand").rlike("^Brand#[0-9]+$").as("brand_ok"))
        .orderBy("p_partkey")
    },

    // ---- CONTAINS / CONTAINSALL / CONTAINSANY over collections ----
    Q("q_pred_contains",
      s"""WITH $OrderPartsSql
         |SELECT l_orderkey,
         |  list_contains(l, 10) AS has_10,
         |  list_has_all(l, [10, 20]) AS has_all,
         |  list_has_any(l, [10, 20, 30]) AS has_any,
         |  len(l) AS n
         |FROM op ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      orderParts(s, d)
        .select(col("l_orderkey"),
          array_contains(col("l"), 10L).as("has_10"),
          expr("forall(array(10L, 20L), x -> array_contains(l, x))").as("has_all"),
          expr("exists(array(10L, 20L, 30L), x -> array_contains(l, x))").as("has_any"),
          size(col("l")).as("n"))
        .orderBy("l_orderkey")
    },

    // ---- array selectors [n], [n..m], [WHERE cond] ----
    // (array outputs serialized to csv strings — engine-portable compare)
    Q("q_array_selectors",
      s"""WITH $OrderPartsSql
         |SELECT l_orderkey,
         |  l[1] AS first_part,
         |  coalesce(array_to_string(l[2:4], ','), '') AS mid_parts,
         |  coalesce(array_to_string(list_filter(l, x -> x > 500), ','), '') AS big_parts
         |FROM op ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      orderParts(s, d)
        .select(col("l_orderkey"),
          element_at(col("l"), 1).as("first_part"),
          array_join(slice(col("l"), 2, 3), ",").as("mid_parts"),
          array_join(filter(col("l"), _ > 500), ",").as("big_parts"))
        .orderBy("l_orderkey")
    },

    // ---- map build / extract / keys (function/map surface) ----
    Q("q_map_funcs",
      """WITH lq AS (
        |  SELECT l_orderkey, l_linenumber,
        |    sum(l_quantity::DECIMAL(28,4))::DOUBLE AS qty
        |  FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2),
        |m AS (
        |  SELECT l_orderkey,
        |    map_from_entries(list(struct_pack(k := l_linenumber, v := qty)
        |      ORDER BY l_linenumber)) AS qmap
        |  FROM lq GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  map_extract(qmap, 1)[1] AS qty_line1,
        |  cardinality(qmap) AS n_lines,
        |  list_max(map_keys(qmap)) AS max_line
        |FROM m ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      val lq = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(dsum(col("l_quantity")).as("qty"))
      lq.groupBy(col("l_orderkey"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("l_linenumber").as("k"), col("qty").as("v")))))
          .as("qmap"))
        .select(col("l_orderkey"),
          element_at(col("qmap"), 1).as("qty_line1"),
          size(col("qmap")).as("n_lines"),
          array_max(map_keys(col("qmap"))).as("max_line"))
        .orderBy("l_orderkey")
    },

    // ---- ApplyDefaults: fill declared defaults over nulls ----
    Q("q_apply_defaults",
      """SELECT o_orderkey,
        |  nullif(o_orderpriority, '1-URGENT') AS priority_raw,
        |  coalesce(nullif(o_orderpriority, '1-URGENT'), 'DEFAULT') AS priority
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 300)
        .withColumn("priority_raw", nullif(col("o_orderpriority"), lit("1-URGENT")))
        .withColumn("priority", coalesce(col("priority_raw"), lit("DEFAULT")))
        .select("o_orderkey", "priority_raw", "priority")
        .orderBy("o_orderkey")
    },

    // ---- collection set ops: unionall / intersect / difference
    //      (function/sql/coll/SQLFunctionUnionAll/Intersect/Difference) ----
    Q("q_coll_setops",
      s"""WITH $OrderPartsSql,
         |pairs AS (
         |  SELECT a.l_orderkey AS okey, a.l AS la, b.l AS lb
         |  FROM op a JOIN op b ON b.l_orderkey = a.l_orderkey + 1)
         |SELECT okey,
         |  coalesce(array_to_string(list_sort(list_distinct(la || lb)), ','), '') AS u,
         |  coalesce(array_to_string(list_sort(list_intersect(la, lb)), ','), '') AS i,
         |  coalesce(array_to_string(list_sort(list_filter(la, x -> NOT list_contains(lb, x))), ','), '') AS d
         |FROM pairs ORDER BY okey""".stripMargin) { (s, d) =>
      val op = orderParts(s, d)
      val a = op.select(col("l_orderkey").as("okey"), col("l").as("la"))
      val b = op.select((col("l_orderkey") - 1).as("pk"), col("l").as("lb"))
      a.join(b, col("okey") === col("pk"))
        .select(col("okey"),
          array_join(array_sort(array_union(col("la"), col("lb"))), ",").as("u"),
          array_join(array_sort(array_intersect(col("la"), col("lb"))), ",").as("i"),
          array_join(array_sort(array_except(col("la"), col("lb"))), ",").as("d"))
        .orderBy("okey")
    },

    // ---- bool_and / bool_or aggregates (SQLFunctionBoolAnd/BoolOr) ----
    Q("q_agg_bool",
      """SELECT o_custkey,
        |  bool_and(o_totalprice > 50000) AS all_big,
        |  bool_or(o_orderstatus = 'F') AS any_f,
        |  count(*) AS n
        |FROM orders WHERE o_custkey < 100
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(expr("bool_and(o_totalprice > 50000)").as("all_big"),
          expr("bool_or(o_orderstatus = 'F')").as("any_f"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")
    },

    // ---- text similarity: jaroWinkler / hamming / sorensenDice ----
    Q("q_text_similarity",
      """SELECT a.c_custkey AS id,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw,
        |  hamming(a.c_name, b.c_name) AS ham,
        |  round(2.0 * len(list_intersect(
        |      list_distinct(list_transform(range(1, len(a.c_name)), i -> a.c_name[i:i+1])),
        |      list_distinct(list_transform(range(1, len(b.c_name)), i -> b.c_name[i:i+1]))))
        |    / (len(list_distinct(list_transform(range(1, len(a.c_name)), i -> a.c_name[i:i+1])))
        |      + len(list_distinct(list_transform(range(1, len(b.c_name)), i -> b.c_name[i:i+1])))), 6) AS dice
        |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
        |WHERE a.c_custkey < 100 ORDER BY id""".stripMargin) { (s, d) =>
      TextFunctions.register(s)
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("id"), col("c_name").as("na"))
      val b = c.select((col("c_custkey") - 1).as("pid"), col("c_name").as("nb"))
      a.join(b, col("id") === col("pid"))
        .select(col("id"),
          round(callUDF("jaro_winkler", col("na"), col("nb")), 6).as("jw"),
          callUDF("hamming_distance", col("na"), col("nb")).as("ham"),
          round(callUDF("sorensen_dice", col("na"), col("nb")), 6).as("dice"))
        .orderBy("id")
    },

    // ---- slug / snake_case normalization ----
    Q("q_text_slug",
      """SELECT p_partkey,
        |  trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
        |    '(^-+)|(-+$)', '', 'g')) AS slug,
        |  lower(regexp_replace(regexp_replace('GraftEngine' || replace(p_brand, '#', ''),
        |    '([a-z0-9])([A-Z])', '\1_\2', 'g'), '[\s-]+', '_', 'g')) AS snake
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          TextFunctions.slug(col("p_name")).as("slug"),
          TextFunctions.snakeCase(
            concat(lit("GraftEngine"), regexp_replace(col("p_brand"), "#", ""))).as("snake"))
        .orderBy("p_partkey")
    }
  )
}
