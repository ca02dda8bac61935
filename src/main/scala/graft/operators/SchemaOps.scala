package graft.operators

import graft.Q
import graft.schema.TypeCatalog
import org.apache.spark.sql.functions._

/** Schema introspection + polymorphism queries (SURVEY.md §2.1
  * schema-introspection row and §1.4 — reference
  * exec/FetchFromSchemaTypesStep.java, Select.java:57 polymorphic scans,
  * dynamic `_props`). */
object SchemaOps {

  private val cat = TypeCatalog.default

  val all: Seq[Q] = Seq(

    // ---- SELECT FROM schema:types (catalog introspection) ----
    Q("q_schema_types",
      """SELECT * FROM (VALUES
        |  ('customer', 'VERTEX', 'party', 5),
        |  ('documents', 'DOCUMENT', '', 5),
        |  ('embeddings', 'DOCUMENT', '', 3),
        |  ('events', 'TIMESERIES', '', 6),
        |  ('lineitem', 'EDGE', '', 11),
        |  ('nation', 'DOCUMENT', '', 3),
        |  ('orders', 'DOCUMENT', '', 6),
        |  ('part', 'VERTEX', '', 6),
        |  ('party', 'VERTEX', '', 0),
        |  ('region', 'DOCUMENT', '', 2),
        |  ('supplier', 'VERTEX', 'party', 4)
        |) AS t(name, kind, parent, n_props)
        |ORDER BY name""".stripMargin) { (s, d) =>
      cat.schemaTypes(s, d).orderBy("name")
    },

    // ---- polymorphic scan of an abstract supertype (+ INSTANCEOF) ----
    Q("q_schema_polymorphic",
      """SELECT tpe, count(*) AS n, count(DISTINCT nation) AS n_nations,
        |  min(key) AS min_key, max(key) AS max_key,
        |  sum(acctbal::DECIMAL(28,4))::DOUBLE AS total_bal
        |FROM (
        |  SELECT 'customer' AS tpe, c_custkey AS key, c_nationkey AS nation,
        |    c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT 'supplier', s_suppkey, s_nationkey, s_acctbal FROM supplier)
        |GROUP BY tpe ORDER BY tpe""".stripMargin) { (s, d) =>
      cat.polymorphicScan(s, d, "party")
        .groupBy(col("@type").as("tpe"))
        .agg(count(lit(1)).as("n"), countDistinct(col("nation")).as("n_nations"),
          min(col("key")).as("min_key"), max(col("key")).as("max_key"),
          sum(col("acctbal").cast("decimal(28,4)")).cast("double").as("total_bal"))
        .orderBy("tpe")
    },

    // ---- DDL lifecycle: CREATE/ALTER/DROP TYPE + CREATE PROPERTY
    //      through the statement front-end, reflected by introspection ----
    Q("q_schema_ddl",
      """SELECT * FROM (VALUES
        |  ('person', 'VERTEX', 'party', 0),
        |  ('review', 'DOCUMENT', '', 2)
        |) AS t(name, kind, parent, n_props)
        |ORDER BY name""".stripMargin) { (s, d) =>
      import graft.sql.GraftSql
      val c = TypeCatalog.fresh()
      GraftSql.execute(c, "CREATE DOCUMENT TYPE review")
      GraftSql.execute(c, "CREATE VERTEX TYPE person")
      GraftSql.execute(c, "ALTER TYPE person EXTENDS party")
      GraftSql.execute(c, "CREATE PROPERTY review.stars integer")
      GraftSql.execute(c, "CREATE PROPERTY review.body string")
      GraftSql.execute(c, "CREATE DOCUMENT TYPE scratch")
      GraftSql.execute(c, "DROP TYPE scratch")
      c.schemaTypes(s, d)
        .filter(col("name").isin("review", "person", "scratch"))
        .orderBy("name")
    },

    // ---- dynamic `_props` map column over the JSON property bag ----
    Q("q_schema_props_map",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_id < 20 ORDER BY event_id""".stripMargin) { (s, d) =>
      cat.scan(s, d, "events")
        .filter(col("event_id") < 20)
        .select(col("event_id"), element_at(col("_props"), "k").cast("int").as("k"))
        .orderBy("event_id")
    }
  )
}
