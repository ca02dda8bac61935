package graft.operators

import graft.{Q, Tables}
import graft.sources.MutableTable
import org.apache.spark.sql.functions._

/** DML lifecycle queries (SURVEY.md §2.11): each performs a REAL mutation
  * on a writable parquet copy and returns either the resulting table state
  * or the RETURN BEFORE/AFTER images; the DuckDB oracle computes the same
  * post-mutation state declaratively from the immutable source tables —
  * so a pass proves the mutation semantics, not just a projection.
  *
  * State lives under /tmp/graft_state, keyed by scale factor; every run
  * re-copies the source first, so the queries are idempotent.
  */
object DmlOps {

  private def slug(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")
  private def stateDir(q: String, d: String): String = s"/tmp/graft_state/${q}_${slug(d)}"

  val all: Seq[Q] = Seq(

    // ---- UPDATE … SET + RETURN BEFORE/AFTER images (UpdateSetStep,
    //      CopyRecordContentBeforeUpdateStep) ----
    Q("q_dml_update_returning",
      """SELECT o_orderkey,
        |  o_totalprice AS before_price,
        |  round((o_totalprice * 0.95)::DECIMAL(28,4), 2)::DOUBLE AS after_price
        |FROM orders
        |WHERE o_orderkey < 400 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(
        s, Tables.orders(s, d).filter(col("o_orderkey") < 400),
        stateDir("dml_upd", d))
      // round() on a raw double diverges from DuckDB in the last ulp on
      // ties; a 4-decimal cast before the 2-digit round pins both engines
      // to the same exact decimal (same pattern as q_sql_exprs).
      val (_, before, after) = t.update(
        col("o_orderstatus") === "O",
        Seq("o_totalprice" ->
          round((col("o_totalprice") * 0.95).cast("decimal(28,4)"), 2).cast("double")))
      before.select(col("o_orderkey"), col("o_totalprice").as("before_price"))
        .join(after.select(col("o_orderkey"), col("o_totalprice").as("after_price")),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ---- UPDATE table state: the whole table after the mutation ----
    Q("q_dml_update_state",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  CASE WHEN o_orderstatus = 'O' AND o_totalprice > 150000
        |    THEN round((o_totalprice * 0.9)::DECIMAL(28,4), 2)::DOUBLE
        |    ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(
        s, Tables.orders(s, d).filter(col("o_orderkey") < 500),
        stateDir("dml_upd_state", d))
      t.update(
        col("o_orderstatus") === "O" && col("o_totalprice") > 150000,
        Seq("o_totalprice" ->
          round((col("o_totalprice") * 0.9).cast("decimal(28,4)"), 2).cast("double")))
      t.df.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ---- UPSERT: one key hits (update), one misses (insert) (UpsertStep) ----
    Q("q_dml_upsert",
      """SELECT n_nationkey, n_name, n_regionkey FROM (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey <> 3
        |  UNION ALL
        |  SELECT 3, 'REPUBLIC OF GRAFT', n_regionkey FROM nation WHERE n_nationkey = 3
        |  UNION ALL
        |  SELECT 99, 'NEWLAND', NULL)
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(s, Tables.nation(s, d), stateDir("dml_upsert", d))
      t.upsert(Map("n_nationkey" -> lit(3)),
        Seq("n_name" -> lit("REPUBLIC OF GRAFT")))          // key exists → update
      t.upsert(Map("n_nationkey" -> lit(99)),
        Seq("n_name" -> lit("NEWLAND")))                    // key missing → insert
      t.df.select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    },

    // ---- DELETE … WHERE + resulting state (DeleteStep) ----
    Q("q_dml_delete",
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey < 500 AND NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(
        s, Tables.orders(s, d).filter(col("o_orderkey") < 500),
        stateDir("dml_del", d))
      t.delete(col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
      t.df.select("o_orderkey", "o_orderstatus", "o_totalprice").orderBy("o_orderkey")
    },

    // ---- change feed: every mutation appends (seq, op, key) rows —
    //      the trigger/CDF hook (reference event/ listener package) ----
    Q("q_dml_changefeed",
      """SELECT * FROM (VALUES
        |  (1, 'update', 0), (1, 'update', 1), (1, 'update', 2),
        |  (2, 'delete', 10),
        |  (3, 'insert', 99)
        |) AS t(seq, op, key)
        |ORDER BY seq, key""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(s, Tables.nation(s, d),
        stateDir("dml_cdf", d), keyCol = Some("n_nationkey"))
      t.update(col("n_nationkey") < 3, Seq("n_name" -> upper(col("n_name"))))
      t.delete(col("n_nationkey") === 10)
      t.upsert(Map("n_nationkey" -> lit(99)), Seq("n_name" -> lit("NEWLAND")))
      t.changeFeed.orderBy("seq", "key")
    },

    // ---- AFTER-triggers (TriggerImpl / event listeners): registered
    //      actions fire per mutation with the affected rows and maintain
    //      an audit table the oracle reproduces declaratively ----
    Q("q_trigger_audit",
      """SELECT * FROM (
        |  SELECT n_nationkey AS key, 'updated' AS evt FROM nation WHERE n_nationkey < 5
        |  UNION ALL
        |  SELECT n_nationkey, 'deleted' FROM nation WHERE n_nationkey = 10)
        |ORDER BY evt, key""".stripMargin) { (s, d) =>
      val t = MutableTable.copyOf(s, Tables.nation(s, d), stateDir("trigger", d))
      val auditDir = stateDir("trigger_audit", d)
      // reset the audit sink, then register AFTER UPDATE / AFTER DELETE
      var first = true
      def audit(evt: String)(rows: org.apache.spark.sql.DataFrame): Unit = {
        rows.select(col("n_nationkey").as("key"), lit(evt).as("evt"))
          .write.mode(if (first) "overwrite" else "append").parquet(auditDir)
        first = false
      }
      t.addTrigger("update", audit("updated"))
      t.addTrigger("delete", audit("deleted"))
      t.update(col("n_nationkey") < 5, Seq("n_name" -> upper(col("n_name"))))
      t.delete(col("n_nationkey") === 10)
      s.read.parquet(auditDir).orderBy("evt", "key")
    },

    // ---- backup → mutate → restore: the restored state must equal the
    //      pristine source (integration/backup + restore) ----
    Q("q_backup_restore",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, d) =>
      val dir = stateDir("backup_tbl", d)
      val bdir = stateDir("backup_snap", d)
      val t = MutableTable.copyOf(s, Tables.nation(s, d), dir)
      graft.sources.Backup.backup(s, Map("nation" -> dir), bdir)
      t.delete(col("n_nationkey") % 2 === 0)         // damage the table …
      t.update(col("n_nationkey") > 20, Seq("n_name" -> lit("X")))
      graft.sources.Backup.restore(s, bdir, Map("nation" -> dir))
      t.df.select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    },

    // ---- MERGE INTO: matched → update, not matched → insert ----
    Q("q_dml_merge",
      """SELECT c_custkey, c_name, c_mktsegment FROM (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey < 50 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey < 300
        |  UNION ALL
        |  SELECT c_custkey + 10000, c_name, 'MACHINERY'
        |  FROM customer WHERE c_custkey < 50)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val base = Tables.customer(s, d).filter(col("c_custkey") < 300)
      val t = MutableTable.copyOf(s, base, stateDir("dml_merge", d))
      // Source: updated segment for custkey<50 plus the same rows re-keyed
      // past the existing range (guaranteed not-matched → inserts).
      val updates = base.filter(col("c_custkey") < 50)
        .withColumn("c_mktsegment", lit("MACHINERY"))
      val inserts = updates.withColumn("c_custkey", col("c_custkey") + 10000)
      t.merge(updates.unionByName(inserts), Seq("c_custkey"),
        Seq("c_mktsegment" -> col("src_c_mktsegment")))
      t.df.select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
    }
  )
}
