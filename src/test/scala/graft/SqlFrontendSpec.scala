package graft

import graft.sql.{Ast, GraftSql, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** Parser + translator unit coverage beyond the oracled q_sql_* queries. */
class SqlFrontendSpec extends AnyFunSuite {
  import Ast._
  import TestSession._

  test("parses projections, aliases, where, group, order, skip/limit") {
    val s = Parser.parse(
      "SELECT a, sum(b) AS sb FROM t WHERE x > 1 AND y = 'z' GROUP BY a ORDER BY sb DESC SKIP 2 LIMIT 5")
    assert(s.from == "t")
    assert(s.projections.map(_.alias) == Seq(None, Some("sb")))
    assert(s.groupBy == Seq(Ident("a")))
    assert(s.orderBy == Seq(OrderItem(Ident("sb"), asc = false)))
    assert(s.skip.contains(2L) && s.limit.contains(5L))
  }

  test("operator precedence: OR/AND/comparison/arith") {
    val s = Parser.parse("SELECT * FROM t WHERE a + 1 * 2 > 3 OR b = 4 AND c < 5")
    val w = s.where.get
    assert(w == Bin("OR",
      Bin(">", Bin("+", Ident("a"), Bin("*", NumLit(1, true), NumLit(2, true))), NumLit(3, true)),
      Bin("AND", Bin("=", Ident("b"), NumLit(4, true)), Bin("<", Ident("c"), NumLit(5, true)))))
  }

  test("method chains and string escapes") {
    val s = Parser.parse("SELECT name.toUpperCase().substring(0, 3) AS p FROM t WHERE q = 'it''s'")
    assert(s.projections.head.expr ==
      MethodCall(MethodCall(Ident("name"), "toUpperCase", Nil), "substring",
        Seq(NumLit(0, true), NumLit(3, true))))
    assert(s.where.get == Bin("=", Ident("q"), StrLit("it's")))
  }

  test("predicates: IN / NOT IN / BETWEEN / LIKE / IS NULL / MATCHES") {
    val s = Parser.parse(
      "SELECT * FROM t WHERE a IN (1, 2) AND b NOT IN (3) AND c BETWEEN 1 AND 9 " +
        "AND d LIKE '%x%' AND e IS NOT NULL AND f MATCHES '^a.*'")
    assert(s.where.isDefined)
  }

  test("bad input raises ParseException") {
    intercept[Parser.ParseException](Parser.parse("SELECT FROM"))
    intercept[Parser.ParseException](Parser.parse("SELECT a FROM t WHERE"))
    intercept[Parser.ParseException](Parser.parse("SELECT a FROM t trailing junk ("))
  }

  test("front-end query executes against the catalog end-to-end") {
    val df = GraftSql.query(spark, sfDir,
      "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("n")).sum == 25)
  }

  test("front-end WHERE reaches the parquet scan as a pushed filter") {
    val df = GraftSql.query(spark, sfDir,
      "SELECT o_orderkey FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey")
    val plan = Explain.explain(df, "formatted")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("LessThan(o_orderkey,100)"), plan)
  }

  test("DML statements parse: INSERT VALUES / FROM SELECT, UPDATE modifiers, DELETE") {
    import graft.sql.Ast._
    val ins = Parser.parseStatement(
      "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y')")
    assert(ins == Right(InsertStmt("t", Seq("a", "b"),
      Seq(Seq(NumLit(1, true), StrLit("x")), Seq(NumLit(2, true), StrLit("y"))), None)))
    val Right(fromSel: InsertStmt) = Parser.parseStatement(
      "INSERT INTO t FROM SELECT a, b FROM u WHERE a > 1"): @unchecked
    assert(fromSel.from.isDefined && fromSel.values.isEmpty)
    val Right(upd: UpdateStmt) = Parser.parseStatement(
      "UPDATE t SET a = a + 1, b = 'z' UPSERT RETURN AFTER WHERE a = 5"): @unchecked
    assert(upd.upsert && upd.ret == "AFTER" && upd.sets.length == 2 && upd.where.isDefined)
    val Right(del: DeleteStmt) = Parser.parseStatement(
      "DELETE FROM t WHERE a < 0"): @unchecked
    assert(del.where.isDefined)
  }

  test("INSERT FROM SELECT and RETURN BEFORE execute against writable state") {
    import graft.schema.TypeCatalog
    import graft.sources.MutableTable
    val state = "/tmp/graft_state/spec_dml_ins"
    MutableTable.copyOf(spark, Tables.nation(spark, sfDir), state)
    val cat = TypeCatalog.fresh()
    cat.createType("nation_spec", "DOCUMENT", path = Some(_ => state))
    val inserted = GraftSql.statement(spark, sfDir,
      "INSERT INTO nation_spec FROM SELECT n_nationkey + 100 AS n_nationkey, n_name FROM nation WHERE n_nationkey < 2", cat)
    assert(inserted.count() == 2)
    assert(GraftSql.query(spark, sfDir, "SELECT n_nationkey FROM nation_spec", cat).count() == 27)
    val before = GraftSql.statement(spark, sfDir,
      "UPDATE nation_spec SET n_name = 'X' RETURN BEFORE WHERE n_nationkey = 0", cat)
    assert(before.collect().head.getAs[String]("n_name") != "X")
    assert(GraftSql.statement(spark, sfDir,
      "DELETE FROM nation_spec WHERE n_nationkey >= 100", cat)
      .collect().head.getAs[Long]("count") == 2L)
  }

  test("vector and geo functions are callable from SQL text") {
    val v = GraftSql.query(spark, sfDir,
      "SELECT vec_id, round(vec_cosine(embedding, embedding), 6) AS self_cos, " +
        "vec_dim(embedding) AS dim FROM embeddings WHERE vec_id < 3 ORDER BY vec_id")
      .collect()
    assert(v.length == 3)
    assert(v.forall(r => math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-9))
    assert(v.forall(_.getAs[Int]("dim") > 0))
    val g = GraftSql.query(spark, sfDir,
      "SELECT round(geo_distance(0, 0, 0, 1), 2) AS km FROM region LIMIT 1").collect()
    // one degree of latitude ≈ 111.2 km on the haversine sphere
    assert(math.abs(g.head.getAs[Double]("km") - 111.2) < 1.0)
  }

  test("EXPLAIN and PROFILE statements return plan rows and runtime metrics") {
    import org.apache.spark.sql.functions.col
    val plan = GraftSql.statement(spark, sfDir,
      "EXPLAIN SELECT o_orderkey FROM orders WHERE o_orderkey < 10")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Scan parquet") && plan.contains("PushedFilters"), plan)
    val prof = GraftSql.statement(spark, sfDir,
      "PROFILE SELECT count(*) AS n FROM orders")
    assert(prof.columns.toSeq == Seq("operator", "metric", "value"))
    assert(prof.filter(col("metric") === "numOutputRows" && col("value") > 0).count() > 0)
  }

  test("geo predicate registry: equals/touches/crosses truth table") {
    // fixed shapes so every branch (true AND false) is exercised
    val row = GraftSql.query(spark, sfDir,
      """SELECT
        | st_equals(st_rectangle(0.0, 0.0, 2.0, 2.0), st_buffer(st_rectangle(0.5, 0.5, 1.5, 1.5), 0.5)) AS eq_t,
        | st_equals(st_rectangle(0.0, 0.0, 2.0, 2.0), st_rectangle(0.0, 0.0, 2.0, 3.0)) AS eq_f,
        | st_touches(st_rectangle(0.0, 0.0, 1.0, 1.0), st_rectangle(1.0, 0.0, 2.0, 1.0)) AS tch_t,
        | st_touches(st_rectangle(0.0, 0.0, 1.5, 1.0), st_rectangle(1.0, 0.0, 2.0, 1.0)) AS tch_f,
        | st_crosses(st_linestring([-1.0, 3.0], [0.5, 0.5]), st_rectangle(0.0, 0.0, 2.0, 1.0)) AS crx_t,
        | st_crosses(st_linestring([0.2, 0.8], [0.5, 0.5]), st_rectangle(0.0, 0.0, 2.0, 1.0)) AS crx_f,
        | st_overlaps(st_rectangle(0.0, 0.0, 2.0, 2.0), st_rectangle(1.0, 1.0, 3.0, 3.0)) AS ovl_t,
        | st_overlaps(st_rectangle(0.0, 0.0, 4.0, 4.0), st_rectangle(1.0, 1.0, 2.0, 2.0)) AS ovl_f
        | FROM region LIMIT 1""".stripMargin.replace("\n", "")).collect().head
    assert(row.getBoolean(0) && !row.getBoolean(1), "equals")
    assert(row.getBoolean(2) && !row.getBoolean(3), "touches")
    assert(row.getBoolean(4) && !row.getBoolean(5), "crosses")
    assert(row.getBoolean(6) && !row.getBoolean(7), "overlaps")
  }

  test("index DDL lifecycle: CREATE UNIQUE violation, DROP, REBUILD, schema:indexes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = s"/tmp/graft_state/ixddl_${System.nanoTime()}"
    Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "c", 7L)).toDF("k", "s", "grp")
      .write.mode("overwrite").parquet(dir)
    val cat = graft.schema.TypeCatalog.fresh()
    cat.createType("tix", "DOCUMENT", path = Some(_ => dir))
    // UNIQUE over a duplicated key fails loudly AND rolls the registration back
    val ex = intercept[IllegalArgumentException] {
      GraftSql.statement(spark, sfDir, "CREATE INDEX ON tix (grp) UNIQUE", cat)
    }
    assert(ex.getMessage.contains("duplicate key"))
    assert(GraftSql.query(spark, sfDir, "SELECT FROM schema:indexes", cat).count() === 0)
    // UNIQUE over the key column succeeds; indexed scan prunes and agrees
    GraftSql.statement(spark, sfDir, "CREATE INDEX ON tix (k) UNIQUE", cat)
    val q = GraftSql.query(spark, sfDir, "SELECT k, s FROM tix WHERE k = 2", cat)
    assert(q.collect().map(_.getString(1)).toSeq === Seq("b"))
    // REBUILD re-clusters after an append drifts the layout
    Seq((9L, "z", 9L)).toDF("k", "s", "grp").write.mode("append").parquet(dir)
    GraftSql.statement(spark, sfDir, "REBUILD INDEX tix[k]", cat)
    assert(GraftSql.query(spark, sfDir, "SELECT s FROM tix WHERE k = 9", cat)
      .collect().map(_.getString(0)).toSeq === Seq("z"))
    // DROP removes the manifest and the registry row; scans still answer
    GraftSql.statement(spark, sfDir, "DROP INDEX tix[k]", cat)
    assert(GraftSql.query(spark, sfDir, "SELECT FROM schema:indexes", cat).count() === 0)
    assert(GraftSql.query(spark, sfDir, "SELECT s FROM tix WHERE k = 9", cat).count() === 1)
  }

  test("SQL MATCH .out/.in method form matches the arrow form") {
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    val arrow = graft.sql.Match.query(g,
      "MATCH {type: order, as: o}-contains->{type: part, as: p, where: (key < 20)} " +
        "RETURN p.key AS k, count(*) AS n ORDER BY k")
    val method = graft.sql.Match.query(g,
      "MATCH {type: part, as: p, where: (key < 20)}.in('contains'){type: order, as: o} " +
        "RETURN p.key AS k, count(*) AS n ORDER BY k")
    assert(arrow.collect().toSeq == method.collect().toSeq)
  }

  test("MATCH depth windows: maxDepth/while/$depth filters compose; anonymous arrows") {
    // MatchStatementExecutionTest testWhile/maxDepth: depth 0 = the origin
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    def ks(q: String): Seq[Long] =
      graft.sql.Match.query(g, q).collect().map(_.getLong(0)).toSeq
    val d0 = ks("MATCH {type: customer, as: c, where: (key = 1)}" +
      ".out('placed'){as: x, maxDepth: 0} RETURN x.key AS k")
    assert(d0 == Seq(1L)) // origin only
    val d1 = ks("MATCH {type: customer, as: c, where: (key = 1)}" +
      ".out('placed'){as: x, maxDepth: 1} RETURN x.key AS k ORDER BY k")
    val w1 = ks("MATCH {type: customer, as: c, where: (key = 1)}" +
      ".out('placed'){as: x, while: ($depth < 1)} RETURN x.key AS k ORDER BY k")
    assert(d1 == w1 && d1.contains(1L) && d1.length > 1) // origin + direct
    val pin = ks("MATCH {type: customer, as: c, where: (key = 1)}" +
      ".out('placed'){as: x, maxDepth: 1, where: ($depth = 1)} RETURN x.key AS k ORDER BY k")
    assert(pin == d1.filterNot(_ == 1L)) // window pinned to depth 1
    // anonymous arrows parse in both directions
    val fwd = ks("MATCH {type: customer, as: c, where: (key = 1)} --> {as: o} " +
      "RETURN o.key AS k ORDER BY k")
    assert(fwd == pin)
    val rev = ks("MATCH {type: order, as: o, where: (key = " + fwd.head +
      ")} <-- {as: c} RETURN c.key AS k")
    assert(rev == Seq(1L))
  }

  test("MATCH context-variable RETURN: $patterns/$paths/$elements/$pathElements") {
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    val base = "MATCH {type: customer, where: (key = 1)}.out('placed'){as: o}" +
      ".out('contains'){type: part, where: (key < 100)} RETURN "
    val patterns = graft.sql.Match.query(g, base + "$patterns")
    assert(patterns.columns.toSeq == Seq("o")) // named vars only, deduped
    val paths = graft.sql.Match.query(g, base + "$paths")
    assert(paths.columns.length == 3) // every var incl. anonymous
    assert(paths.count() >= patterns.count())
    val elements = graft.sql.Match.query(g, base + "$elements")
    assert(elements.columns.contains("key")) // node records unpacked
    assert(elements.select("label").distinct().collect().map(_.getString(0)).toSeq == Seq("order"))
    val pathElements = graft.sql.Match.query(g, base + "$pathElements")
    val labels = pathElements.select("label").distinct().collect().map(_.getString(0)).sorted
    assert(labels.toSeq == Seq("customer", "order", "part"))
  }

  test("MATCH NOT pattern anti-joins on bound aliases") {
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    // every order has lineitems at this SF except the synthetic empties —
    // the anti-pattern must be a strict subset of the positive match
    val pos = graft.sql.Match.query(g,
      "MATCH {type: customer, as: c, where: (key < 30)} --> {as: o} " +
        "RETURN c.key AS k, o.key AS ok").count()
    val neg = graft.sql.Match.query(g,
      "MATCH {type: customer, as: c, where: (key < 30)} --> {as: o}, " +
        "NOT {as: o} --> {as: x} RETURN c.key AS k, o.key AS ok").count()
    assert(neg < pos)
    // NOT over an edge that always exists for the matched rows -> empty
    val none = graft.sql.Match.query(g,
      "MATCH {type: customer, as: c, where: (key < 10)} --> {as: o}, " +
        "NOT {as: c} --> {as: o} RETURN c.key AS k").count()
    assert(none == 0)
  }

  test("TRAVERSE: WHILE depth bound, FROM (subquery), STRATEGY, LIMIT") {
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    // WHILE $depth < 2 emits depths 0 and 1 only (reference withDepth)
    val whileRows = graft.sql.Traverse.query(g,
      "TRAVERSE out() FROM (SELECT FROM customer WHERE key = 1) WHILE $depth < 2").collect()
    assert(whileRows.nonEmpty && whileRows.forall(_.getAs[Number]("depth").intValue <= 1))
    val maxRows = graft.sql.Traverse.query(g,
      "TRAVERSE out() FROM customer WHERE key = 1 MAXDEPTH 1").collect()
    assert(whileRows.length == maxRows.length)
    // BREADTH_FIRST emits level by level: the depth sequence is monotonic
    val bfs = graft.sql.Traverse.query(g,
      "TRAVERSE out() FROM customer WHERE key = 1 STRATEGY BREADTH_FIRST")
      .collect().map(_.getAs[Number]("depth").intValue).toSeq
    assert(bfs == bfs.sorted)
    // DEPTH_FIRST dives: on a branching 2-level graph the depth sequence
    // returns to 1 after visiting a branch's children (non-monotonic), and
    // both strategies visit the same node set
    val dfs = graft.sql.Traverse.query(g,
      "TRAVERSE out() FROM customer WHERE key = 1 STRATEGY DEPTH_FIRST")
      .collect().map(_.getAs[Number]("depth").intValue).toSeq
    assert(dfs.length == bfs.length)
    assert(dfs != dfs.sorted) // customer 1 has >1 order, each with parts
    assert(graft.sql.Traverse.query(g,
      "TRAVERSE out() FROM customer WHERE key = 1 LIMIT 3").count() == 3)
  }

  test("MATCH optional:true keeps left rows with null right bindings") {
    val g = graft.graph.PropertyGraph.fromTpch(spark, sfDir)
    val rows = graft.sql.Match.query(g,
      "MATCH {type: customer, as: c, where: (key < 4)} -nonexisting-> " +
        "{as: b, optional: true} RETURN c.key AS k, b.key AS bk ORDER BY k").collect()
    assert(rows.length == 4 && rows.forall(_.isNullAt(1)))
  }
}
