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
}
