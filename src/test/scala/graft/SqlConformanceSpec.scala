package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** Conformance batch ported from the reference's SQL executor test
  * corpus (engine/src/test/java/com/arcadedb/query/sql/...): semantics
  * the self-authored q_sql_* oracles and the differential fuzzer never
  * pinned. Each test cites the reference test it ports. Only the
  * SEMANTICS are ported — setup/assertions are re-expressed over tiny
  * writable catalogs.
  */
class SqlConformanceSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}
  import spark.implicits._

  private val counter = new java.util.concurrent.atomic.AtomicInteger()

  /** Fresh single-table writable catalog over `rows`. */
  private def writable(rows: DataFrame, name: String): graft.schema.TypeCatalog = {
    val state = s"/tmp/graft_conformance/${name}_${counter.incrementAndGet()}"
    graft.sources.MutableTable.copyOf(spark, rows, state)
    val cat = graft.schema.TypeCatalog.fresh()
    cat.createType(name, "DOCUMENT", path = Some(_ => state))
    cat
  }

  private def q(cat: graft.schema.TypeCatalog, sql: String): Array[Row] =
    GraftSql.query(spark, sfDir, sql, cat).collect()

  private def stmt(cat: graft.schema.TypeCatalog, sql: String): Array[Row] =
    GraftSql.statement(spark, sfDir, sql, cat).collect()

  // ---- GroupByMixedNumericTypesTest.java (issue #4516) ----

  test("GROUP BY merges numerically-equal keys of different scales/types") {
    // groupByDecimalDifferentScale: DECIMAL 1 vs 1.0 vs 1.00 → ONE group
    val cat = writable(Seq(BigDecimal("1"), BigDecimal("1.0"), BigDecimal("1.00"))
      .toDF("amount"), "sale")
    val rows = q(cat, "SELECT amount, count(*) AS cnt FROM sale GROUP BY amount")
    assert(rows.length == 1, rows.mkString("|"))
    assert(rows(0).getAs[Long]("cnt") == 3L)
  }

  test("GROUP BY mixed int/long keys merge; distinct values stay separate") {
    // groupByMixedIntegerAndLong + groupByDistinctNumericValuesStaySeparate
    val cat = writable(Seq("1", "1.0", "2", "2.50", "2.5").map(BigDecimal(_))
      .toDF("v"), "reading")
    val rows = q(cat, "SELECT v, count(*) AS cnt FROM reading GROUP BY v ORDER BY v")
    assert(rows.length == 3, rows.mkString("|"))
    assert(rows.map(_.getAs[Long]("cnt")).sum == 5L)
  }

  // ---- InConditionSubqueryTest.java (issue #4337) ----

  test("IN (SELECT ...) subquery over strings and integers; NOT IN excludes") {
    val people = Seq(("Alice", 30L), ("Bob", 25L), ("Charlie", 40L)).toDF("name", "age")
    val allowed = Seq("Alice", "Charlie").toDF("name")
    val cat = writable(people, "person")
    val state = s"/tmp/graft_conformance/allowed_${counter.incrementAndGet()}"
    graft.sources.MutableTable.copyOf(spark, allowed, state)
    cat.createType("allowedname", "DOCUMENT", path = Some(_ => state))

    val in = q(cat,
      "SELECT name FROM person WHERE name IN (SELECT name FROM allowedname) ORDER BY name")
    assert(in.map(_.getString(0)).toSeq == Seq("Alice", "Charlie"))
    val notIn = q(cat,
      "SELECT name FROM person WHERE name NOT IN (SELECT name FROM allowedname) ORDER BY name")
    assert(notIn.map(_.getString(0)).toSeq == Seq("Bob"))
    val intIn = q(cat,
      "SELECT name FROM person WHERE age IN (SELECT age FROM person WHERE name = 'Alice' OR name = 'Bob') ORDER BY name")
    assert(intIn.map(_.getString(0)).toSeq == Seq("Alice", "Bob"))
  }

  // ---- UnaryOperationsTest.java ----

  test("unary minus/plus on literals, fields, in WHERE, and on zero") {
    val cat = writable(Seq(10L, 0L, -5L).toDF("value"), "v")
    assert(q(cat, "SELECT -10 AS r FROM v LIMIT 1")(0).getAs[Number]("r").longValue == -10L)
    assert(q(cat, "SELECT +10 AS r FROM v LIMIT 1")(0).getAs[Number]("r").longValue == 10L)
    assert(q(cat, "SELECT -value AS r FROM v WHERE value = 10")(0)
      .getAs[Number]("r").longValue == -10L)
    assert(q(cat, "SELECT value + (-value) AS r FROM v WHERE value = 10")(0)
      .getAs[Number]("r").longValue == 0L)
    assert(q(cat, "SELECT value FROM v WHERE -value = -10")(0)
      .getAs[Number]("value").longValue == 10L)
    assert(q(cat, "SELECT -value AS r FROM v WHERE value = 0")(0)
      .getAs[Number]("r").longValue == 0L)
    assert(q(cat, "SELECT -value AS r FROM v WHERE value = -5")(0)
      .getAs[Number]("r").longValue == 5L)
  }

  // ---- BooleanLiteralConditionsTest.java ----

  test("WHERE TRUE / FALSE / NULL literal conditions") {
    val cat = writable(Seq(("John", 30L), ("Jane", 25L), ("Bob", 35L)).toDF("name", "age"), "v")
    assert(q(cat, "SELECT name FROM v WHERE TRUE").length == 3)
    assert(q(cat, "SELECT name FROM v WHERE FALSE").isEmpty)
    assert(q(cat, "SELECT name FROM v WHERE NULL").isEmpty)
    assert(q(cat, "SELECT name FROM v WHERE TRUE AND age > 25 ORDER BY name")
      .map(_.getString(0)).toSeq == Seq("Bob", "John"))
    assert(q(cat, "SELECT name FROM v WHERE FALSE OR age = 25")
      .map(_.getString(0)).toSeq == Seq("Jane"))
    assert(q(cat, "SELECT name FROM v WHERE (TRUE AND age > 30) OR (FALSE AND age < 20)")
      .map(_.getString(0)).toSeq == Seq("Bob"))
  }

  // ---- ArrayConcatenationTest.java (issue #3314) ----

  test("array concatenation with || including chained forms") {
    val cat = writable(Seq(
      (Seq("java", "database"), Seq("tech", "software"))).toDF("tags", "categories"), "v")
    assert(q(cat, "SELECT tags || categories AS combined FROM v")(0)
      .getSeq[String](0) == Seq("java", "database", "tech", "software"))
    assert(q(cat, "SELECT tags || ['extra'] AS combined FROM v LIMIT 1")(0)
      .getSeq[String](0) == Seq("java", "database", "extra"))
    assert(q(cat, "SELECT ['a', 'b'] || ['c', 'd'] AS combined FROM v")(0)
      .getSeq[String](0) == Seq("a", "b", "c", "d"))
    assert(q(cat, "SELECT [1,2] || [3,4] || [5,6] AS combined FROM v")(0)
      .getSeq[Long](0).map(_.toLong) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  // ---- MultiplicationOverflowTest.java ----

  test("integer multiplication widens instead of overflowing") {
    val cat = writable(Seq(1L).toDF("x"), "v")
    assert(q(cat, "SELECT 1000*3600*24*365 AS r FROM v")(0)
      .getAs[Number]("r").longValue == 31536000000L)
    assert(q(cat, "SELECT 1000 * 3600.5 AS r FROM v")(0)
      .getAs[Number]("r").doubleValue == 3600500.0)
  }

  // ---- ModifierChainsTest.java ----

  test("chained modifiers: matrix[0][1], nested.a.b.c, array.size()") {
    val nested = Seq((
      Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L)),
      Seq(10L, 20L, 30L, 40L, 50L))).toDF("matrix", "array")
    val cat = writable(nested, "v")
    assert(q(cat, "SELECT matrix[0][1] AS r FROM v WHERE matrix IS NOT NULL")(0)
      .getAs[Number]("r").longValue == 2L)
    assert(q(cat, "SELECT matrix[1][2] AS r FROM v WHERE matrix IS NOT NULL")(0)
      .getAs[Number]("r").longValue == 6L)
    assert(q(cat, "SELECT array.size() AS n FROM v WHERE array IS NOT NULL")(0)
      .getAs[Number]("n").longValue == 5L)
  }

  // ---- OrderByItem.java null comparator (nulls smallest: ASC first, DESC last) ----

  test("ORDER BY places nulls smallest (first ASC, last DESC)") {
    val cat = writable(Seq[(String, java.lang.Long)](
      ("a", 2L), ("b", null), ("c", 1L)).toDF("name", "x"), "v")
    assert(q(cat, "SELECT name FROM v ORDER BY x").map(_.getString(0)).toSeq ==
      Seq("b", "c", "a"))
    assert(q(cat, "SELECT name FROM v ORDER BY x DESC").map(_.getString(0)).toSeq ==
      Seq("a", "c", "b"))
  }

  // ---- UpdateRemoveMapKeyTest.java ----

  test("UPDATE map-key removal: .remove(), REMOVE k = v, REMOVE k['v']") {
    def freshCat() = writable(Seq(
      ("set_remove", Map("u1" -> "rw", "u2" -> "r"))).toDF("id", "acl"), "doc")
    locally {
      val cat = freshCat()
      stmt(cat, "UPDATE doc SET acl = acl.remove('u1') WHERE id = 'set_remove'")
      val acl = q(cat, "SELECT acl FROM doc WHERE id = 'set_remove'")(0).getMap[String, String](0)
      assert(acl.keySet == Set("u2"), acl)
    }
    locally {
      val cat = freshCat()
      stmt(cat, "UPDATE doc REMOVE acl = 'u1' WHERE id = 'set_remove'")
      val acl = q(cat, "SELECT acl FROM doc WHERE id = 'set_remove'")(0).getMap[String, String](0)
      assert(acl.keySet == Set("u2"), acl)
    }
    locally {
      val cat = freshCat()
      stmt(cat, "UPDATE doc REMOVE acl['u1'] WHERE id = 'set_remove'")
      val acl = q(cat, "SELECT acl FROM doc WHERE id = 'set_remove'")(0).getMap[String, String](0)
      assert(acl.keySet == Set("u2"), acl)
    }
  }

  test("UPDATE list-item removal via .remove() persists") {
    val cat = writable(Seq(("set_list", Seq("a", "b", "c"))).toDF("id", "tags"), "doc")
    stmt(cat, "UPDATE doc SET tags = tags.remove('b') WHERE id = 'set_list'")
    assert(q(cat, "SELECT tags FROM doc WHERE id = 'set_list'")(0)
      .getSeq[String](0) == Seq("a", "c"))
  }

  // ---- ReservedKeywordPropertyNameTest.java (issue #5092) ----

  test("reserved keywords usable as property names (From/To)") {
    val cat = writable(Seq(("Rome", "t1"), ("Paris", "t2")).toDF("From", "name"), "trip")
    stmt(cat, "UPDATE trip SET From = 'London' WHERE name = 't1'")
    assert(q(cat, "SELECT From AS f FROM trip WHERE name = 't2'")(0).getString(0) == "Paris")
    assert(q(cat, "SELECT From AS f FROM trip WHERE name = 't1'")(0).getString(0) == "London")
  }

  // ---- UpdateStatementExecutionTest.java content()/merge() ----

  test("UPDATE CONTENT replaces the whole property set; MERGE folds keys in") {
    locally {
      val cat = writable(Seq(("John", 30L, "NY"), ("Jane", 25L, "LA"))
        .toDF("name", "age", "city"), "v")
      stmt(cat, "UPDATE v CONTENT {'name': 'foo', 'secondName': 'bar'}")
      val rows = q(cat, "SELECT name, secondName, age FROM v")
      assert(rows.length == 2)
      rows.foreach { r =>
        assert(r.getString(0) == "foo" && r.getString(1) == "bar" && r.isNullAt(2), r)
      }
    }
    locally {
      val cat = writable(Seq(("John", 30L, "New York")).toDF("name", "age", "city"), "v")
      stmt(cat, "UPDATE v MERGE { \"status\": \"active\", \"email\": \"j@x.com\" } WHERE name = 'John'")
      val r = q(cat, "SELECT name, age, city, status, email FROM v WHERE name = 'John'")(0)
      assert(r.getString(0) == "John" && r.getAs[Number](1).longValue == 30L &&
        r.getString(2) == "New York" && r.getString(3) == "active" &&
        r.getString(4) == "j@x.com", r)
    }
  }

  // ---- InsertStatementExecutionTest / InsertContent* ----

  test("INSERT SET and INSERT CONTENT (single + array, new keys evolve the schema)") {
    val cat = writable(Seq(("seed", 1L)).toDF("name", "n"), "t")
    stmt(cat, "INSERT INTO t SET name = 'alice', n = 2")
    stmt(cat, "INSERT INTO t CONTENT {'name': 'bob', 'n': 3, 'tag': 'x'}")
    stmt(cat, "INSERT INTO t CONTENT [{'name': 'carol', 'n': 4}, {'name': 'dave', 'n': 5}]")
    val rows = q(cat, "SELECT name, n, tag FROM t ORDER BY n")
    assert(rows.map(_.getString(0)).toSeq == Seq("seed", "alice", "bob", "carol", "dave"))
    assert(rows.map(r => Option(r.get(2))).toSeq ==
      Seq(None, None, Some("x"), None, None))
  }

  test("INSERT SET with a key NOT in the schema evolves it, like CONTENT does") {
    // r9 advice #1: the SET form desugared onto the existing schema and
    // silently DROPPED a new key's value; schema-flexible documents
    // (Document.java:42) must accept new keys on every insert form.
    val cat = writable(Seq(("seed", 1L)).toDF("name", "n"), "t")
    stmt(cat, "INSERT INTO t SET name = 'eve', n = 6, city = 'Rome'")
    stmt(cat, "INSERT INTO t (name, n, score) VALUES ('frank', 7, 9.5)")
    val rows = q(cat, "SELECT name, n, city, score FROM t ORDER BY n")
    assert(rows.map(_.getString(0)).toSeq == Seq("seed", "eve", "frank"))
    assert(rows.map(r => Option(r.get(2))).toSeq == Seq(None, Some("Rome"), None))
    assert(rows.map(r => Option(r.get(3))).toSeq == Seq(None, None, Some(9.5)))
  }

  // ---- UpdateStatementExecutionTest remove1()/remove2(): list REMOVE by index ----

  test("UPDATE REMOVE list[i, j] removes by position; map[k] removes the key") {
    locally {
      val cat = writable(Seq(("r", Seq("a", "b", "c", "d", "e"))).toDF("id", "xs"), "doc")
      stmt(cat, "UPDATE doc REMOVE xs[0, 1, 3] WHERE id = 'r'")
      assert(q(cat, "SELECT xs FROM doc")(0).getSeq[String](0) == Seq("c", "e"))
    }
    locally {
      val cat = writable(Seq(("r", Map("foo" -> 1L, "bar" -> 2L))).toDF("id", "m"), "doc")
      stmt(cat, "UPDATE doc REMOVE m[\"bar\"] WHERE id = 'r'")
      assert(q(cat, "SELECT m FROM doc")(0).getMap[String, Long](0).keySet == Set("foo"))
    }
  }

  // ---- BacktickProjectionAliasTest.java (issue #4691) ----

  test("backticked projections/aliases strip the quotes") {
    val cat = writable(Seq(1L, 1L, 2L).toDF("col1"), "tbl")
    val r1 = q(cat, "SELECT `col1` FROM tbl ORDER BY col1")
    assert(r1.head.schema.fieldNames.toSeq == Seq("col1"))
    val r2 = q(cat, "SELECT `col1`, count(*) AS n FROM tbl GROUP BY `col1` ORDER BY `col1`")
    assert(r2.map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq ==
      Seq((1L, 2L), (2L, 1L)))
    val r3 = q(cat, "SELECT `col1` AS `alias1`, count(*) AS n FROM tbl GROUP BY `col1` ORDER BY `alias1`")
    assert(r3.head.schema.fieldNames.toSeq == Seq("alias1", "n"))
  }

  // ---- DateQueryConsistencyTest.java: string vs .asDate() comparisons ----

  test("date column compares against plain strings and .asDate()") {
    val cat = writable(Seq(
      ("Paul", java.sql.Date.valueOf("1952-08-06")),
      ("Jane", java.sql.Date.valueOf("1952-08-07")),
      ("Old", java.sql.Date.valueOf("1950-01-01"))).toDF("name", "birthDate"), "person")
    assert(q(cat, "SELECT name FROM person WHERE birthDate = '1952-08-06'")(0)
      .getString(0) == "Paul")
    assert(q(cat, "SELECT name FROM person WHERE birthDate = '1952-08-06'.asDate()")(0)
      .getString(0) == "Paul")
    assert(q(cat, "SELECT name FROM person WHERE birthDate > '1952-08-05'.asDate()").length == 2)
  }

  // ---- SelectStatementExecutionTest selectNoTarget* ----

  test("target-less SELECT evaluates projections once (with SKIP/LIMIT)") {
    val cat = graft.schema.TypeCatalog.fresh()
    val r = q(cat, "SELECT 1 AS one, 2 AS two, 3 AS three")
    assert(r.length == 1)
    assert((r(0).getAs[Number]("one").longValue, r(0).getAs[Number]("two").longValue,
      r(0).getAs[Number]("three").longValue) == (1L, 2L, 3L))
    assert(q(cat, "SELECT 1 AS one SKIP 1").isEmpty)
    assert(q(cat, "SELECT 1 AS one LIMIT 0").isEmpty)
    assert(q(cat, "SELECT 1 AS one LIMIT 1").length == 1)
    assert(q(cat, "SELECT if((true = true), 1, 2) AS v")(0)
      .getAs[Number]("v").longValue == 1L) // issue #3878 shape
  }

  // ---- SelectStatementExecutionTest unicodeEscapeSequences ----

  test("unicode escape sequences in string literals") {
    val cat = graft.schema.TypeCatalog.fresh()
    assert(q(cat, "SELECT '\\u0026' AS amp")(0).getString(0) == "&")
    assert(q(cat, "SELECT '\\u0048\\u0065\\u006C\\u006C\\u006F' AS hello")(0)
      .getString(0) == "Hello")
  }

  // ---- SelectStatementExecutionTest isDefined/isNotDefined ----

  test("IS DEFINED / IS NOT DEFINED (columnar approximation: non-null)") {
    val cat = writable(Seq[(String, String)](
      ("Foo", null), (null, "Bar"), (null, "Barz")).toDF("name", "sur"), "t")
    assert(q(cat, "SELECT sur FROM t WHERE name IS DEFINED").length == 1)
    assert(q(cat, "SELECT sur FROM t WHERE name IS NOT DEFINED").length == 2)
  }

  // ---- SelectStatementExecutionTest exclude() ----

  test("SELECT *, !surname excludes the column from the star projection") {
    val cat = writable(Seq(("foo", "bar")).toDF("name", "surname"), "t")
    val r = q(cat, "SELECT *, !surname FROM t")
    assert(r.length == 1)
    assert(r(0).schema.fieldNames.contains("name"))
    assert(!r(0).schema.fieldNames.contains("surname"))
    assert(r(0).getAs[String]("name") == "foo")
  }

  // ---- SelectStatementExecutionTest orderByLet ----

  test("ORDER BY a LET-bound expression") {
    val cat = writable(Seq("abbb", "baaa").toDF("name"), "t")
    val r = q(cat, "SELECT name FROM t LET $order = name.substring(1) ORDER BY $order ASC LIMIT 1")
    assert(r.length == 1 && r(0).getString(0) == "baaa", r.mkString("|"))
  }

  // ---- FromAliasTest.java-style: alias-qualified projections survive ----

  test("GROUP BY key aliasing keeps aggregate totals (AggregateProjection*)") {
    // AggregateProjectionCalculationStepTest semantics: non-agg key + agg
    val cat = writable(Seq(("x", 1L), ("x", 2L), ("y", 3L)).toDF("k", "n"), "t")
    val rows = q(cat, "SELECT k AS kk, sum(n) AS s FROM t GROUP BY k ORDER BY kk")
    assert(rows.map(r => (r.getString(0), r.getAs[Number](1).longValue)).toSeq ==
      Seq(("x", 3L), ("y", 3L)))
  }

  // ================= conformance batch 4 (round 10) =================

  // ---- OrderByWithNullsTest.java (issue #2692) ----

  test("ORDER BY returns null-valued rows: NULLS FIRST on ASC, LAST on DESC") {
    val cat = writable(Seq(Option(1L), Option(2L), None).toDF("num"), "doc")
    val asc = q(cat, "SELECT num FROM doc ORDER BY num ASC")
    assert(asc.length == 3, "ORDER BY must not drop null-valued rows")
    assert(asc.head.isNullAt(0) && asc.last.getLong(0) == 2L)
    val desc = q(cat, "SELECT num FROM doc ORDER BY num DESC")
    assert(desc.length == 3)
    assert(desc.last.isNullAt(0) && desc.head.getLong(0) == 2L)
  }

  // ---- OrderByNonComparableTest.java ----

  test("ORDER BY a list property is deterministic and direction-aware") {
    val cat = writable(Seq(
      ("x", Seq("b")), ("y", Seq("a")), ("z", Seq("c"))).toDF("id", "tags"), "doc")
    val asc = q(cat, "SELECT id FROM doc ORDER BY tags ASC").map(_.getString(0)).toSeq
    assert(asc == Seq("y", "x", "z"), asc.mkString("|"))
    val desc = q(cat, "SELECT id FROM doc ORDER BY tags DESC").map(_.getString(0)).toSeq
    assert(desc == asc.reverse, desc.mkString("|"))
  }

  // ---- NullInConditionTest.java (issue #4591) ----

  test("IN/NOT IN with a NULL literal in the list follow 3VL") {
    val cat = writable(Seq(1L, 2L, 3L, 4L, 5L).toDF("v"), "num")
    assert(q(cat, "SELECT v FROM num WHERE v IN (1, 2, null) ORDER BY v")
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(q(cat, "SELECT v FROM num WHERE v NOT IN (1, 2, null)").isEmpty)
    assert(q(cat, "SELECT v FROM num WHERE NOT (v IN (1, 2, null))").isEmpty)
    assert(q(cat, "SELECT v FROM num WHERE v NOT IN (1, 2) ORDER BY v")
      .map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
  }

  // ---- LetDivisionBugTest.java: / is value-preserving (7/2 = 3.5) ----

  test("division chain through LET matches the parenthesized product form") {
    val cat = writable(Seq(1L).toDF("x"), "t")
    val r = q(cat,
      "SELECT $val2/$val1 AS ratio FROM t LET $val1 = 1/1000/3600/24/365, $val2 = 1/(1000*3600*24*365)")
    assert(math.abs(r(0).getAs[Number]("ratio").doubleValue - 1.0) < 1e-4,
      r.mkString("|"))
    val d = q(cat, "SELECT 7/2 AS h FROM t")
    assert(math.abs(d(0).getAs[Number]("h").doubleValue - 3.5) < 1e-12)
  }

  // ---- FromAliasTest.java: FROM <type> [AS] <alias> parses and runs ----

  test("FROM alias with and without AS") {
    val cat = writable(Seq(("John", 30L), ("Jane", 25L)).toDF("name", "age"), "v")
    val r1 = q(cat, "SELECT name, age FROM v AS v1 WHERE age > 25")
    assert(r1.length == 1 && r1(0).getString(0) == "John")
    val r2 = q(cat, "SELECT name, age FROM v v2 WHERE name = 'Jane'")
    assert(r2.length == 1 && r2(0).getAs[Number]("age").longValue == 25L)
  }

  // ---- InsertReturnTest.java: INSERT ... RETURN @this ----

  test("INSERT SET ... RETURN @this returns the inserted record") {
    val cat = writable(Seq(("seed", 1L)).toDF("name", "n"), "t")
    val r = stmt(cat, "INSERT INTO t SET name = 'test1', n = 9 RETURN @this")
    assert(r.length == 1, r.mkString("|"))
    assert(r(0).getAs[String]("name") == "test1")
    assert(q(cat, "SELECT name FROM t WHERE n = 9").length == 1)
  }

  // ---- MethodCallClassCastTest.java: method calls in LET subquery ORDER BY
  //      + UNIONALL of LET result sets + expand ----

  test("expand(unionall($a, $b)) over LET subqueries with method-call ORDER BY") {
    val cat = writable(Seq(("Hello World", 1L), ("Test Data", 2L)).toDF("name", "value"), "doca")
    val r = q(cat,
      "SELECT expand($c) LET " +
        "$a = (SELECT name FROM doca ORDER BY name.toLowerCase() ASC), " +
        "$b = (SELECT name FROM doca WHERE value = 1), " +
        "$c = unionall($a, $b)")
    // 2 sorted rows from $a then 1 from $b, expanded to rows
    assert(r.length == 3, r.mkString("|"))
    assert(r.map(_.getAs[String]("name")).toSeq == Seq("Hello World", "Test Data", "Hello World"))
  }

  // ================= conformance batch 5 (round 10) =================

  private def script(cat: graft.schema.TypeCatalog, text: String): Array[Row] =
    graft.sql.Script.run(TestSession.spark, sfDir, text, cat).collect()

  // ---- WhileBlockExecutionTest.java ----

  test("WHILE block loops on a LET counter") {
    val cat = writable(Seq.empty[Tuple1[Long]].toDF("value"), "t")
    val rows = script(cat,
      """LET $i = 0;
        |WHILE ($i < 3){
        |  insert into t set value = $i;
        |  LET $i = $i + 1;
        |}
        |SELECT value FROM t ORDER BY value;""".stripMargin)
    assert(rows.map(_.getAs[Number]("value").longValue).toSeq == Seq(0L, 1L, 2L))
  }

  // ---- MatchesConditionTest.java ----

  test("MATCHES accepts per-row column patterns and dotted literal regexes") {
    val cat = writable(Seq(
      ("Aardvark", "Aa.*"), ("BBking", "BB.*"),
      ("BBking", "Aa.*"), ("Aardvark", "BB.*")).toDF("name", "pattern"), "item")
    // each row's name against its OWN pattern — only the two aligned rows
    val own = q(cat, "SELECT name, pattern FROM item WHERE name MATCHES pattern ORDER BY name")
    assert(own.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("Aardvark", "Aa.*"), ("BBking", "BB.*")))
    // a literal regex full of dots is a regex, never a property path
    val dotted = q(cat, "SELECT name FROM item WHERE name MATCHES '.*.*'")
    assert(dotted.length == 4)
  }

  // ---- SQLCaseTest.java ----

  test("CASE without ELSE yields null; extended CASE dispatches on the operand") {
    val cat = writable(Seq(
      ("Alice", 30L, "active"), ("Bob", 8L, "inactive"), ("Carol", 70L, "pending"))
      .toDF("name", "age", "status"), "person")
    val noElse = q(cat,
      "SELECT name, CASE WHEN age < 10 THEN 'child' WHEN age < 13 THEN 'preteen' END AS category " +
        "FROM person ORDER BY name")
    assert(noElse.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, Some("child"), None))
    val extended = q(cat,
      "SELECT name, CASE status WHEN 'active' THEN 1 WHEN 'inactive' THEN 0 ELSE -1 END AS code " +
        "FROM person ORDER BY name")
    assert(extended.map(_.getAs[Number]("code").longValue).toSeq == Seq(1L, 0L, -1L))
  }

  // ---- InsertContentEmptyArrayTest.java (issue #2497) ----

  test("INSERT CONTENT with empty arrays does not throw") {
    val cat = writable(Seq(Tuple1("seed")).toDF("name"), "dce")
    stmt(cat,
      """INSERT INTO dce CONTENT {"name":"test","emptyArray1":[],"data":[1,2,3],"anotherEmpty":[]}""")
    val r = q(cat, "SELECT name, data FROM dce WHERE name = 'test'")
    assert(r.length == 1)
    assert(r(0).getSeq[Long](1).map(_.toLong) == Seq(1L, 2L, 3L))
  }

  // ---- Issue4915Test.java: $var["key"] bracket access in script LET ----

  test("bracket notation with a string key on a LET-bound map (issue #4915)") {
    val cat = writable(Seq(("seed", "s")).toDF("key", "value"), "yolo")
    val viaSet = script(cat,
      """BEGIN;
        |LET $test = {"name":"1","value":"2"};
        |LET $inserted = INSERT INTO yolo SET key="name", value=$test["name"];
        |COMMIT;
        |SELECT key, value FROM yolo WHERE key = 'name';""".stripMargin)
    assert(viaSet.length == 1)
    assert(viaSet(0).getAs[String]("value") == "1")
  }

  // ---- OrderByDirectionParameterTest.java: boolean direction ----

  test("ORDER BY expr true/false maps to ASC/DESC") {
    val cat = writable(Seq(2L, 0L, 1L).toDF("num"), "t")
    assert(q(cat, "SELECT num FROM t ORDER BY num true")
      .map(_.getAs[Number]("num").longValue).toSeq == Seq(0L, 1L, 2L))
    assert(q(cat, "SELECT num FROM t ORDER BY num false")
      .map(_.getAs[Number]("num").longValue).toSeq == Seq(2L, 1L, 0L))
  }

  // ---- method/string + collection + conversion batch (reference
  //      method/string/SQLMethod*Test.java, method/collection/*Test.java,
  //      method/misc/SQLMethodInclude/ExcludeTest.java) ----

  test("string methods: capitalize, normalize, trimPrefix/trimSuffix") {
    val cat = writable(Seq(
      ("capitalize this", "C\u00f4te d'Ivoire", "pre-body", "body.post"))
      .toDF("a", "b", "c", "d"), "t")
    val r = q(cat,
      "SELECT a.capitalize() AS cap, b.normalize() AS norm, " +
        "c.trimPrefix('pre-') AS tp, c.trimPrefix('nope') AS tpMiss, " +
        "d.trimSuffix('.post') AS tsf FROM t")(0)
    assert(r.getAs[String]("cap") == "Capitalize This")
    assert(r.getAs[String]("norm") == "Cote d'Ivoire")
    assert(r.getAs[String]("tp") == "body" && r.getAs[String]("tpMiss") == "pre-body")
    assert(r.getAs[String]("tsf") == "body")
  }

  test("collection methods: sort, transform, join, asSet") {
    val cat = writable(Seq(Tuple1(Seq("z", "A", "b"))).toDF("xs"), "t")
    val r = q(cat,
      "SELECT xs.sort() AS s, xs.sort(false) AS sd, " +
        "xs.transform('toLowerCase') AS lo, xs.join('-') AS j, " +
        "xs.transform('toLowerCase').asSet() AS st FROM t")(0)
    assert(r.getSeq[String](0) == Seq("A", "b", "z"))   // case-sensitive order (reference)
    assert(r.getSeq[String](1) == Seq("z", "b", "A"))
    assert(r.getSeq[String](2) == Seq("z", "a", "b"))
    assert(r.getAs[String]("j") == "z-A-b")
    assert(r.getSeq[String](4) == Seq("a", "b", "z"))
  }

  test("map methods: keys, values, field, include, exclude") {
    val cat = writable(Seq(Tuple1(Map("a" -> 1L, "b" -> 2L, "c" -> 3L))).toDF("m"), "t")
    val r = q(cat,
      "SELECT m.keys() AS ks, m.values() AS vs, m.field('b') AS f, " +
        "m.include('a', 'c') AS inc, m.exclude('a') AS exc FROM t")(0)
    assert(r.getSeq[String](0).sorted == Seq("a", "b", "c"))
    assert(r.getSeq[Long](1).sorted == Seq(1L, 2L, 3L))
    assert(r.getAs[Number]("f").longValue == 2L)
    assert(r.getMap[String, Long](3).keySet == Set("a", "c"))
    assert(r.getMap[String, Long](4).keySet == Set("b", "c"))
  }

  test("conversion methods: asBoolean, asLong, asByte, asShort") {
    val cat = writable(Seq(("true", "42")).toDF("b", "n"), "t")
    val r = q(cat,
      "SELECT b.asBoolean() AS bb, n.asLong() AS nl, n.asByte() AS nb, n.asShort() AS ns FROM t")(0)
    assert(r.getBoolean(0) && r.getLong(1) == 42L)
    assert(r.getByte(2) == 42.toByte && r.getShort(3) == 42.toShort)
  }

  // ---- QueryTest.java: -- comments mid-statement, <=> null-safe equals ----

  test("-- line comments and <=> null-safe equality") {
    val cat = writable(Seq[(String, java.lang.Long)](
      ("a", 1L), ("b", null)).toDF("name", "x"), "v")
    val commented = q(cat,
      "SELECT name\n-- this is a comment\nFROM v ORDER BY name")
    assert(commented.map(_.getString(0)).toSeq == Seq("a", "b"))
    // x <=> null keeps exactly the null row; x = null keeps none (3VL)
    assert(q(cat, "SELECT name FROM v WHERE x <=> null").map(_.getString(0)).toSeq == Seq("b"))
    assert(q(cat, "SELECT name FROM v WHERE x = null").isEmpty)
    // a property that never existed is null-safe-equal to null too
    assert(q(cat, "SELECT name FROM v WHERE x <=> 1").map(_.getString(0)).toSeq == Seq("a"))
  }

  // ================= conformance batch 6 (round 10) =================

  // ---- SQLScriptTest.returnObject / incrementAndLet / semicolonInString ----

  test("script RETURN of a list of maps yields one row per map") {
    val cat = writable(Seq(Tuple1(1L)).toDF("x"), "t")
    val r = script(cat, "return [{ a: 'b' }]")
    assert(r.length == 1 && r(0).getAs[String]("a") == "b")
    val r2 = script(cat, "return [{ a: 'x', n: 1 }, { a: 'y', n: 2 }]")
    assert(r2.map(_.getAs[String]("a")).toSeq == Seq("x", "y"))
    // keys missing from some elements null-fill (unionByName parity)
    val r3 = script(cat, "return [{ a: 'x' }, { b: 2 }]")
    assert(r3.length == 2 && r3(0).getAs[String]("a") == "x" && r3(0).isNullAt(1)
      && r3(1).isNullAt(0) && r3(1).getAs[Number]("b").longValue == 2L)
  }

  test("script RETURN of a LARGE list builds one localized relation, not an n-way union") {
    // 800 elements through the list-return path: the former per-element
    // unionByName fold took minutes of analysis here; the inline(array…)
    // relation is sub-second
    val cat = writable(Seq(Tuple1(1L)).toDF("x"), "t")
    val n = 800
    val sql = "return [" + (1 to n).map(i => s"{ i: $i, s: 'v$i' }").mkString(", ") + "]"
    val t0 = System.nanoTime()
    val r = script(cat, sql)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.length == n)
    assert(r.map(_.getAs[Number]("i").longValue).toSeq == (1L to n.toLong))
    assert(secs < 30, s"large list RETURN took ${secs}s — union fold regression?")
  }

  test("SET weight += over a LET-bound count with indexed access") {
    val cat = writable(Seq.empty[Tuple1[Long]].toDF("weight"), "counter")
    val r = script(cat,
      """INSERT INTO counter SET weight = 3;
        |LET $c = SELECT count(*) AS count FROM counter;
        |UPDATE counter SET weight += $c[0].count RETURN AFTER @this;""".stripMargin)
    assert(r.length == 1, r.mkString("|"))
    assert(r(0).getAs[Number]("weight").longValue == 4L)
  }

  test("semicolons and quotes inside string literals do not split script statements") {
    val cat = writable(Seq(Tuple1("seed")).toDF("regexp"), "qr")
    val one = script(cat, "let $a = 1;\nreturn 'foo ; bar'")
    assert(one(0).getString(0) == "foo ; bar")
    script(cat, "INSERT INTO qr SET regexp=\"'';\"")
    assert(q(cat, "SELECT regexp FROM qr WHERE regexp <> 'seed'")(0).getString(0) == "'';")
  }

  test("script LET .asJSON() renders the bound result") {
    val cat = writable(Seq(("a", 1L)).toDF("name", "v"), "t")
    val j = script(cat,
      """let $a = select name, v from t;
        |return $a.asJSON();""".stripMargin)(0).getString(0)
    assert(j.contains("\"name\":\"a\"") && j.contains("\"v\":1"), j)
  }

  // ---- SQLExecutorAdditionalCoverageTest: UNWIND clause, projection
  //      subquery, derived table ----

  test("UNWIND clause, scalar subquery in projection, derived-table FROM") {
    val cat = writable(Seq(
      ("n0", Seq("a", "b", "c"), 0L), ("n1", Seq("d"), 1L)).toDF("name", "tags", "idx"), "v1")
    val un = q(cat, "SELECT name, tags FROM v1 WHERE idx = 0 UNWIND tags")
    assert(un.length == 3 && un.forall(_.getString(1) != null))
    val sub = q(cat, "SELECT name, (SELECT count(*) FROM v1) AS cnt FROM v1 WHERE idx = 0")
    assert(sub.length == 1 && sub(0).getAs[Number]("cnt").longValue == 2L)
    val derived = q(cat, "SELECT FROM (SELECT FROM v1 WHERE idx < 5)")
    assert(derived.length == 2)
  }

  // ---- SubQueryStepTest.java: correlated scalar subquery in projection ----

  test("correlated subquery via $parent.current rewrites to a per-row aggregate") {
    val cat = writable((0 until 10).map(i => (i * 100L, "pending")).toDF("amount", "status"), "ord")
    val rows = q(cat,
      "SELECT amount, (SELECT count(*) FROM ord WHERE amount > $parent.current.amount) AS higherCount " +
        "FROM ord WHERE amount < 500 ORDER BY amount")
    assert(rows.length == 5, rows.mkString("|"))
    // amount=0 -> 9 rows higher ... amount=400 -> 5
    assert(rows.map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSeq ==
      Seq((0L, 9L), (100L, 8L), (200L, 7L), (300L, 6L), (400L, 5L)))
    // a no-match row aggregates to 0, not 1 (left-join null row must not count)
    val none = q(cat,
      "SELECT amount, (SELECT count(*) FROM ord WHERE amount > $parent.current.amount) AS higherCount " +
        "FROM ord WHERE amount = 900")
    assert(none.length == 1 && none(0).getAs[Number](1).longValue == 0L)
  }

  // ================= conformance batch 7 (round 11) =================
  // mined from SelectStatementExecutionTest.java — 8 divergences found
  // (string `+`, $parent.$current LETs, `...` slice, condition selectors,
  // literal-with-aggregate projection, nested-distinct error message)

  test("string + concatenates; null side passes through (MathExpression PLUS)") {
    // SelectStatementExecutionTest.let4: LET $ns = name + ' ' + surname
    val cat = writable(Seq(("n1", "s1"), ("n2", "s2")).toDF("name", "surname"), "l4")
    val rows = q(cat,
      "SELECT name, surname, $ns AS fullname FROM l4 LET $ns = name + ' ' + surname ORDER BY name")
    assert(rows.map(_.getAs[String]("fullname")).toSeq == Seq("n1 s1", "n2 s2"))
    // null + string -> the string (reference PLUS Object apply)
    val cat2 = writable(Seq(("a", null: String), (null: String, "b")).toDF("x", "y"), "pn")
    val r2 = q(cat2, "SELECT x + y AS c FROM pn ORDER BY c")
    assert(r2.map(_.getAs[String]("c")).toSeq == Seq("a", "b"))
    // numeric + stays arithmetic
    val cat3 = writable(Seq((1L, 2L)).toDF("a", "b"), "nn")
    assert(q(cat3, "SELECT a + b AS s FROM nn")(0).getAs[Number]("s").longValue == 3L)
    // list + list concatenates, list + scalar appends
    val cat4 = writable(Seq((Seq(1L, 2L), Seq(3L))).toDF("l1", "l2"), "ll")
    assert(q(cat4, "SELECT l1 + l2 AS c FROM ll")(0).getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(q(cat4, "SELECT l1 + 9 AS c FROM ll")(0).getSeq[Long](0) == Seq(1L, 2L, 9L))
  }

  test("correlated LET subquery binds a per-row collection ($parent.$current — let6/let7)") {
    val cat = writable(Seq(("n1", "s1"), ("n2", "s2"), ("n3", "s3")).toDF("name", "surname"), "l6")
    // let6: the variable projects as a COLLECTION per row
    val rows = q(cat,
      "SELECT $foo AS nm FROM l6 LET $foo = (SELECT name FROM l6 WHERE name = $parent.$current.name)")
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Row](0).length == 1))
    // let7: $foo[0].name drills into the first element as a scalar
    val r7 = q(cat,
      "SELECT $bar AS nm FROM l6 LET $foo = (SELECT name FROM l6 WHERE name = $parent.$current.name), " +
        "$bar = $foo[0].name ORDER BY nm")
    assert(r7.map(_.getString(0)).toSeq == Seq("n1", "n2", "n3"))
  }

  test("[lo..hi] is end-exclusive, [lo...hi] is end-inclusive (range/ellipsis)") {
    val cat = writable(Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("name"), "sl")
    assert(q(cat, "SELECT name[0..3] AS names FROM sl")(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(q(cat, "SELECT name[0...2] AS names FROM sl")(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(q(cat, "SELECT name[1...3] AS names FROM sl")(0).getSeq[String](0) == Seq("b", "c", "d"))
  }

  test("condition selectors filter elements: [=v], [<v], [LIKE p], [in [..]]") {
    // SelectStatementExecutionTest.simpleCollectionFiltering
    val cat = writable(Seq(Tuple1(Seq("foo", "bar", "baz"))).toDF("coll"), "cs")
    assert(q(cat, "SELECT coll[='foo'] AS f FROM cs")(0).getSeq[String](0) == Seq("foo"))
    assert(q(cat, "SELECT coll[<'ccc'] AS f FROM cs")(0).getSeq[String](0) == Seq("bar", "baz"))
    assert(q(cat, "SELECT coll[LIKE 'ba%'] AS f FROM cs")(0).getSeq[String](0) == Seq("bar", "baz"))
    assert(q(cat, "SELECT coll[in ['bar']] AS f FROM cs")(0).getSeq[String](0) == Seq("bar"))
  }

  test("count(*) with a literal projection on an empty type returns one row") {
    // countStarWithLiteralProjectionOnEmptyType (issue #3585)
    val cat = writable(Seq.empty[(String, Long)].toDF("name", "v"), "emptyt")
    val rows = q(cat, "SELECT count(*) AS cnt, 2 AS two FROM emptyt")
    assert(rows.length == 1)
    assert(rows(0).getAs[Number]("cnt").longValue == 0L && rows(0).getAs[Number]("two").intValue == 2)
    // a bare field mixed with an aggregate still errors (aggregateMixedWithNonAggregate)
    val cat2 = writable(Seq(("a", 1L)).toDF("f", "a"), "mx")
    intercept[Exception] { q(cat2, "SELECT max(a) + f AS foo FROM mx") }
  }

  // ================= conformance batch 8 (round 11) =================
  // mined from GroupByExecutionTest / IfStatementExecutionTest /
  // ScriptExecutionTest / UnwindStepAliasingTest /
  // LetWherePredicatePushdownTest — 8 more divergences fixed

  test("GROUP BY with no aggregate projection returns distinct keys") {
    // GroupByExecutionTest.groupByRepeatedExecutionUsesCachedPlanCorrectly
    val cat = writable(Seq("a", "a", "b").toDF("tag"), "tags")
    val rows = q(cat, "SELECT tag FROM tags GROUP BY tag")
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // and repeated execution through the statement cache stays grouped
    assert(q(cat, "SELECT tag FROM tags GROUP BY tag").length == 2)
  }

  test("standalone IF statement runs through the single-statement dialect") {
    // IfStatementExecutionTest positive/negative/ifReturn
    val cat = writable(Seq(1L).toDF("x"), "d1")
    val pos = stmt(cat, "if(1=1){ select 1 as a; }")
    assert(pos.length == 1 && pos(0).getAs[Number]("a").intValue == 1)
    assert(stmt(cat, "if(1=2){ select 1 as a; }").isEmpty)
    val ret = stmt(cat, "if(1=1){ return 'yes'; }")
    assert(ret.length == 1 && ret(0).getAs[String]("value") == "yes")
  }

  test("bare RETURN; stops the script; $1.size()/[0].count read the result set") {
    // ScriptExecutionTest.returnInIf/returnInIf2/returnInIf3
    val cat = writable(Seq(("seed", 1L)).toDF("name", "v"), "tri")
    graft.sql.Script.run(spark, sfDir,
      """INSERT INTO tri SET name = 'foo';
        |LET $1 = SELECT count(*) as count FROM tri WHERE name ='foo';
        |IF($1.size() = 0 OR $1[0].count = 0){
        |    INSERT INTO tri SET name = 'bar';
        |    RETURN;
        |}
        |INSERT INTO tri SET name = 'baz';""".stripMargin, cat).collect()
    // count=1 -> the IF is false -> 'baz' inserted, 'bar' not
    val names = q(cat, "SELECT name FROM tri ORDER BY name").map(_.getString(0)).toSeq
    assert(names == Seq("baz", "foo", "seed"), names.mkString(","))
    val ok = graft.sql.Script.run(spark, sfDir,
      """LET $1 = SELECT count(*) as count FROM tri WHERE name ='foo';
        |IF($1.size() > 0 ){ RETURN 'OK'; }
        |RETURN 'FAIL';""".stripMargin, cat).collect()
    assert(ok.length == 1 && ok(0).getString(0) == "OK")
  }

  test("a bare function call is a script statement (column 'result'); single sql rejects it") {
    // ScriptExecutionTest.functionAsStatement
    val cat = writable(Seq(1L).toDF("x"), "d4")
    val r = graft.sql.Script.run(spark, sfDir, "sqrt(64);", cat).collect()
    assert(r.length == 1 && r(0).schema.fieldNames.toSeq == Seq("result"))
    assert(r(0).getAs[Number]("result").doubleValue == 8.0)
    intercept[Exception] { stmt(cat, "sqrt(64)") }
  }

  test("DELETE FROM $x deletes the LET-bound record set (issue #3871)") {
    val cat = writable(Seq("a", "b").toDF("name"), "ddel")
    graft.sql.Script.run(spark, sfDir,
      """LET $x = SELECT name FROM ddel;
        |DELETE FROM $x;""".stripMargin, cat).collect()
    assert(q(cat, "SELECT count(*) AS c FROM ddel")(0).getLong(0) == 0L)
  }

  test("UNWIND: null/empty forwards one row with null; scalar forwards unchanged") {
    // UnwindStepAliasingTest (issue #4593) + UnwindStep.unwind semantics
    val cat = writable(Seq((1L, Seq("a")), (2L, null), (3L, Seq.empty[String]))
      .toDF("id", "tags"), "un")
    val rows = q(cat, "SELECT id, tags FROM un UNWIND tags ORDER BY id")
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, null), (3L, null)))
    val cat2 = writable(Seq((1L, "value")).toDF("id", "single"), "us")
    val sc = q(cat2, "SELECT id, single FROM us UNWIND single")
    assert(sc.length == 1 && sc(0).getString(1) == "value")
  }

  test("LET variable in WHERE is computed per row, not pushed into the fetch") {
    // LetWherePredicatePushdownTest
    val cat = writable(Seq(5L, 15L, 25L).toDF("value"), "td")
    val rows = q(cat,
      "SELECT value, $doubled AS doubled FROM td LET $doubled = (value * 2) WHERE $doubled < 20")
    assert(rows.length == 1 && rows(0).getLong(0) == 5L && rows(0).getLong(1) == 10L)
    val cat2 = writable(Seq(("A", 0.9), ("B", 0.5), ("C", 0.2)).toDF("name", "score"), "sd")
    val ordered = q(cat2,
      "SELECT name, $dist AS distance FROM sd LET $dist = (1 - score) WHERE $dist < 0.6 ORDER BY $dist")
    assert(ordered.map(_.getString(0)).toSeq == Seq("A", "B"))
  }

  test("IF body referencing a nonexistent type is not planned unless taken") {
    // ScriptExecutionTest.lazyExecutionPlanning
    val cat = writable(Seq(1L).toDF("x"), "d6")
    val r = graft.sql.Script.run(spark, sfDir,
      """LET $1 = SELECT FROM (select from schema:types) where name = 'nonExistingClass';
        |IF($1.size() > 0) {
        |    SELECT FROM nonExistingClass;
        |    RETURN 'FAIL';
        |}
        |RETURN 'OK';""".stripMargin, cat).collect()
    assert(r.length == 1 && r(0).getString(0) == "OK")
  }

  // ================= conformance batch 9 (round 11) =================
  // mined from method/SQLMethodAdditionalCoverageTest.java +
  // MethodArgumentValidationRegressionTest.java — 13 missing methods
  // added, charAt bounds semantics fixed

  private def one(sql: String): Row =
    q(graft.schema.TypeCatalog.fresh(), sql)(0)

  test("string method tail: lastIndexOf/format/hash/ifNull/ifEmpty/size") {
    assert(one("SELECT 'hello world hello'.lastIndexOf('hello') AS r").getAs[Number](0).intValue == 12)
    assert(one("SELECT 'xyz'.lastIndexOf('q') AS r").getAs[Number](0).intValue == -1)
    assert(one("SELECT 'bob'.format('Name: %s') AS r").getString(0) == "Name: bob")
    assert(one("SELECT 'hello'.hash('MD5') AS r").getString(0) == "5d41402abc4b2a76b9719d911017c592")
    // default algorithm is SHA-256 (SQLMethodHash.java:39)
    assert(one("SELECT 'hello'.hash() AS r").getString(0) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(one("SELECT (null).ifNull('default') AS r").getString(0) == "default")
    assert(one("SELECT 'value'.ifNull('default') AS r").getString(0) == "value")
    assert(one("SELECT ''.ifEmpty('default') AS r").getString(0) == "default")
    assert(one("SELECT 'value'.ifEmpty('default') AS r").getString(0) == "value")
    assert(one("SELECT 'hello'.size() AS r").getAs[Number](0).intValue == 5)
  }

  test("charAt: negative or out-of-range index returns null, never throws") {
    // MethodArgumentValidationRegressionTest
    assert(one("SELECT 'abcdef'.charAt(-1) AS r").isNullAt(0))
    assert(one("SELECT 'abcdef'.charAt(99) AS r").isNullAt(0))
    assert(one("SELECT 'abcdef'.charAt(1) AS r").getString(0) == "b")
  }

  test("conversion tail: asDatetime/convert/asList; type()/javaType()/precision()") {
    assert(one("SELECT '2024-01-15 12:30:00'.asDatetime() AS r").getTimestamp(0) != null)
    assert(one("SELECT '42'.convert('INTEGER') AS r").getAs[Number](0).longValue == 42L)
    assert(one("SELECT [1, 2, 3].asList() AS r").getSeq[Long](0).length == 3)
    assert(one("SELECT (7).asList() AS r").getSeq[Long](0) == Seq(7L))
    assert(one("SELECT 'abc'.type() AS r").getString(0) == "STRING")
    assert(one("SELECT (1).type() AS r").getString(0) == "LONG")
    assert(one("SELECT 'abc'.javaType() AS r").getString(0) == "java.lang.String")
    assert(one("SELECT sysdate().precision('millisecond') AS r").get(0) != null)
  }

  test("include/exclude work on embedded documents with *-wildcards") {
    // includeWildcardMatchesCorrectFields / excludeExplicitMetadataField
    val inc = one("SELECT {'name':'x','idx':1,'amount':2}.include('na*') AS r")
    assert(inc.getStruct(0).schema.fieldNames.toSeq == Seq("name"))
    val exc = one("SELECT {'name':'x','idx':1}.exclude('idx') AS r")
    assert(exc.getStruct(0).schema.fieldNames.toSeq == Seq("name"))
  }

  test("TIMEOUT clause parses; positional ? and named :p parameters bind") {
    // SQLExecutorAdditionalCoverageTest.selectWithTimeout +
    // SelectStatementExecutionTest selectFromStringParam/namedParams
    val cat = writable(Seq(("v1_3", 3L), ("v1_4", 4L)).toDF("name", "idx"), "v1")
    assert(q(cat, "SELECT FROM v1 TIMEOUT 10000").length == 2)
    assert(q(cat, "SELECT FROM v1 WHERE idx < 10 LIMIT 5 TIMEOUT 500 EXCEPTION").length == 2)
    val pos = GraftSql.query(spark, sfDir,
      "SELECT name FROM v1 WHERE idx = ? AND name = ?", cat, Seq(3, "v1_3")).collect()
    assert(pos.length == 1 && pos(0).getString(0) == "v1_3")
    val named = GraftSql.query(spark, sfDir,
      "SELECT name FROM v1 WHERE idx = :i", cat, Map[String, Any]("i" -> 4)).collect()
    assert(named.length == 1 && named(0).getString(0) == "v1_4")
    // a map literal's colon is NOT a parameter opener
    val m = GraftSql.query(spark, sfDir,
      "SELECT {'i': 9} AS m FROM v1 WHERE idx = :i", cat, Map[String, Any]("i" -> 3)).collect()
    assert(m.length == 1 && m(0).getStruct(0).getAs[Number]("i").intValue == 9)
    // different parameters on the same text never share a cached plan
    val again = GraftSql.query(spark, sfDir,
      "SELECT name FROM v1 WHERE idx = :i", cat, Map[String, Any]("i" -> 3)).collect()
    assert(again(0).getString(0) == "v1_3")
  }

  test("UPDATE MERGE json/:payload map; DML parameters splice safely") {
    // UpdateMergeTest + InsertStatementExecutionTest issue #3212
    val cat = writable(Seq(("John", "x")).toDF("name", "status"), "vm")
    stmt(cat, "UPDATE vm MERGE { \"status\": \"active\", \"email\": \"j@x.com\" } WHERE name = 'John'")
    val r = q(cat, "SELECT name, status, email FROM vm")(0)
    assert(r.getString(1) == "active" && r.getString(2) == "j@x.com")
    GraftSql.statement(spark, sfDir, "UPDATE vm MERGE :payload WHERE name = :n", cat,
      Map[String, Any]("payload" -> Map("status" -> "archived"), "n" -> "John")).collect()
    assert(q(cat, "SELECT status FROM vm")(0).getString(0) == "archived")
    // non-string map keys are rejected (updateMergeWithNonStringKeyMapFails)
    intercept[Exception] {
      GraftSql.statement(spark, sfDir, "UPDATE vm MERGE :p WHERE name = 'John'", cat,
        Map[String, Any]("p" -> Map(1 -> "x"))).collect()
    }
    // keyword property names + named params through INSERT (issue #3212)
    val cat2 = writable(Seq(("seed", "xx")).toDF("hash", "language"), "kw")
    GraftSql.statement(spark, sfDir,
      "INSERT INTO kw SET hash = :hash, language = :language", cat2,
      Map[String, Any]("hash" -> "def", "language" -> "fr")).collect()
    assert(q(cat2, "SELECT count(*) AS c FROM kw")(0).getLong(0) == 2L)
    // positional DML params; a quote inside a string parameter stays data
    val cat3 = writable(Seq(("a", 1L)).toDF("name", "v"), "pp")
    GraftSql.statement(spark, sfDir, "UPDATE pp SET v = ? WHERE name = ?", cat3,
      Seq(42, "a")).collect()
    assert(q(cat3, "SELECT v FROM pp")(0).getLong(0) == 42L)
    GraftSql.statement(spark, sfDir, "INSERT INTO pp SET name = ?, v = 7", cat3,
      Seq("o'brien")).collect()
    assert(q(cat3, "SELECT name FROM pp WHERE v = 7")(0).getString(0) == "o'brien")
  }

  test("nested distinct() raises the reference's actionable error") {
    // distinctFunctionIssue2966: distinct(*)/distinct(x) = whole-projection
    // DISTINCT; any nested use must say so
    val cat = writable(Seq(1L, 2L, 3L, 1L).toDF("x"), "dd")
    assert(q(cat, "SELECT distinct(x) FROM dd").length == 3)
    val e = intercept[Exception] { q(cat, "SELECT first(distinct(x)) FROM dd") }
    assert(e.getMessage.contains("'distinct' is supported only as the whole SELECT projection"))
  }
}
