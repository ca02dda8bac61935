package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Variant
import graft.sql.Ast._

/** Pins that the variant calculus compiles under whole-stage codegen
  * WITHOUT falling back to interpreted execution. Round-8 verdict found
  * 5 silent Janino "is not an rvalue" compile failures on the
  * vType/vProp-over-vIndex dispatch shapes (TCK Graph4 [5], Graph6 [8]);
  * with `spark.sql.codegen.fallback=false` those become hard errors, so
  * these tests fail loudly if the shapes regress. */
class VariantCodegenSpec extends AnyFunSuite {
  import TestSession.spark

  private def litV(e: Expr) = Variant.litCol(Variant.ofLiteral(e).get)

  private def noFallback[A](f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  // the Graph4/Graph6 shape: a rel entity wrapped into a mixed variant
  // list, indexed back out, then type()/property-accessed
  private def relListDf = {
    import spark.implicits._
    val rel = struct(lit(7L).as("_eid"), lit("T").as("label"),
      lit(1L).as("_src"), lit(2L).as("_dst"), lit("x").as("name"))
    val relV = Variant.ofRel(rel, Seq("_eid" -> LongType, "label" -> StringType,
      "_src" -> LongType, "_dst" -> LongType, "name" -> StringType))
    Seq(1, 2, 3).toDF("i")
      .select(col("i"), Variant.ofElems(array(Variant.asElem(relV),
        Variant.asElem(litV(NumLit(1, isIntegral = true))))).as("list"))
  }

  test("type(list[0]) compiles under whole-stage codegen (TCK Graph4 [5] shape)") {
    noFallback {
      val out = relListDf
        .select(Variant.vType(Variant.vIndex(col("list"), lit(0))).as("t"))
        .collect()
      assert(out.map(_.getString(0)).toSeq == Seq("T", "T", "T"))
    }
  }

  test("vProp over vIndex compiles under whole-stage codegen") {
    noFallback {
      // a runtime-indexed element is element-form: props are not
      // recoverable (one-level encoding, guarded by design) — the pin
      // here is that the composed expression COMPILES, not the value.
      // (The TCK Graph6 [8] shape never hits this: literal indices fold
      // at compile time and keep the entity native.)
      val out = relListDf
        .select(Variant.vProp(Variant.vIndex(col("list"), lit(0)), "name")
          .getField("_vtck").as("p"))
        .collect()
      assert(out.map(_.getString(0)).toSeq == Seq("null", "null", "null"))
    }
  }

  test("vProp over an entity variant reads exact-kind props under codegen") {
    noFallback {
      import spark.implicits._
      val rel = struct(lit(7L).as("_eid"), lit("T").as("label"),
        lit(1L).as("_src"), lit(2L).as("_dst"), lit("x").as("name"))
      val relV = Variant.ofRel(rel, Seq("_eid" -> LongType, "label" -> StringType,
        "_src" -> LongType, "_dst" -> LongType, "name" -> StringType))
      val out = Seq(1).toDF("i")
        .select(Variant.vProp(relV, "name").getField("_vtck").as("p"),
          Variant.vProp(relV, "absent").getField("_vtck").as("q"))
        .collect()(0)
      assert(out.getString(0) == "'x'")
      assert(out.getString(1) == "null")
    }
  }

  test("TCK Graph4 [5] / Graph6 [8] queries run end-to-end with codegen fallback disabled") {
    noFallback {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      try {
        val mg = graft.graph.MutableGraph.empty(spark,
          s"/tmp/graft_codegen_spec_${System.nanoTime()}")
        graft.cypher.Cypher.execute(mg, "CREATE ()-[:REL {existing: 42}]->()")
        val t = graft.cypher.Cypher.query(mg.graph,
          "MATCH (a)-[r]->() WITH [r, 1] AS list RETURN type(list[0])").collect()
        assert(t.map(_.getString(0)).toSeq == Seq("REL"))
        val p = graft.cypher.Cypher.query(mg.graph,
          "MATCH ()-[r]->() WITH [123, r] AS list RETURN (list[1]).existing AS e").collect()
        assert(p.map(_.getAs[org.apache.spark.sql.Row](0).getAs[String]("_vtck"))
          .toSeq == Seq("42"))
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("labels/filter/transform dispatch compiles under whole-stage codegen") {
    noFallback {
      import spark.implicits._
      val node = struct(lit(1L).as("id"), lit("A:B").as("label"), lit(3L).as("v"))
      val nodeV = Variant.ofNode(node, Seq("id" -> LongType, "label" -> StringType,
        "v" -> LongType))
      val lst = Variant.ofElems(array(Variant.asElem(litV(NumLit(1, isIntegral = true))),
        Variant.asElem(litV(StrLit("a")))))
      val out = Seq(1).toDF("i").select(
        Variant.vLabels(nodeV).as("ls"),
        Variant.vFilter(lst, e => Variant.rank(e) === Variant.RNum)
          .getField("_vtck").as("f"),
        Variant.vTransform(lst, e => e).getField("_vtck").as("t"))
        .collect()(0)
      assert(out.getSeq[String](0) == Seq("A", "B"))
      assert(out.getString(1) == "[1]")
      assert(out.getString(2) == "[1, 'a']")
    }
  }

  test("quantifiers/membership/slice/compare/arith dispatch compiles under codegen") {
    // the remaining variant dispatch entry points (r9 advice #7): every
    // list-algebra and comparison shape must stay codegen-clean
    noFallback {
      import spark.implicits._
      val lst = Variant.ofElems(array(
        Variant.asElem(litV(NumLit(1, isIntegral = true))),
        Variant.asElem(litV(NumLit(2, isIntegral = true))),
        Variant.asElem(litV(StrLit("a")))))
      val one = litV(NumLit(1, isIntegral = true))
      val two = litV(NumLit(2.0, isIntegral = false))
      val out = Seq(1).toDF("i").select(
        Variant.vQuantifier("any", lst, e => Variant.rank(e) === Variant.RStr).as("anyq"),
        Variant.vQuantifier("all", lst, e => Variant.rank(e) === Variant.RNum).as("allq"),
        Variant.vQuantifier("none", lst, e => Variant.rank(e) === Variant.RBool).as("noneq"),
        Variant.vQuantifier("single", lst, e => Variant.rank(e) === Variant.RStr).as("singleq"),
        Variant.vIn(one, lst).as("inq"),
        Variant.vSlice(lst, lit(0), lit(2)).getField("_vtck").as("sl"),
        Variant.vEq(one, two).as("eq12"),
        Variant.vCmp("<", one, two).as("lt"),
        Variant.vPlus(one, two).getField("_vtck").as("plus"),
        Variant.vArith("*", one, two).getField("_vtck").as("times"),
        Variant.vSize(lst).as("sz"))
        .collect()(0)
      assert(out.getBoolean(0) && !out.getBoolean(1) && out.getBoolean(2) && out.getBoolean(3))
      assert(out.getBoolean(4))                 // 1 IN [1, 2, 'a']
      assert(out.getString(5) == "[1, 2]")      // slice [0, 2)
      assert(!out.getBoolean(6))                // 1 = 2.0 is false
      assert(out.getBoolean(7))                 // 1 < 2.0
      assert(out.getString(8) == "3.0")         // 1 + 2.0 widens to float
      assert(out.getString(9) == "2.0")         // 1 * 2.0 widens to float
      assert(out.getLong(10) == 3L)
    }
  }

  test("variant ORDER BY + DISTINCT over a mixed column run under codegen") {
    noFallback {
      import spark.implicits._
      val mixed = spark.range(1000).toDF("id").withColumn("v",
        when(col("id") % 3 === 0, Variant.ofDataType(col("id"), LongType))
          .when(col("id") % 3 === 1,
            Variant.ofDataType(concat(lit("s"), col("id").cast(StringType)), StringType))
          .otherwise(Variant.ofElems(array(
            Variant.asElem(Variant.ofDataType(col("id") % 7, LongType))))))
      val top = mixed.orderBy(Variant.sortKey(col("v"))).limit(3)
        .select(col("v").getField("_vtck")).collect().map(_.getString(0))
      assert(top.length == 3)
      val n = mixed.agg(count_distinct(col("v").getField("_veq"))).collect()(0).getLong(0)
      assert(n > 0)
    }
  }
}
