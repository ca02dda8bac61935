package graft

import graft.graphql.GraphQL
import graft.graph.PropertyGraph
import graft.kv.Redis
import graft.mongo.Mongo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the protocol-derived front-ends (Mongo find/aggregate,
  * Redis command batches, GraphQL resolution) beyond what the oracled
  * queries cover. */
class WireFrontendsSpec extends AnyFunSuite {
  import TestSession._

  test("mongo: $not / $exists / $nor compile correctly") {
    val df = Tables.nation(spark, sfDir)
    val not = Mongo.find(df, """{"n_nationkey": {"$not": {"$gt": 5}}}""").count()
    assert(not === 6) // 0..5
    val nor = Mongo.find(df, """{"$nor": [{"n_nationkey": {"$lt": 10}}, {"n_nationkey": {"$gt": 20}}]}""").count()
    assert(nor === 11) // 10..20
    val ex = Mongo.find(df, """{"n_name": {"$exists": true}}""").count()
    assert(ex === df.count())
  }

  test("mongo: standalone $lookup builds an array field") {
    val orders = Tables.orders(spark, sfDir).limit(20)
    val out = Mongo.aggregate(orders,
      """[{"$lookup": {"from": "customer", "localField": "o_custkey",
        |              "foreignField": "c_custkey", "as": "cust"}}]""".stripMargin,
      tables = Map("customer" -> Tables.customer(spark, sfDir)))
    assert(out.count() === 20)
    val sizes = out.select(size(col("cust"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ === 1)) // every order has exactly one customer
  }

  test("mongo: updateOne/deleteOne touch exactly one row; replacement nulls the rest") {
    import spark.implicits._
    def freshTable() = graft.sources.MutableTable.copyOf(spark,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "grp", "n"),
      s"/tmp/graft_state/mongo_one_${System.nanoTime()}")
    locally { // updateOne (multi=false): only the FIRST match by natural order
      val t = freshTable()
      val n = Mongo.updateCmd(spark, t, """{"grp": "a"}""", """{"$inc": {"n": 1}}""", multi = false)
      assert(n === 1)
      assert(t.df.orderBy("id").select("n").collect().map(_.getLong(0)).toSeq ==
        Seq(11L, 20L, 30L))
    }
    locally { // deleteOne (limit 1)
      val t = freshTable()
      assert(Mongo.deleteCmd(spark, t, """{"grp": "a"}""", limitOne = true) === 1)
      assert(t.df.count() === 2 && t.df.filter(col("id") === 2).count() === 1)
    }
    locally { // replacement (no $ operators) = CONTENT: unmentioned props null
      val t = freshTable()
      Mongo.updateCmd(spark, t, """{"id": 3}""", """{"id": 3, "grp": "c"}""")
      val r = t.df.filter(col("id") === 3).collect()(0)
      assert(r.getAs[String]("grp") == "c" && r.isNullAt(r.fieldIndex("n")))
    }
    locally { // DUPLICATE documents: exactly one copy mutated / deleted
      val dup = graft.sources.MutableTable.copyOf(spark,
        Seq(("a", 10L), ("a", 10L), ("a", 10L), ("b", 20L)).toDF("grp", "n"),
        s"/tmp/graft_state/mongo_dup_${System.nanoTime()}")
      assert(Mongo.deleteCmd(spark, dup, """{"grp": "a"}""", limitOne = true) === 1)
      assert(dup.df.filter(col("grp") === "a").count() === 2) // not all three
      val n = Mongo.updateCmd(spark, dup, """{"grp": "a"}""",
        """{"$inc": {"n": 1}}""", multi = false)
      assert(n === 1)
      assert(dup.df.filter(col("grp") === "a" && col("n") === 11L).count() === 1)
      assert(dup.df.filter(col("grp") === "a" && col("n") === 10L).count() === 1)
    }
    locally { // upsert applies $inc from zero when the filter misses
      val t = freshTable()
      val n = Mongo.updateCmd(spark, t, """{"id": 9, "grp": "z"}""",
        """{"$inc": {"n": 5}}""", multi = true, upsert = true)
      assert(n === 1)
      val r = t.df.filter(col("id") === 9).collect()(0)
      assert(r.getAs[String]("grp") == "z" && r.getAs[Number]("n").longValue == 5L)
    }
  }

  test("redis: ordered fold — overwrite, RMW increment, hash fields, delete") {
    import spark.implicits._
    val initial = Seq(("a", Option.empty[String], "1")).toDF("key", "field", "value")
    val out = Redis.applyBatch(spark, initial, Seq(
      "INCRBY a 4",        // 1 -> 5
      "SET b x",
      "SET b y",           // overwrite
      "HSET h f1 v1",
      "DEL a"))            // a vanishes despite the increment
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(out === Set(("b", None, "y"), ("h", Some("f1"), "v1")))
    // INCR before DEL is dead; INCR after re-SET restarts from the new value
    val out2 = Redis.applyBatch(spark, initial, Seq("DEL a", "SET a 10", "INCR a"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out2 === Set(("a", "11")))
  }

  test("graphql: empty relationship lists are [], not null") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    // no "contains" edge ever leaves a customer vertex → [] for every root
    val schema =
      """type Query { customerByKey(key: Int): Customer }
        |type Customer {
        |  key: Int
        |  parts: [Part] @relationship(type: "contains", direction: OUT)
        |}
        |type Part { key: Int }""".stripMargin
    val out = GraphQL.query(g, schema, "{ customerByKey(key: 7) { key parts { key } } }")
    val row = out.head()
    assert(row.getAs[Long]("key") === 7L)
    assert(row.getAs[scala.collection.Seq[Any]]("parts").isEmpty)
  }

  test("graphql: unknown entry or field raises") {
    val g = PropertyGraph.fromTpch(spark, sfDir)
    val schema = """type Query { customerByKey(key: Int): Customer }
                   |type Customer { key: Int }""".stripMargin
    intercept[IllegalArgumentException] {
      GraphQL.query(g, schema, "{ nope(key: 1) }")
    }
    intercept[IllegalArgumentException] {
      GraphQL.query(g, schema, "{ customerByKey(key: 1) { wrong } }")
    }
  }
}
