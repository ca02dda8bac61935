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
