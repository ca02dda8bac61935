package graft.operators

import graft.Q
import graft.graphql.GraphQL
import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._

/** End-to-end GraphQL queries (reference graphql/ module): real GraphQL
  * documents resolved against the TPC-H property graph. Nested relationship
  * selections materialize as sorted arrays of structs; the declared outputs
  * project scalars + aggregates over the nested arrays so the DuckDB oracle
  * stays flat while still proving the traversal resolved correctly.
  */
object GraphQLOps {

  /** Schema over the demo graph (customer -[placed]-> order -[contains]-> part),
    * the shape of the reference's test schema (AbstractGraphQLTest.java:95). */
  private val SchemaText =
    """type Query {
      |  customerByKey(key: Int): Customer
      |  ordersByName(name: String): [Order]
      |}
      |type Customer {
      |  key: Int
      |  name: String
      |  orders: [Order] @relationship(type: "placed", direction: OUT)
      |}
      |type Order {
      |  key: Int
      |  name: String
      |  parts: [Part] @relationship(type: "contains", direction: OUT)
      |}
      |type Part {
      |  key: Int
      |  name: String
      |}""".stripMargin

  private def gql(queryText: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => GraphQL.query(PropertyGraph.fromTpch(s, d), SchemaText, queryText)

  val all: Seq[Q] = Seq(

    // ---- list entry point with argument filter, scalar selection ----
    Q("q_graphql_entry",
      """SELECT o_orderkey AS key, o_orderstatus AS name
        |FROM orders WHERE o_orderstatus = 'P' ORDER BY key""".stripMargin) { (s, d) =>
      gql("""{ ordersByName(name: "P") { key name } }""")(s, d).orderBy("key")
    },

    // ---- one-level relationship nesting, multi-row entry: parts
    //      collected per matching order (one plan, no per-root loop) ----
    Q("q_graphql_nested",
      """SELECT o_orderkey AS key, count(l_partkey) AS n_parts
        |FROM orders LEFT JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |  ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'P' GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
      gql("""{ ordersByName(name: "P") { key parts { key name } } }""")(s, d)
        .select(col("key"), size(col("parts")).cast("long").as("n_parts"))
        .orderBy("key")
    },

    // ---- two-level nesting: parts per order per customer; the output
    //      aggregates over the nested arrays (size of inner lists) ----
    Q("q_graphql_two_level",
      """SELECT c_custkey AS key,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  count(*) AS n_parts
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |  ON l_orderkey = o_orderkey
        |WHERE c_custkey = 7 GROUP BY 1""".stripMargin) { (s, d) =>
      gql("""{ customerByKey(key: 7) { key orders { key parts { key } } } }""")(s, d)
        .select(col("key"),
          size(col("orders")).cast("long").as("n_orders"),
          aggregate(col("orders"), lit(0L), (a, o) =>
            a + size(o.getField("parts")).cast("long")).as("n_parts"))
    }
  )
}
