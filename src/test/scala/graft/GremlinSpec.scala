package graft

import graft.gremlin.Gremlin
import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gremlin front-end semantics: parsing, predicate surface, traverser bag
  * multiplicity, step modulators — checked against hand-built DataFrame
  * equivalents on the sf0.001 TPC-H graph. */
class GremlinSpec extends AnyFunSuite {
  import TestSession._
  private lazy val g = PropertyGraph.fromTpch(spark, sfDir)

  test("bag semantics: out() emits one traverser per edge, dedup() collapses") {
    val bag = Gremlin.query(g, "g.V().hasLabel('customer').has('key', lt(50)).out('placed').count()")
      .head().getLong(0)
    val set = Gremlin.query(g, "g.V().hasLabel('customer').has('key', lt(50)).out('placed').dedup().count()")
      .head().getLong(0)
    val expected = Tables.orders(spark, sfDir).filter(col("o_custkey") < 50).count()
    assert(bag === expected)       // one order per placed edge
    assert(set === expected)       // orders are already distinct
    val parts = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(50)).out('placed').out('contains').count()").head().getLong(0)
    val partsD = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(50)).out('placed').out('contains').dedup().count()").head().getLong(0)
    assert(parts > partsD)         // same part reached via many orders
  }

  test("predicates: within / between / containing compile to the right filters") {
    val n = Gremlin.query(g, "g.V().hasLabel('customer').has('key', within(1, 2, 3)).count()")
      .head().getLong(0)
    assert(n === 3)
    val b = Gremlin.query(g, "g.V().hasLabel('order').has('key', between(10, 20)).count()")
      .head().getLong(0)
    val exp = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") >= 10 && col("o_orderkey") < 20).count()
    assert(b === exp)
    val c = Gremlin.query(g, "g.V().hasLabel('customer').has('name', containing('0001')).count()")
      .head().getLong(0)
    assert(c > 0)
  }

  test("as/select round-trips the captured step; by() modulates round-robin") {
    val rows = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(7)).as('c').out('placed').as('o')" +
        ".select('c','o').by('key').order().by('o').limit(3)").collect()
    assert(rows.forall(_.getLong(0) === 7L))
    assert(rows.map(_.getLong(1)).sorted.sameElements(rows.map(_.getLong(1))))
  }

  test("edge-object steps: outE/values/inV agree with the edges relation") {
    val viaE = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(7)).outE('placed').inV().values('key').dedup().order()")
      .collect().map(_.getLong(0))
    val direct = Tables.orders(spark, sfDir).filter(col("o_custkey") === 7)
      .select(col("o_orderkey")).orderBy("o_orderkey").collect().map(_.getLong(0))
    assert(viaE.sameElements(direct))
  }

  test("unsupported step raises") {
    intercept[IllegalArgumentException] {
      Gremlin.query(g, "g.V().repeat(out()).times(3)")
    }
  }
}
