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

  test("repeat().times(n) equals the explicitly chained hops") {
    val unrolled = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(30)).repeat(out()).times(2).values('key').dedup().order()")
      .collect().map(_.getLong(0))
    val chained = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(30)).out().out().values('key').dedup().order()")
      .collect().map(_.getLong(0))
    assert(unrolled.sameElements(chained))
  }

  test("repeat().until(cond) emits at first satisfaction, bag multiplicity kept") {
    // customers → orders (no part yet) → parts (emit); deeper loops add nothing
    val emitted = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(10)).repeat(out()).until(hasLabel('part')).count()")
      .head().getLong(0)
    val twoHop = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(10)).out().out().count()")
      .head().getLong(0)
    assert(emitted === twoHop)
  }

  test("repeat body may filter: repeat(out().hasLabel('order')).times(1)") {
    val n = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', lt(10)).repeat(out().hasLabel('order')).times(1).count()")
      .head().getLong(0)
    val exp = Tables.orders(spark, sfDir).filter(col("o_custkey") < 10).count()
    assert(n === exp)
  }

  test("path().by('key') accumulates the visited keys in traversal order") {
    val rows = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(7)).out('placed').out('contains').path().by('key')")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p = r.getSeq[Long](0)
      assert(p.length === 3)
      assert(p.head === 7L) // starts at the seed customer
    }
  }

  test("where(neq('a')) excludes the captured element; where(eq) keeps only it") {
    val back = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', eq(1)).as('a').out('contains').in('contains')" +
        ".where(eq('a')).values('key').dedup().order()").collect().map(_.getLong(0))
    assert(back.toSeq === Seq(1L)) // only the origin order survives eq
    val others = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', eq(1)).as('a').out('contains').in('contains')" +
        ".where(neq('a')).values('key').dedup()").collect().map(_.getLong(0))
    assert(!others.contains(1L))
  }

  test("and/or/not compose has-filters") {
    val keys = Gremlin.query(g,
      "g.V().hasLabel('customer').or(and(has('key', gte(5)), has('key', lt(8)), " +
        "not(has('key', eq(6)))), has('key', eq(100))).values('key').order()")
      .collect().map(_.getLong(0))
    assert(keys.toSeq === Seq(5L, 7L, 100L))
  }

  test("group().by(k) default fold collects sorted ids; .by(values(p).mean()) averages") {
    val grouped = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', lt(40)).group().by('name')").collect()
    assert(grouped.nonEmpty)
    val total = grouped.map(_.getSeq[Long](1).length).sum
    val exp = Tables.orders(spark, sfDir).filter(col("o_orderkey") < 40).count()
    assert(total.toLong === exp)
    val mean = Gremlin.query(g,
      "g.V().hasLabel('customer').outE('placed').as('e').inV().as('o')" +
        ".select('o','e').by('name').by('qty').group().by('o').by(values('e').mean())")
      .collect()
    assert(mean.length === 3 && mean.forall(_.getDouble(1) > 0))
  }

  test("coalesce(values(a), values(b)) takes the first non-null") {
    import spark.implicits._
    val verts = Seq(
      (1L, "doc", Option("x"), Option("fb1")),
      (2L, "doc", None, Option("fb2"))).toDF("id", "label", "primary", "fallback")
    val tiny = PropertyGraph(verts, Seq.empty[(Long, Long, String)].toDF("src", "dst", "label"))
    val vals = Gremlin.query(tiny,
      "g.V().hasLabel('doc').coalesce(values('primary'), values('fallback')).order()")
      .collect().map(_.getString(0))
    assert(vals.toSeq === Seq("fb2", "x"))
  }

  test("valueMap/project/union/simplePath tail steps") {
    // valueMap(): no-arg form carries every property (not id/label)
    val vm = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(7)).valueMap()").collect()
    assert(vm.length === 1)
    val m = vm(0).getMap[String, Seq[String]](0)
    assert(m.keySet === Set("key", "name") && m("key") === Seq("7"))
    // project() with fewer by()s than names round-robins the modulators
    val pr = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', within(3, 4)).project('a','b').by('key')")
      .collect()
    assert(pr.forall(r => r.getLong(0) === r.getLong(1)))
    // union keeps bag multiplicity: branch counts add
    val u = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', lt(20)).union(in('placed'), in('placed')).count()")
      .head().getLong(0)
    val one = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', lt(20)).in('placed').count()").head().getLong(0)
    assert(u === 2 * one)
    // simplePath drops the 2-hop round trip entirely
    val rt = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', eq(1)).out('contains').in('contains')" +
        ".simplePath().values('key').dedup()").collect().map(_.getLong(0))
    assert(!rt.contains(1L))
    val all = Gremlin.query(g,
      "g.V().hasLabel('order').has('key', eq(1)).out('contains').in('contains')" +
        ".values('key').dedup()").collect().map(_.getLong(0))
    assert(all.contains(1L) && rt.toSet === all.toSet - 1L)
  }

  test("until() on a too-deep graph FAILS LOUDLY instead of truncating") {
    import spark.implicits._
    // 20-node chain: 0 -> 1 -> … -> 20; until(key==20) needs 20 passes,
    // past the MaxRepeatLoops=12 unroll bound — the residual frontier must
    // raise, never silently drop the still-looping traverser (TinkerPop
    // loops until satisfied; times(n) on the same bound fails loudly too)
    val verts = (0L to 20L).map(i => (i, "n", i)).toDF("id", "label", "key")
    val edgs = (0L until 20L).map(i => (i, i + 1, "next")).toDF("src", "dst", "label")
    val chain = PropertyGraph(verts, edgs)
    val ex = intercept[IllegalStateException] {
      Gremlin.query(chain,
        "g.V().has('key', eq(0)).repeat(out()).until(has('key', eq(20))).count()").collect()
    }
    assert(ex.getMessage.contains("non-empty frontier"))
    // a reachable target inside the bound still completes correctly
    val ok = Gremlin.query(chain,
      "g.V().has('key', eq(0)).repeat(out()).until(has('key', eq(5))).values('key')")
      .collect().map(_.getLong(0))
    assert(ok.toSeq === Seq(5L))
  }

  test("emit(): times form unions per-pass frontiers; trailing form drains the graph") {
    // pass 1 = orders of customer 1 (one per placed edge), pass 2 = parts
    val orders = Tables.orders(spark, sfDir).filter(col("o_custkey") === 1).count()
    val parts = Tables.orders(spark, sfDir).filter(col("o_custkey") === 1)
      .join(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").distinct(),
        col("l_orderkey") === col("o_orderkey")).count()
    val emitted = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(1)).repeat(out()).emit().times(2).count()")
      .head().getLong(0)
    assert(emitted === orders + parts)
    // trailing emit() (no times/until): loops until the frontier drains —
    // same total on this 2-level DAG
    val drained = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(1)).repeat(out()).emit().count()")
      .head().getLong(0)
    assert(drained === orders + parts)
    // emit().until(cond): every pass joins the output, not only satisfiers
    val uemit = Gremlin.query(g,
      "g.V().hasLabel('customer').has('key', eq(1)).repeat(out()).emit().until(hasLabel('part')).count()")
      .head().getLong(0)
    assert(uemit === orders + parts)
  }

  test("sample(n) draws exactly n deterministic traversers") {
    val q = "g.V().hasLabel('customer').values('key').sample(10).order()"
    val a = Gremlin.query(g, q).collect().map(_.getLong(0)).toSeq
    val b = Gremlin.query(g, q).collect().map(_.getLong(0)).toSeq
    assert(a.length === 10 && a === b)
  }

  test("unsupported step raises") {
    intercept[IllegalArgumentException] {
      Gremlin.query(g, "g.V().branch(out()).times(3)")
    }
    intercept[IllegalArgumentException] {
      Gremlin.query(g, "g.V().times(3)") // times without repeat
    }
  }
}
