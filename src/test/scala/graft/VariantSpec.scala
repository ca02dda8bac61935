package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Variant
import graft.sql.Ast._

/** Unit pins for the dynamic-typing (variant) calculus — the encoding
  * that lets one column position hold mixed openCypher kinds (see
  * [[graft.cypher.Variant]]). The TCK drives it end-to-end; these pin
  * the calculus invariants directly so a refactor can't silently bend
  * them. */
class VariantSpec extends AnyFunSuite {
  import TestSession.spark

  private def litV(e: Expr) = Variant.litCol(Variant.ofLiteral(e).get)
  private def one = spark.range(1)

  private def evalStr(c: org.apache.spark.sql.Column): String =
    one.select(c.cast(StringType)).collect()(0).getString(0)
  private def evalAny(c: org.apache.spark.sql.Column): Any =
    one.select(c).collect()(0).get(0)

  test("canonical renders round-trip through the TCK literal forms") {
    assert(evalStr(litV(NumLit(5, isIntegral = true)).getField("_vtck")) == "5")
    assert(evalStr(litV(NumLit(1.0, isIntegral = false)).getField("_vtck")) == "1.0")
    assert(evalStr(litV(StrLit("a'b")).getField("_vtck")) == "'a\\'b'")
    assert(evalStr(litV(ArrayLit(Seq(NumLit(1, isIntegral = true), StrLit("a"),
      BoolLit(false), NullLit))).getField("_vtck")) == "[1, 'a', false, null]")
    assert(evalStr(litV(StructLit(Seq("a" -> NullLit, "b" -> BoolLit(true))))
      .getField("_vtck")) == "{a: null, b: true}")
  }

  test("orderability sort key: map < node < rel < list < path < string < bool < num < NaN < null") {
    // ranks drive the struct sort key's first field
    def rankOf(e: Expr): Int =
      evalAny(litV(e).getField("_vrank")).asInstanceOf[Int]
    assert(rankOf(StructLit(Seq("a" -> NumLit(1, isIntegral = true)))) == Variant.RMap)
    assert(rankOf(ArrayLit(Seq(NumLit(1, isIntegral = true)))) == Variant.RList)
    assert(rankOf(StrLit("x")) == Variant.RStr)
    assert(rankOf(BoolLit(true)) == Variant.RBool)
    assert(rankOf(NumLit(1, isIntegral = true)) == Variant.RNum)
    assert(rankOf(NullLit) == Variant.RNull)
  }

  test("list orderability keys are prefix-free: [] < ['a'] < ['a', 1] < [1] < [1, null]") {
    val lists = Seq(
      ArrayLit(Seq.empty),
      ArrayLit(Seq(StrLit("a"))),
      ArrayLit(Seq(StrLit("a"), NumLit(1, isIntegral = true))),
      ArrayLit(Seq(NumLit(1, isIntegral = true))),
      ArrayLit(Seq(NumLit(1, isIntegral = true), NullLit)))
    val keys = lists.map(l => evalStr(litV(l).getField("_vkey")))
    assert(keys == keys.sorted, s"list keys out of order: $keys")
    assert(keys.distinct.length == keys.length)
  }

  test("keys are collision-free under adversarial element boundaries") {
    // ['a','b'] vs ['asb']-style shapes: element boundaries must be
    // unforgeable, including via the terminator/escape chars themselves
    def strs(xs: String*) = ArrayLit(xs.map(StrLit(_)))
    val pairs = Seq(
      strs("a", "b") -> strs("asb"),
      strs("a", "b") -> strs("a5b"),
      strs("a", "b") -> strs("ab"),
      strs("a", "b") -> strs("a", "b"),
      StructLit(Seq("a" -> StrLit("b=c"))) -> StructLit(Seq("a=b" -> StrLit("c"))),
      StructLit(Seq("ab" -> StrLit("x"))) -> StructLit(Seq("a" -> StrLit("bx"))))
    for ((l, r) <- pairs) {
      assert(evalStr(litV(l).getField("_vkey")) != evalStr(litV(r).getField("_vkey")),
        s"_vkey collision: $l vs $r")
      assert(evalStr(litV(l).getField("_veq")) != evalStr(litV(r).getField("_veq")),
        s"_veq collision: $l vs $r")
      assert(evalAny(Variant.vEq(litV(l), litV(r))) == false, s"vEq true: $l vs $r")
    }
    // prefix strings order correctly: 'a' < 'ab' needs the terminator
    // to sort below 'b'
    assert(evalAny(Variant.vCmp("<", litV(StrLit("a")), litV(StrLit("ab")))) == true)
    assert(evalAny(Variant.vCmp("<", litV(strs("a")), litV(strs("a", "b")))) == true)
  }

  test("NUL and control chars in strings keep prefix order and stay collision-free") {
    // r9 advice #3: an unescaped \u0000 sorted below the \u0001 key
    // terminator, inverting prefix order ('a\u0000' keyed below 'a').
    val ctl = Seq("a", "a\u0000", "a\u0000b", "a\u0001", "a\u0002", "ab")
    val keys = ctl.map(v => evalStr(litV(StrLit(v)).getField("_vkey")))
    assert(keys == keys.sorted, s"control-char keys out of order: ${keys.map(_.getBytes("UTF-8").mkString("[", ",", "]"))}")
    assert(keys.distinct.length == keys.length, "control-char key collision")
    // the same ordering must hold through the COLUMN-side escape (escC):
    // runtime-built strings share the bit-identical encoding
    val rt = ctl.map(v => evalStr(
      Variant.ofDataType(org.apache.spark.sql.functions.lit(v),
        org.apache.spark.sql.types.StringType).getField("_vkey")))
    assert(rt == keys, "escS (literal) and escC (column) encodings diverge")
    assert(evalAny(Variant.vCmp("<", litV(StrLit("a")), litV(StrLit("a\u0000")))) == true)
  }

  test("equivalence key: 1 and 1.0 equivalent, 1 and '1' not") {
    def eq(e: Expr): String = evalStr(litV(e).getField("_veq"))
    assert(eq(NumLit(1, isIntegral = true)) == eq(NumLit(1.0, isIntegral = false)))
    assert(eq(NumLit(1, isIntegral = true)) != eq(StrLit("1")))
  }

  test("vEq: cross-kind false, numbers compare, null propagates, NaN never equals") {
    def eqv(a: Expr, b: Expr): Any =
      evalAny(Variant.vEq(litV(a), litV(b)))
    assert(eqv(NumLit(1, isIntegral = true), NumLit(1.0, isIntegral = false)) == true)
    assert(eqv(NumLit(1, isIntegral = true), StrLit("1")) == false)
    assert(eqv(NumLit(1, isIntegral = true), NullLit) == null)
    val nan = Bin("/", NumLit(0.0, isIntegral = false), NumLit(0.0, isIntegral = false))
    // NaN constructed at runtime: 0.0/0.0 through the variant arithmetic
    val nanV = Variant.vArith("/", litV(NumLit(0.0, isIntegral = false)),
      litV(NumLit(0.0, isIntegral = false)))
    assert(evalAny(Variant.vEq(nanV, nanV)) == false)
    locally { val _ = nan } // documented construction; silence unused
  }

  test("vCmp: same-kind orders, cross-family null") {
    def cmp(op: String, a: Expr, b: Expr): Any =
      evalAny(Variant.vCmp(op, litV(a), litV(b)))
    assert(cmp("<", NumLit(1, isIntegral = true), NumLit(3.14, isIntegral = false)) == true)
    assert(cmp("<", StrLit("a"), StrLit("b")) == true)
    assert(cmp("<", NumLit(1, isIntegral = true), StrLit("b")) == null)
    assert(cmp("<", BoolLit(false), BoolLit(true)) == true)
    // incomparability beats NaN: NaN < 'a' is null, not false
    val nanV = Variant.vArith("/", litV(NumLit(0.0, isIntegral = false)),
      litV(NumLit(0.0, isIntegral = false)))
    assert(evalAny(Variant.vCmp("<", nanV, litV(StrLit("a")))) == null)
    assert(evalAny(Variant.vCmp("<", nanV, litV(NumLit(1, isIntegral = true)))) == false)
  }

  test("min/max aggregation order differs from orderability: lists < strings < bools < nums") {
    import spark.implicits._
    val vals: Seq[Expr] = Seq(NumLit(1, isIntegral = true), StrLit("a"), NullLit,
      ArrayLit(Seq(NumLit(1, isIntegral = true), NumLit(2, isIntegral = true))),
      NumLit(0.2, isIntegral = false), StrLit("b"))
    val df = Seq(1).toDF("x").select(explode(array(vals.map(litV): _*)).as("v"))
    val mx = df.agg(Variant.vMax(col("v"))).collect()(0).getStruct(0)
    val mn = df.agg(Variant.vMin(col("v"))).collect()(0).getStruct(0)
    assert(mx.getAs[String]("_vtck") == "1")      // TCK Aggregation2 [11]
    assert(mn.getAs[String]("_vtck") == "[1, 2]") // TCK Aggregation2 [12]
  }

  test("variant arithmetic: int/int stays integral, int/float widens, NaN flows") {
    val i2 = litV(NumLit(2, isIntegral = true))
    val i3 = litV(NumLit(3, isIntegral = true))
    val f2 = litV(NumLit(2.0, isIntegral = false))
    assert(evalStr(Variant.vPlus(i2, i3).getField("_vtck")) == "5")
    assert(evalStr(Variant.vPlus(i2, f2).getField("_vtck")) == "4.0")
    assert(evalStr(Variant.vArith("/", i3, i2).getField("_vtck")) == "1") // truncating
    // scalar + list prepends (openCypher: 1 + [2] = [1, 2])
    val l2 = litV(ArrayLit(Seq(NumLit(2, isIntegral = true))))
    assert(evalStr(Variant.vPlus(i3, l2).getField("_vtck")) == "[3, 2]")
  }

  test("list algebra: append/concat/reverse/size/slice recompute the derived encodings") {
    val l12 = litV(ArrayLit(Seq(NumLit(1, isIntegral = true), NumLit(2, isIntegral = true))))
    val sA = litV(StrLit("a"))
    val app = Variant.vPlus(l12, sA)
    assert(evalStr(app.getField("_vtck")) == "[1, 2, 'a']")
    assert(evalAny(Variant.vSize(app)) == 3L)
    assert(evalStr(Variant.vReverse(app).getField("_vtck")) == "['a', 2, 1]")
    assert(evalStr(Variant.vIndex(app, lit(-1)).getField("_vtck")) == "'a'")
    assert(evalStr(Variant.vSlice(app, lit(1), lit(3)).getField("_vtck")) == "[2, 'a']")
  }

  test("quantifier 3VL over a variant list") {
    val l = litV(ArrayLit(Seq(NumLit(1, isIntegral = true), NullLit,
      NumLit(2, isIntegral = true))))
    // pred: element is the integer 1 → [true, null, false]
    def pred(el: org.apache.spark.sql.Column) =
      Variant.vEq(Variant.ofElemValue(el), litV(NumLit(1, isIntegral = true)))
    assert(evalAny(Variant.vQuantifier("any", l, pred)) == true)
    assert(evalAny(Variant.vQuantifier("all", l, pred)) == false)
    assert(evalAny(Variant.vQuantifier("none", l, pred)) == false)
    assert(evalAny(Variant.vQuantifier("single", l, pred)) == null) // one true + one null
  }

  test("string predicates are null unless both operands are strings") {
    val s = litV(StrLit("abc")); val p = litV(StrLit("ab"))
    val n = litV(NumLit(1, isIntegral = true))
    assert(evalAny(Variant.vStringPred("starts", s, p)) == true)
    assert(evalAny(Variant.vStringPred("starts", n, p)) == null)
    assert(evalAny(Variant.vStringPred("contains", s, n)) == null)
  }
}
