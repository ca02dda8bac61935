package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference SQL dialect's `+` is type-polymorphic (reference
  * `engine/src/main/java/com/arcadedb/query/sql/parser/MathExpression.java:253-300`,
  * PLUS.apply(Object, Object)): number + number adds, string involvement
  * concatenates (with a one-sided null passing the other side through),
  * list + list concatenates, list + scalar appends, map + map merges.
  *
  * Spark columns are statically typed, so the dispatch happens once at
  * analysis time: a RuntimeReplaceable whose replacement is picked from
  * the resolved child types. The optimizer's ReplaceExpressions swaps in
  * the concrete arithmetic/concat expression, so the executed plan is
  * exactly what a hand-written query would produce — whole-stage codegen
  * sees Add/Concat/MapConcat, never this wrapper.
  */
case class DynamicPlus(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (lt, rt) if lt.isInstanceOf[StringType] || rt.isInstanceOf[StringType] ||
        (lt == NullType && rt.isInstanceOf[StringType]) =>
      // String concat; reference PLUS passes the non-null side through
      // when the other is null (null+null stays null).
      val ls = Cast(left, StringType)
      val rs = Cast(right, StringType)
      If(And(IsNull(left), IsNull(right)), Literal(null, StringType),
        Concat(Seq(Coalesce(Seq(ls, Literal.create("", StringType))),
          Coalesce(Seq(rs, Literal.create("", StringType))))))
    case (lt: ArrayType, _: ArrayType) =>
      Concat(Seq(left, Cast(right, lt)))
    case (ArrayType(et, _), rt) if rt != NullType =>
      Concat(Seq(left, CreateArray(Seq(Cast(right, et)))))
    case (lt: MapType, _: MapType) =>
      MapConcat(Seq(left, Cast(right, lt)))
    case (DateType, ByteType | ShortType | IntegerType | LongType) =>
      DateAdd(left, Cast(right, IntegerType))
    case (ByteType | ShortType | IntegerType | LongType, DateType) =>
      DateAdd(right, Cast(left, IntegerType))
    case (lt, rt) =>
      // the replacement is never re-analyzed, so the analyzer's implicit
      // numeric widening must be applied here by hand
      org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderTypeForTwo(lt, rt) match {
        case Some(t) => Add(Cast(left, t), Cast(right, t))
        case None    => Add(left, right) // surfaces the type mismatch loudly
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DynamicPlus =
    copy(left = newLeft, right = newRight)
}
