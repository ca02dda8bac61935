package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Primitive-loop kernels for the dense-vector hot path.
  *
  * The Column-DSL forms (`aggregate(zip_with(...))`) are higher-order
  * functions — Spark evaluates those interpreted (CodegenFallback) with a
  * boxed lambda variable per element plus an intermediate array per pair.
  * At ~200k candidate pairs × 64 dims (q_vec_neardup at sf0.1) that
  * lambda overhead dominated the whole query. These kernels read the
  * ArrayData backing store in place with a primitive while-loop, and the
  * expressions below compile to one static call inside whole-stage
  * codegen — the same extension tier as [[MinhashKernel]].
  *
  * Numeric contract: identical results to the HOF forms, bit for bit —
  * the sum is the same sequential left fold in double (`acc + a(i)*b(i)`
  * ascending i), so every oracle comparison and every existing rounding
  * boundary is unaffected. Null contract matches too: a null element
  * poisons the sum to SQL NULL (HOF: `x*y` → null, `acc+null` → null),
  * and length-mismatched inputs are NULL (HOF: `zip_with` pads the short
  * side with nulls). Boxed `java.lang.Double` return carries the
  * null-ness across the static-call boundary.
  *
  * Reference surface: function/sql/vector/SQLFunctionVectorDotProduct.java
  * and SQLFunctionVectorDistance.java (single-node float loops); this is
  * the distributed, codegen'd analog.
  */
object VectorKernel {

  /** Sequential left-fold dot product over two double arrays. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Sequential left-fold squared-L2 distance over two double arrays. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Shared shape for the two binary vector kernels: array<double> ×
  * array<double> → double, nullable (null input, null element, or length
  * mismatch → SQL NULL). */
abstract class VectorBinaryKernelExpression extends BinaryExpression {
  protected def kernelName: String
  protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // analysis-time guard: ArrayData.getDouble on an array<float> would read
  // 4-byte floats as 8-byte doubles and return silent garbage — reject
  // anything but array<double> instead (callers cast via asDouble)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_boxed = graft.functions.VectorKernel.$kernelName($a, $b);
      ${ev.isNull} = (${ev.value}_boxed == null);
      ${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_boxed.doubleValue();
    """)
}

/** Native dot product: `vecDot`'s hot-path form. */
case class VectorDotProduct(left: Expression, right: Expression)
    extends VectorBinaryKernelExpression {
  override protected def kernelName: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Native squared-L2 distance: the IVF/assign and l2Distance hot path. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends VectorBinaryKernelExpression {
  override protected def kernelName: String = "l2sq"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.l2sq(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_l2sq"
}
