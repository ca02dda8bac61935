package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Dense-vector math over `ArrayType(FloatType)` columns, built from
  * Spark's codegen'd higher-order functions (no UDFs in the hot path).
  *
  * Re-expresses the reference's vector function surface (SURVEY.md §2.9:
  * function/sql/vector/SQLFunctionVector*.java — add/scale/dot/norms/
  * cosine/normalize) for Spark. All math is done in double after an
  * explicit element cast so results are engine-portable (float math
  * differs between runtimes; double sequential folds do not).
  */
object VectorFunctions {

  /** Cast array elements to double — do this once at the boundary. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential left-fold dot product (deterministic summation order).
    * Native codegen'd kernel — bit-identical to the HOF form
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (VectorFunctionsSpec pins
    * the equivalence), but a primitive loop instead of an interpreted
    * lambda per element: the dominant cost of every pairwise-scoring
    * query (near-dup, kNN, ANN rescore) at any scale. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The HOF twin of [[vecDot]], kept for the equivalence spec. */
  private[graft] def vecDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native squared-L2 distance (see [[vecDot]] for the contract). */
  def vecL2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(VectorL2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private[graft] def vecL2SqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  def vecNormL1(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + abs(x))

  def vecNormL2(a: Column): Column = sqrt(vecDot(a, a))

  def vecNormLInf(a: Column): Column = array_max(transform(a, abs(_)))

  /** Cosine similarity dot/(|a||b|) — norms via dot so the oracle can
    * reproduce the exact same expression shape. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))

  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSubtract(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecScale(a: Column, k: Column): Column = transform(a, x => x * k)
  def vecNormalize(a: Column): Column = {
    transform(a, x => x / sqrt(aggregate(a, lit(0.0), (acc, y) => acc + y * y)))
  }
  def vecDimension(a: Column): Column = size(a)

  def l2Distance(a: Column, b: Column): Column = sqrt(vecL2Sq(a, b))

  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, x) => acc + x)

  /** Vector hygiene (reference SQLFunctionVectorHasNaN etc.). */
  def hasNaN(a: Column): Column = exists(a, _.isNaN)
  def hasNull(a: Column): Column = exists(a, _.isNull)
  def clip(a: Column, lo: Column, hi: Column): Column =
    transform(a, x => least(greatest(x, lo), hi))
}
