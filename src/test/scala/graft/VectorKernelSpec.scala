package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equivalence gate for the native vector kernels: the codegen'd
  * [[graft.functions.VectorDotProduct]]/[[graft.functions.VectorL2Sq]]
  * expressions must produce byte-identical doubles to the higher-order
  * `aggregate(zip_with(...))` forms they replaced — same sequential
  * left-fold order, so no oracle rounding boundary can drift (the same
  * contract MinhashSignature pins for the dedup kernel). */
class VectorKernelSpec extends AnyFunSuite {
  import TestSession._

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select((col("vec_id") - 1).as("ia"), col("v").as("vb"))
    a.join(b, "ia") // consecutive-id pairs: full corpus coverage, linear size
  }

  test("native dot product is bit-identical to the HOF left fold") {
    val n = pairs
      .withColumn("nat", VectorFunctions.vecDot(col("va"), col("vb")))
      .withColumn("hof", VectorFunctions.vecDotHof(col("va"), col("vb")))
      .filter(col("nat") =!= col("hof")) // exact double comparison, not approx
      .count()
    assert(n === 0)
  }

  test("native l2sq is bit-identical to the HOF left fold") {
    val n = pairs
      .withColumn("nat", VectorFunctions.vecL2Sq(col("va"), col("vb")))
      .withColumn("hof", VectorFunctions.vecL2SqHof(col("va"), col("vb")))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(n === 0)
  }

  test("null contract: null element or length mismatch poisons to NULL") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (array(1.0D, cast(null as double)), array(3.0D, 4.0D)),
        |  (array(1.0D), array(3.0D, 4.0D)),
        |  (cast(null as array<double>), array(3.0D, 4.0D))
        |AS t(a, b)""".stripMargin)
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("d"),
        VectorFunctions.vecL2Sq(col("a"), col("b")).as("l"))
      .collect()
    assert(df(0).getDouble(0) === 11.0 && df(0).getDouble(1) === 8.0)
    (1 to 3).foreach { i => assert(df(i).isNullAt(0) && df(i).isNullAt(1), s"row $i") }
  }

  test("LSH literal-plane buckets match the recomputed HOF projection") {
    // same sign decisions as the pre-kernel per-element SQL HOF form
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
    val native = operators.VectorOps.lshBuckets(emb, bits = 4, table = 3)
      .select("vec_id", "bucket")
    val hofExpr = (0 until 4).map { j =>
      val terms = s"aggregate(zip_with(ev, transform(sequence(0, size(ev)-1), " +
        s"k -> sin(cast(${3 * 7919 + j} * 131 + k * 7 as double))), (x, p) -> x * p), " +
        s"0D, (acc, x) -> acc + x)"
      s"CASE WHEN $terms > 0 THEN ${1L << j}L ELSE 0L END"
    }.mkString(" + ")
    val hof = emb.withColumn("ev", VectorFunctions.asDouble(col("embedding")))
      .withColumn("bucket", expr(hofExpr)).select("vec_id", "bucket")
    assert(native.exceptAll(hof).count() === 0 && hof.exceptAll(native).count() === 0)
  }
}
