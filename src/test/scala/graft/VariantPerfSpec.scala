package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Variant

/** Guards the variant calculus against UDF/shuffle creep: ORDER BY and
  * DISTINCT over 1M variant-encoded mixed rows must stay within a small
  * constant factor of the same operations on a native-typed column. The
  * variant path is per-row projection + the same single sort/aggregate —
  * if a future change routes it through UDFs, interpreted fallback, or
  * an extra shuffle, the ratio blows past the ceiling long before a
  * 100 TB run would notice. Min-of-two runs on both sides absorbs JIT
  * and transient contention; the ceiling is deliberately looser than
  * the ~3.7x measured (the full 12-field encoding vs the minimal 3-field
  * key) so the pin fails on regressions — whose signature is 10x+ — not
  * on a noisy machine.
  */
class VariantPerfSpec extends AnyFunSuite {
  import TestSession.spark

  private val N = 1000000L

  private def timeMinOf2(f: => Unit): Double = {
    def once: Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    math.min(once, once)
  }

  test("variant ORDER BY + DISTINCT stay within 5x of a string-key baseline on 1M rows") {
    val base = spark.range(N).toDF("id")
    // mixed-kind value: int | string | 2-element list, cycling by row
    val asInt = Variant.ofDataType(col("id"), LongType)
    val asStr = Variant.ofDataType(concat(lit("s"), (col("id") % 1000).cast(StringType)), StringType)
    val asList = Variant.ofElems(array(
      Variant.asElem(Variant.ofDataType(col("id") % 97, LongType)),
      Variant.asElem(Variant.ofDataType(lit("x"), StringType))))
    val mixed = base.withColumn("v",
      when(col("id") % 3 === 0, asInt).when(col("id") % 3 === 1, asStr).otherwise(asList))
    // FAIR baseline: a mixed-kind total order REQUIRES building a
    // per-row (rank, num, key-string) triple — the baseline hand-builds
    // exactly that minimal work, so the ratio measures the calculus'
    // OVERHEAD (extra encodings, dispatch), not the cost of the problem
    // itself. A plain `id % 1000` long sort would compare apples to a
    // radix sort and fail on any honest encoding.
    val handKey = struct(
      (col("id") % 3).cast(IntegerType).as("r"),
      (col("id") % 97).cast(DoubleType).as("num"),
      when(col("id") % 3 === 0, lpad(col("id").cast(StringType), 20, "0"))
        .when(col("id") % 3 === 1, concat(lit("s"), (col("id") % 1000).cast(StringType)))
        .otherwise(concat(lit("l"), lpad((col("id") % 97).cast(StringType), 20, "0"))).as("s"))
    val native = base.withColumn("k", handKey)

    // warm both paths once (JIT + codegen cache)
    mixed.orderBy(Variant.sortKey(col("v"))).limit(5).collect()
    native.orderBy(col("k")).limit(5).collect()

    val tV = timeMinOf2 {
      mixed.orderBy(Variant.sortKey(col("v"))).limit(5).collect()
      mixed.agg(count_distinct(col("v").getField("_veq"))).collect()
    }
    val tN = timeMinOf2 {
      native.orderBy(col("k")).limit(5).collect()
      native.agg(count_distinct(col("k").getField("s"))).collect()
    }
    val ratio = tV / math.max(tN, 1e-3)
    info(f"variant $tV%.2fs vs string-key baseline $tN%.2fs -> ratio $ratio%.2fx")
    assert(ratio <= 5.0,
      f"variant ORDER BY/DISTINCT ratio $ratio%.2fx exceeds the 5x ceiling " +
        f"(variant $tV%.2fs, baseline $tN%.2fs) — UDF/shuffle/fallback creep?")
  }
}
