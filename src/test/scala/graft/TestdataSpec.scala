package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver-side testdata layout drift (VERDICT r5: the
  * regenerated `events.ts` silently moved from parquet TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS) and 28 tests failed with opaque errors).
  *
  * Two layers:
  *  1. every table's PHYSICAL schema is pinned here — a regeneration that
  *     changes a column type fails ONE readable assertion naming the
  *     column, the observed type, and the adaptive loader to extend;
  *  2. the `events.ts` pin is deliberately tolerant of every layout
  *     [[Tables.normalizeTs]] understands (µs/ns timestamp, raw-ns long):
  *     drift WITHIN that set is fine, drift OUTSIDE it fails loudly.
  */
class TestdataSpec extends AnyFunSuite {
  import TestSession._

  private def physical(table: String): StructType =
    spark.read.parquet(s"$sfDir/$table.parquet").schema

  private def assertCols(table: String, expect: (String, DataType)*): Unit = {
    val got = physical(table)
    expect.foreach { case (name, dt) =>
      assert(got.fieldNames.contains(name),
        s"$table.$name missing — testdata layout drifted; fields: ${got.fieldNames.mkString(",")}")
      assert(got(name).dataType == dt,
        s"$table.$name is ${got(name).dataType}, pinned $dt — testdata layout drifted. " +
          "If intentional, update TestdataSpec and any adaptive loader (Tables.normalizeTs).")
    }
  }

  test("events physical layout is one Tables.normalizeTs understands") {
    val tsType = physical("events")("ts").dataType
    val understood = Set[DataType](LongType, IntegerType, TimestampType, TimestampNTZType)
    assert(understood.contains(tsType),
      s"events.ts physical type $tsType is outside Tables.normalizeTs's layout set " +
        s"($understood) — extend the adaptive loader before anything else; every " +
        "ts-consuming query and stream reader routes through it.")
    assertCols("events",
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    // and the normalized view every consumer sees:
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }

  test("lineitem / orders physical layout") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderstatus" -> StringType)
  }

  test("dimension tables physical layout") {
    assertCols("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_name" -> StringType, "c_acctbal" -> DoubleType)
    assertCols("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertCols("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_retailprice" -> DoubleType)
    assertCols("nation", "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
      "n_name" -> StringType)
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("documents / embeddings physical layout") {
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    assertCols("embeddings", "vec_id" -> LongType, "label" -> IntegerType)
    val emb = physical("embeddings")
    emb("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => // fine either way
      case other => fail(s"embeddings.embedding is $other, pinned array<float|double>")
    }
  }
}
