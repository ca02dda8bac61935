package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract of the runtime temporal calculus
  * ([[graft.sql.TemporalRuntime]]): a value computed at RUNTIME over a
  * stored temporal column must be field-identical to the literal the
  * compile-time interpreter ([[graft.sql.Temporals]]) folds for the same
  * expression — same `_iso` text, same `_sortus`/`_sortns` order keys,
  * same components. The TCK exercises this end-to-end through Cypher;
  * this spec pins the encode/decode layer directly so a drift in either
  * encoder fails fast with a readable diff.
  */
class TemporalRuntimeSpec extends AnyFunSuite {
  import graft.sql.Temporals
  import graft.sql.Temporals._
  import graft.sql.TemporalRuntime
  import TestSession.spark

  private def roundTrip(v: TVal): Unit = {
    val decoded = TemporalRuntime.decode(encodeAsRow(v))
    assert(Temporals.render(decoded) === Temporals.render(v),
      s"decode(encode(v)) drifted for $v")
  }

  private def encodeAsRow(v: TVal): Row =
    Row(Temporals.structFields(v).map(_._2): _*) match {
      case r =>
        // attach the schema so getAs[String]("_tkind") works like a real
        // UDF input row
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          r.toSeq.toArray, TemporalRuntime.structSchemaFor(Temporals.kindName(v)))
    }

  private val samples: Seq[TVal] = {
    import java.time._
    Seq(
      DLocalDT(LocalDateTime.of(1984, 10, 11, 12, 31, 14, 645876123)),
      DZonedDT(LocalDateTime.of(1984, 10, 11, 12, 31, 14, 645876123)
        .atZone(ZoneId.of("Europe/Stockholm"))),
      DZonedDT(LocalDateTime.of(1984, 10, 11, 12, 0, 0, 0).atZone(ZoneOffset.of("+05:00"))),
      DLocalTime(LocalTime.of(12, 31, 14, 645876123)),
      DZonedTime(OffsetTime.of(LocalTime.of(12, 31, 14, 645876000), ZoneOffset.of("+01:00"))),
      parseDuration("P12Y5M14DT16H13M10.000000001S"),
      parseDuration("-P1DT2H"))
  }

  test("struct encode/decode round-trips every kind (via _iso)") {
    samples.foreach(roundTrip)
  }

  test("runtime plus(stored, literal duration) equals the compile-time fold") {
    val d = parseDuration("P1M2DT3H4M5.000000006S")
    samples.filterNot(_.isInstanceOf[DDuration]).foreach { v =>
      val folded = Temporals.plus(v, d)
      val viaRuntime = Temporals.plus(TemporalRuntime.decode(encodeAsRow(v)), d)
      assert(Temporals.structFields(viaRuntime) === Temporals.structFields(folded),
        s"runtime plus drifted from fold for $v + $d")
    }
  }

  test("runtime column op on a stored struct matches the literal fold") {
    import spark.implicits._
    val v = DLocalTime(java.time.LocalTime.of(10, 30, 0, 123456789))
    val d = parseDuration("PT6M")
    // store the struct, apply the runtime op as a column, read it back
    val df = Seq(1).toDF("i").withColumn("t", Temporals.column(v, forceStruct = true))
    val out = TemporalRuntime.plusMinus(
      Right(("localtime", col("t"))), Left(d), sign = 1).get
    val got = df.select(out.as("r")).select(col("r._iso")).as[String].head()
    assert(got === Temporals.render(Temporals.plus(v, d)))
  }

  test("duration scaling truncates the sub-nano remainder like the reference") {
    val d = parseDuration("P12Y5M14DT16H13M10.000000001S")
    // 1 ns × 0.5 truncates to 0 (TCK Temporal8 [7])
    assert(Temporals.render(Temporals.scale(d, BigDecimal("0.5"))) === "P6Y2M22DT13H21M8S")
    assert(Temporals.render(Temporals.scale(d, BigDecimal(2))) ===
      "P24Y10M28DT32H26M20.000000002S")
  }

  test("date +/- duration absorbs whole days from the time part") {
    val d = buildDuration(Map(
      "years" -> 12.5, "months" -> 5.5, "days" -> 14.5,
      "hours" -> 16.5, "minutes" -> 12.5, "seconds" -> 70.5, "nanoseconds" -> 3L))
    val x = DDate(java.time.LocalDate.of(1984, 10, 11))
    assert(Temporals.render(Temporals.plus(x, d)) === "1997-10-11")
    assert(Temporals.render(Temporals.minus(x, d)) === "1971-10-12")
  }
}
