package graft.sql

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.{col, lit, udf}
import org.apache.spark.sql.types._

/** Runtime arithmetic over STORED temporal values — the column-level
  * complement of the compile-time interpreter in [[Temporals]].
  *
  * A temporal property written by CREATE/SET is either a native Spark
  * value (DateType, µs-clean TimestampNTZ) or the tagged
  * `{_tkind, _sortus, _sortns, _iso, components…}` struct [[Temporals]]
  * emits. Expressions like `n.when + duration('PT6M')` or
  * `a.dur + b.dur` therefore need calendar arithmetic over those
  * encodings at RUNTIME, where Spark's native interval arithmetic
  * either doesn't apply (structs) or loses sub-µs precision.
  *
  * The ops here decode the stored encoding back to a [[Temporals.TVal]]
  * (the `_iso` field is a faithful round-trip of every kind), apply the
  * SAME Scala calendar functions the compile-time interpreter uses
  * (`Temporals.plus/minus/scale`), and re-encode with
  * [[Temporals.structFields]] — so a runtime-computed value is
  * bit-identical to the literal the interpreter would have folded.
  *
  * Execution shape: a per-row scalar function (Spark java UDF with an
  * explicit result schema). This is a COLD path by design — openCypher
  * temporal arithmetic over property values, on property-graph frames;
  * it is never on the analytic scan/join/agg hot path, and each call is
  * O(1) per row with no state. Reference surface:
  * query/opencypher/temporal/CypherDuration.java (plus/minus/multiply)
  * and CypherDateTime.java arithmetic.
  */
object TemporalRuntime {
  import Temporals._

  /** Kind of a stored temporal column, from its Spark type; None = not a
    * temporal encoding. TimestampType (zoned instants) is intentionally
    * absent: zoned datetimes are always struct-encoded. */
  def kindOf(dt: DataType): Option[String] = dt match {
    case DateType           => Some("date")
    case TimestampNTZType   => Some("localdatetime")
    case st: StructType if st.fieldNames.contains("_tkind") => Some(structKind(st))
    case _ => None
  }

  /** Kind of a tagged struct from its field shape (uniform per column —
    * the encoding never mixes kinds in one struct type). */
  def structKind(st: StructType): String = {
    val f = st.fieldNames.toSet
    if (f.contains("months")) "duration"
    else if (f.contains("year")) {
      if (!f.contains("hour")) "date"
      else if (f.contains("timezone")) "datetime"
      else "localdatetime"
    } else if (f.contains("offset")) "time"
    else "localtime"
  }

  private def sampleOf(kind: String): TVal = {
    import java.time._
    kind match {
      case "date"          => DDate(LocalDate.of(2000, 1, 1))
      case "localdatetime" => DLocalDT(LocalDateTime.of(2000, 1, 1, 1, 1, 1, 1))
      case "datetime"      => DZonedDT(LocalDateTime.of(2000, 1, 1, 1, 1, 1, 1)
        .atZone(ZoneOffset.UTC))
      case "localtime"     => DLocalTime(LocalTime.of(1, 1, 1, 1))
      case "time"          => DZonedTime(OffsetTime.of(LocalTime.of(1, 1, 1, 1),
        ZoneOffset.UTC))
      case _               => DDuration(1, 1, 1, 1)
    }
  }

  /** Spark schema of the tagged struct for `kind` — field names/order from
    * [[Temporals.structFields]] on a fully-populated sample, so it matches
    * the literal encoding exactly. */
  def structSchemaFor(kind: String): StructType = StructType(
    structFields(sampleOf(kind)).map { case (n, v) =>
      StructField(n, v match {
        case _: String => StringType
        case _         => LongType
      }, nullable = false)
    })

  /** Result column type for a computed temporal of `kind`: dates stay
    * native (they are never struct-stored); every other kind is struct —
    * a data-dependent native-vs-struct choice would break result typing. */
  private def resultType(kind: String): DataType =
    if (kind == "date") DateType else structSchemaFor(kind)

  // ---------------- decode / encode ----------------

  /** External (UDF-visible) value → TVal; null-safe. The struct decodes
    * through `_iso` + `_tkind`, which round-trip every kind. */
  def decode(a: Any): TVal = a match {
    case null                          => null
    case d: java.time.LocalDate        => DDate(d)
    case d: java.sql.Date              => DDate(d.toLocalDate)
    case t: java.time.LocalDateTime    => DLocalDT(t)
    case t: java.sql.Timestamp         => DLocalDT(t.toLocalDateTime)
    case r: Row =>
      val iso = r.getAs[String]("_iso")
      r.getAs[String]("_tkind") match {
        case "duration" => parseDuration(iso)
        case "date"     => DDate(parseDate(iso))
        case "localdatetime" => parseDateTimeText(iso) match {
          case DZonedDT(z) => DLocalDT(z.toLocalDateTime)
          case other       => other
        }
        case "datetime" => parseDateTimeText(iso) match {
          case DLocalDT(l) => DZonedDT(l.atZone(java.time.ZoneOffset.UTC))
          case other       => other
        }
        case "localtime" => parseTimeText(iso) match {
          case Left(lt)  => DLocalTime(lt)
          case Right(ot) => DLocalTime(ot.toLocalTime)
        }
        case _ => parseTimeText(iso) match {
          case Right(ot) => DZonedTime(ot)
          case Left(lt)  => DZonedTime(java.time.OffsetTime.of(lt, java.time.ZoneOffset.UTC))
        }
      }
    case other => throw new IllegalArgumentException(
      s"not a stored temporal: ${other.getClass.getName}")
  }

  /** TVal → the external value matching [[resultType]] of its kind. */
  def encode(v: TVal): Any = v match {
    case null     => null
    case DDate(d) => java.sql.Date.valueOf(d)
    case _        => Row(structFields(v).map(_._2): _*)
  }

  // ---------------- the column-level ops ----------------

  private def toNum(a: Any): BigDecimal = a match {
    case null      => null
    case n: Number => BigDecimal(n.toString)
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  /** `temporal ± duration`, `duration ± duration` where at least one side
    * is a runtime column. `sign` = +1 for `+`, −1 for `-`. Either side may
    * instead be a compile-time literal TVal (passed in place of a Column).
    * Returns the result column; result kind = the point side's kind (or
    * duration for duration±duration). */
  def plusMinus(l: Either[TVal, (String, Column)], r: Either[TVal, (String, Column)],
      sign: Int): Option[Column] = {
    val lKind = l.fold(kindName, _._1)
    val rKind = r.fold(kindName, _._1)
    // legal shapes: point ± duration; duration + point (plus only);
    // duration ± duration
    val resKind: String =
      if (rKind == "duration") lKind
      else if (lKind == "duration" && sign > 0) rKind
      else return None
    def apply2(a: TVal, b: TVal): TVal =
      if (a == null || b == null) null
      else (a, b, sign) match {
        case (x, d: DDuration, 1)  => Temporals.plus(x, d)
        case (x, d: DDuration, _)  => Temporals.minus(x, d)
        case (d: DDuration, x, 1)  => Temporals.plus(x, d)
        case _ => null
      }
    val out = resultType(resKind)
    Some((l, r) match {
      case (Left(lv), Right((_, rc))) =>
        val f = new org.apache.spark.sql.api.java.UDF1[Any, Any] {
          override def call(b: Any): Any = encodeOrNull(apply2(lv, decode(b)))
        }
        udf(f, out).apply(rc)
      case (Right((_, lc)), Left(rv)) =>
        val f = new org.apache.spark.sql.api.java.UDF1[Any, Any] {
          override def call(a: Any): Any = encodeOrNull(apply2(decode(a), rv))
        }
        udf(f, out).apply(lc)
      case (Right((_, lc)), Right((_, rc))) =>
        val f = new org.apache.spark.sql.api.java.UDF2[Any, Any, Any] {
          override def call(a: Any, b: Any): Any =
            encodeOrNull(apply2(decode(a), decode(b)))
        }
        udf(f, out).apply(lc, rc)
      case (Left(lv), Left(rv)) => // both literal — callers fold this case
        lit(null).cast(out) // unreachable by construction
    })
  }

  /** `duration * k` / `duration / k` with a runtime duration column and/or
    * runtime numeric factor. `invert` = true for division. */
  def scaleOp(dur: Either[TVal, Column], k: Either[BigDecimal, Column],
      invert: Boolean): Column = {
    val out = resultType("duration")
    def doScale(d: TVal, f: BigDecimal): Any =
      if (d == null || f == null) null
      else d match {
        case dd: DDuration =>
          if (invert && f == 0) throw new ArithmeticException("duration / 0")
          encode(Temporals.scale(dd, if (invert) BigDecimal(1) / f else f))
        case _ => null
      }
    (dur, k) match {
      case (Right(dc), Left(kf)) =>
        val f = new org.apache.spark.sql.api.java.UDF1[Any, Any] {
          override def call(a: Any): Any = doScale(decode(a), kf)
        }
        udf(f, out).apply(dc)
      case (Left(dv), Right(kc)) =>
        val f = new org.apache.spark.sql.api.java.UDF1[Any, Any] {
          override def call(b: Any): Any = doScale(dv, toNum(b))
        }
        udf(f, out).apply(kc)
      case (Right(dc), Right(kc)) =>
        val f = new org.apache.spark.sql.api.java.UDF2[Any, Any, Any] {
          override def call(a: Any, b: Any): Any = doScale(decode(a), toNum(b))
        }
        udf(f, out).apply(dc, kc)
      case (Left(dv), Left(kf)) => // both literal — callers fold this case
        lit(null).cast(out)
    }
  }

  private def encodeOrNull(v: TVal): Any = if (v == null) null else encode(v)

  /** Promote a NATIVE temporal column (DateType / TimestampNTZ) to the
    * tagged struct encoding at runtime — for unions where one side stored
    * struct (sub-µs precision) and the other native (TCK WithOrderBy1
    * [39]: CREATE writes mixed-precision localdatetimes). */
  def promoteToStruct(c: Column, dt: DataType): Column = {
    val kind = dt match {
      case DateType         => "date"
      case TimestampNTZType => "localdatetime"
      case other => throw new IllegalArgumentException(s"not a native temporal: $other")
    }
    val f = new org.apache.spark.sql.api.java.UDF1[Any, Any] {
      override def call(a: Any): Any = encodeStructOrNull(decode(a))
    }
    udf(f, structSchemaFor(kind)).apply(c)
  }

  private def encodeStructOrNull(v: TVal): Any =
    if (v == null) null else Row(structFields(v).map(_._2): _*)
}
