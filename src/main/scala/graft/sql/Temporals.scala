package graft.sql

import java.time._
import java.time.temporal.{ChronoUnit, IsoFields, WeekFields}

/** Compile-time openCypher temporal value domain.
  *
  * Spark's type system carries DATE and (µs) LOCAL DATETIME natively but
  * has no TIME, no zone-preserving datetime, no nanosecond precision and
  * no calendar duration — the reference implements these as first-class
  * values (function/temporal/ *.java over java.time). Almost every
  * temporal EXPRESSION is built from literals, so the Cypher front-end
  * folds them exactly at compile time with java.time (the same static-
  * fold tier as litEq/litCmp/quantifier unrolling in the pipeline) and
  * only the RESULT crosses into a Spark column:
  *
  *  - plain dates → DateType literal, µs local datetimes → TimestampNTZ
  *    literal (native ordering/comparison keep working);
  *  - everything else → a tagged struct literal
  *    `{_tkind, _iso, <components…>}`, rendered by its ISO text and
  *    opened by component access — parquet-storable (the previous
  *    CalendarInterval encoding was not).
  *
  * Rendering matches java.time `toString`, which is what the openCypher
  * TCK's expected cells quote.
  */
object Temporals {

  sealed trait TVal
  final case class DDate(d: LocalDate) extends TVal
  final case class DLocalDT(d: LocalDateTime) extends TVal
  final case class DZonedDT(d: ZonedDateTime) extends TVal
  final case class DLocalTime(t: LocalTime) extends TVal
  final case class DZonedTime(t: OffsetTime) extends TVal
  /** Calendar duration: months/days/seconds are independent components
    * (a month is not a fixed number of days); nanos ∈ [0, 1e9) with
    * floor-style carry into seconds (reference DurationValue model). */
  final case class DDuration(months: Long, days: Long, seconds: Long, nanos: Long)
      extends TVal {
    def totalNanos: BigInt = BigInt(seconds) * 1000000000L + nanos
  }

  def mkDuration(months: Long, days: Long, seconds: Long, nanos: Long): DDuration = {
    // normalize nanos into [0, 1e9) by floor-carry into seconds
    val total = BigInt(seconds) * 1000000000L + nanos
    val s = if (total >= 0) total / 1000000000L
            else -((-total + 999999999L) / 1000000000L)
    val n = (total - s * 1000000000L).toLong
    DDuration(months, days, s.toLong, n)
  }

  // ---------------- rendering ----------------

  def render(v: TVal): String = v match {
    case DDate(d)      => d.toString
    case DLocalDT(d)   => d.toString
    case DZonedDT(d)   => d.toString
    case DLocalTime(t) => t.toString
    case DZonedTime(t) => t.toString
    case d: DDuration  => renderDuration(d)
  }

  /** openCypher duration text: P[nY][nM][nD][T[nH][nM][nS]], every unit
    * signed independently (reference DurationValue.toString). */
  def renderDuration(d: DDuration): String = {
    val sb = new StringBuilder("P")
    val y = d.months / 12; val mo = d.months % 12
    if (y != 0) sb.append(y).append('Y')
    if (mo != 0) sb.append(mo).append('M')
    if (d.days != 0) sb.append(d.days).append('D')
    val tn = d.totalNanos
    if (tn != 0 || (y == 0 && mo == 0 && d.days == 0)) {
      sb.append('T')
      val h = tn / BigInt(3600000000000L)
      val rem1 = tn - h * 3600000000000L
      val mi = rem1 / BigInt(60000000000L)
      val rem2 = rem1 - mi * 60000000000L
      val s = rem2 / BigInt(1000000000L)
      val ns = (rem2 - s * 1000000000L).toLong
      if (h != 0) sb.append(h).append('H')
      if (mi != 0) sb.append(mi).append('M')
      if (s != 0 || ns != 0 || (h == 0 && mi == 0)) {
        if (ns == 0) sb.append(s)
        else {
          // fraction carries the overall sign of the seconds part
          val neg = rem2 < 0
          val absS = (if (neg) -(rem2) else rem2)
          val whole = absS / 1000000000L
          val frac = (absS - whole * 1000000000L).toLong
          if (neg) sb.append('-')
          sb.append(whole).append('.')
            .append(f"$frac%09d".reverse.dropWhile(_ == '0').reverse)
        }
        sb.append('S')
      }
    }
    sb.toString
  }

  // ---------------- construction from a component map ----------------

  /** date({year, month, day | week, dayOfWeek | quarter, dayOfQuarter |
    * ordinalDay | date: <base>}) — reference DateValue.build. */
  def buildDate(m: Map[String, Any]): LocalDate = {
    val base: Option[LocalDate] = m.get("date").map(v => dateOf(v.asInstanceOf[TVal]))
      .orElse(m.get("datetime").map(v => dateOf(v.asInstanceOf[TVal])))
    def gl(k: String): Option[Long] = m.get(k).map(_.asInstanceOf[Number].longValue)
    // with a base value, ABSENT components inherit from it within the
    // selected calendar pattern (TCK Temporal3: {date: d, quarter: 3}
    // keeps the base's day-of-quarter); without one, they default to 1
    def gi(k: String, fromBase: LocalDate => Int): Int =
      gl(k).map(_.toInt).orElse(base.map(fromBase)).getOrElse(1)
    if (m.contains("week") ||
        (base.isDefined && m.contains("dayOfWeek") && !m.contains("month"))) {
      // ISO week date: the year here is the WEEK-BASED year
      val wyear = gl("year").map(_.toInt)
        .orElse(base.map(_.get(IsoFields.WEEK_BASED_YEAR)))
        .getOrElse(throw new IllegalArgumentException("date needs year"))
      val week = gi("week", _.get(WeekFields.ISO.weekOfWeekBasedYear()))
      val dow = gi("dayOfWeek", _.getDayOfWeek.getValue)
      LocalDate.of(wyear, 1, 4) // always in ISO week 1
        .`with`(WeekFields.ISO.weekOfWeekBasedYear(), week.toLong)
        .`with`(WeekFields.ISO.dayOfWeek(), dow.toLong)
    } else {
      val year = gl("year").map(_.toInt).orElse(base.map(_.getYear))
        .getOrElse(throw new IllegalArgumentException("date needs year"))
      if (m.contains("quarter") || m.contains("dayOfQuarter")) {
        val q = gi("quarter", _.get(IsoFields.QUARTER_OF_YEAR))
        val dq = gi("dayOfQuarter", _.get(IsoFields.DAY_OF_QUARTER))
        LocalDate.of(year, (q - 1) * 3 + 1, 1).plusDays(dq - 1L)
      } else if (m.contains("ordinalDay")) {
        LocalDate.ofYearDay(year, gi("ordinalDay", _.getDayOfYear))
      } else {
        LocalDate.of(year, gi("month", _.getMonthValue), gi("day", _.getDayOfMonth))
      }
    }
  }

  def buildTime(m: Map[String, Any]): LocalTime = {
    val base: Option[LocalTime] = m.get("time").map(v => timeOf(v.asInstanceOf[TVal]))
      .orElse(m.get("datetime").map(v => timeOf(v.asInstanceOf[TVal])))
    def gl(k: String): Option[Long] = m.get(k).map(_.asInstanceOf[Number].longValue)
    def has(k: String) = m.contains(k)
    // with a base value, absent components inherit from it ({time: other,
    // second: 42} keeps the base's hour/minute AND fraction — TCK
    // Temporal3 [2]); without one they default to 0
    val hour = gl("hour").orElse(base.map(_.getHour.toLong)).getOrElse(0L)
    val minute = gl("minute").orElse(base.map(_.getMinute.toLong)).getOrElse(0L)
    val second = gl("second").orElse(base.map(_.getSecond.toLong)).getOrElse(0L)
    // millisecond/microsecond/nanosecond are INDEPENDENT subfields of the
    // base's decomposed fraction (base .645876123 + {nanosecond: 2} →
    // .645876002). Values beyond each field's natural range still
    // accumulate (a bare {nanosecond: 645876123} is the whole fraction).
    val anySub = has("millisecond") || has("microsecond") || has("nanosecond")
    val baseN = base.map(_.getNano.toLong).getOrElse(0L)
    val nanos =
      if (!anySub) baseN
      else gl("millisecond").getOrElse(baseN / 1000000L) * 1000000L +
        gl("microsecond").getOrElse(baseN / 1000L % 1000L) * 1000L +
        gl("nanosecond").getOrElse(baseN % 1000L)
    LocalTime.of(hour.toInt, minute.toInt, second.toInt, nanos.toInt)
  }

  def zoneOf(m: Map[String, Any]): Option[ZoneId] =
    m.get("timezone").map(z => parseZone(z.asInstanceOf[String]))

  def parseZone(z: String): ZoneId =
    if (z.startsWith("+") || z.startsWith("-") || z == "Z") ZoneOffset.of(z)
    else ZoneId.of(z)

  // ---------------- projections between kinds ----------------

  def dateOf(v: TVal): LocalDate = v match {
    case DDate(d)    => d
    case DLocalDT(d) => d.toLocalDate
    case DZonedDT(d) => d.toLocalDate
    case _ => throw new IllegalArgumentException(s"no date components in $v")
  }
  def timeOf(v: TVal): LocalTime = v match {
    case DLocalTime(t) => t
    case DZonedTime(t) => t.toLocalTime
    case DLocalDT(d)   => d.toLocalTime
    case DZonedDT(d)   => d.toLocalTime
    case _ => throw new IllegalArgumentException(s"no time components in $v")
  }
  def offsetOf(v: TVal): Option[ZoneOffset] = v match {
    case DZonedTime(t) => Some(t.getOffset)
    case DZonedDT(d)   => Some(d.getOffset)
    case _             => None
  }

  // ---------------- string parsing ----------------

  def parseDate(s: String): LocalDate = {
    val t = s.trim
    // ISO: yyyy-MM-dd | yyyyMMdd | yyyy-MM | yyyy-Www[-d] | yyyyWww[d] |
    //      yyyy-ddd | yyyy-Qq-dd
    val wk = "(\\d{4})-?W(\\d{2})-?(\\d)?".r
    val qt = "(\\d{4})-?Q(\\d)-?(\\d{2})?".r
    val ord = "(\\d{4})-(\\d{3})".r
    val ymd = "(\\d{4})-(\\d{2})-(\\d{2})".r
    val ymdC = "(\\d{4})(\\d{2})(\\d{2})".r
    val ordC = "(\\d{4})(\\d{3})".r // compact ordinal yyyyDDD
    val ym = "(\\d{4})-(\\d{2})".r
    val ymC = "(\\d{4})(\\d{2})".r // compact yyyyMM (TCK Temporal2 [1] '201507')
    val y = "(\\d{4})".r
    t match {
      case wk(yy, ww, dd) =>
        LocalDate.of(yy.toInt, 1, 4)
          .`with`(WeekFields.ISO.weekOfWeekBasedYear(), ww.toLong)
          .`with`(WeekFields.ISO.dayOfWeek(), Option(dd).map(_.toLong).getOrElse(1L))
      case qt(yy, q, dd) =>
        LocalDate.of(yy.toInt, (q.toInt - 1) * 3 + 1, 1)
          .plusDays(Option(dd).map(_.toLong - 1).getOrElse(0L))
      case ymd(yy, mm, dd)  => LocalDate.of(yy.toInt, mm.toInt, dd.toInt)
      case ord(yy, ddd)     => LocalDate.ofYearDay(yy.toInt, ddd.toInt)
      case ymdC(yy, mm, dd) => LocalDate.of(yy.toInt, mm.toInt, dd.toInt)
      case ordC(yy, ddd)    => LocalDate.ofYearDay(yy.toInt, ddd.toInt)
      case ym(yy, mm)       => LocalDate.of(yy.toInt, mm.toInt, 1)
      case ymC(yy, mm)      => LocalDate.of(yy.toInt, mm.toInt, 1)
      case y(yy)            => LocalDate.of(yy.toInt, 1, 1)
      case _                => LocalDate.parse(t)
    }
  }

  /** time text with optional offset → Left(local) / Right(offset time).
    * Offsets: Z | ±hh | ±hhmm | ±hh:mm (ISO-8601 basic + extended). */
  def parseTimeText(s: String): Either[LocalTime, OffsetTime] = {
    val t = s.trim
    val (tp, op) =
      if (t.endsWith("Z")) (t.dropRight(1), Some("Z"))
      else "([+-])(\\d{2})(:?\\d{2})?$".r.findFirstMatchIn(t) match {
        // a time is at least two digits long, so an offset suffix cannot
        // start before index 2
        case Some(m) if m.start >= 2 => (t.substring(0, m.start), Some(m.matched))
        case _ => (t, None)
      }
    val lt = parseLocalTime(tp)
    op match {
      case Some(o) => Right(OffsetTime.of(lt, normOffset(o)))
      case None    => Left(lt)
    }
  }

  def normOffset(o: String): ZoneOffset =
    if (o == "Z") ZoneOffset.UTC
    else if (o.length == 3) ZoneOffset.of(o + ":00") // ±hh
    else if (o.length == 5 && !o.contains(':')) ZoneOffset.of(o.substring(0, 3) + ":" + o.substring(3))
    else ZoneOffset.of(o)

  def parseLocalTime(s: String): LocalTime = {
    val t = s.trim
    val hms = "(\\d{2}):?(\\d{2})?:?(\\d{2})?(\\.\\d+)?".r
    t match {
      case hms(h, mi, se, fr) =>
        val nanos = Option(fr).map(f => (BigDecimal(f) * 1000000000).toLong).getOrElse(0L)
        LocalTime.of(h.toInt, Option(mi).map(_.toInt).getOrElse(0),
          Option(se).map(_.toInt).getOrElse(0), nanos.toInt)
      case _ => LocalTime.parse(t)
    }
  }

  /** datetime text: <date>T<time>[offset][[zone]] — a space separator is
    * accepted too (the SQL-ish form the engine's own queries use). */
  def parseDateTimeText(s: String): TVal = {
    val t = s.trim
    val ti = { val i = t.indexOf('T'); if (i >= 0) i else t.indexOf(' ') }
    if (ti < 0) return DLocalDT(parseDate(t).atStartOfDay)
    val datePart = t.substring(0, ti)
    var rest = t.substring(ti + 1)
    // named zone suffix [Europe/Stockholm]
    val zone: Option[ZoneId] =
      if (rest.endsWith("]")) {
        val i = rest.lastIndexOf('[')
        val z = rest.substring(i + 1, rest.length - 1)
        rest = rest.substring(0, i)
        Some(ZoneId.of(z))
      } else None
    val d = parseDate(datePart)
    parseTimeText(rest) match {
      case Right(ot) =>
        val ldt = LocalDateTime.of(d, ot.toLocalTime)
        zone match {
          case Some(z) => DZonedDT(ZonedDateTime.ofStrict(ldt, ot.getOffset, z))
          case None    => DZonedDT(ldt.atZone(ot.getOffset))
        }
      case Left(lt) =>
        val ldt = LocalDateTime.of(d, lt)
        zone match {
          case Some(z) => DZonedDT(ldt.atZone(z))
          case None    => DLocalDT(ldt)
        }
    }
  }

  /** duration('P…') — months/days/seconds components kept separate;
    * fractional units allowed on the smallest given unit (openCypher). */
  def parseDuration(s: String): DDuration = {
    val t = s.trim
    require(t.nonEmpty && (t(0) == 'P' || ((t(0) == '+' || t(0) == '-') && t(1) == 'P')),
      s"not a duration: $s")
    val neg = t(0) == '-'
    val body = if (t(0) == 'P') t.substring(1) else t.substring(2)
    val (datePart, timePart) = body.indexOf('T') match {
      case -1 => (body, "")
      case i  => (body.substring(0, i), body.substring(i + 1))
    }
    // ISO-8601 alternative format P<yyyy>-<MM>-<dd>T<hh>:<mm>:<ss[.f]> —
    // each calendar position is a duration component (TCK Temporal2 [7]:
    // 'P2012-02-02T14:37:21.545' = P2012Y2M2DT14H37M21.545S)
    val alt = "(\\d{4})-(\\d{2})-(\\d{2})".r
    datePart match {
      case alt(yy, mo, dd) =>
        val hmsf = "(\\d{2}):(\\d{2}):(\\d{2}(?:\\.\\d+)?)".r
        val (h, mi, se) = timePart match {
          case hmsf(a, b, c) => (BigDecimal(a), BigDecimal(b), BigDecimal(c))
          case ""            => (BigDecimal(0), BigDecimal(0), BigDecimal(0))
          case other => throw new IllegalArgumentException(s"bad duration time $other")
        }
        val sign = if (neg) -1 else 1
        val totN = ((h * 3600 + mi * 60 + se) * 1000000000L).toBigInt
        return mkDuration(sign * (yy.toLong * 12 + mo.toLong), sign * dd.toLong,
          sign * (totN / 1000000000L).toLong, sign * (totN % 1000000000L).toLong)
      case _ => ()
    }
    var months = BigDecimal(0); var days = BigDecimal(0); var secs = BigDecimal(0)
    val unit = "(-?\\d+(?:\\.\\d+)?)([A-Z])".r
    for (um <- unit.findAllMatchIn(datePart)) {
      val v = BigDecimal(um.group(1))
      um.group(2) match {
        case "Y" => months += v * 12
        case "M" => months += v
        case "W" => days += v * 7
        case "D" => days += v
        case u   => throw new IllegalArgumentException(s"bad duration unit $u")
      }
    }
    for (um <- unit.findAllMatchIn(timePart)) {
      val v = BigDecimal(um.group(1))
      um.group(2) match {
        case "H" => secs += v * 3600
        case "M" => secs += v * 60
        case "S" => secs += v
        case u   => throw new IllegalArgumentException(s"bad duration unit $u")
      }
    }
    // fractional months/days spill into the finer components: a month
    // fraction is worth 2629746 s (Gregorian average, 365.2425 d / 12 —
    // the reference's AVG_SECONDS_PER_MONTH), whole days of which land in
    // the day component; a day fraction is worth 86400 s
    val wholeMonths = months.setScale(0, BigDecimal.RoundingMode.DOWN)
    val mfSecs = (months - wholeMonths) * 2629746
    days += (mfSecs / 86400).setScale(0, BigDecimal.RoundingMode.DOWN)
    secs += mfSecs % 86400
    val wholeDays = days.setScale(0, BigDecimal.RoundingMode.DOWN)
    secs += (days - wholeDays) * 86400
    val totalN = (secs * 1000000000L).toBigInt
    val sign = if (neg) -1 else 1
    mkDuration(sign * wholeMonths.toLong, sign * wholeDays.toLong,
      sign * (totalN / 1000000000L).toLong, sign * (totalN % 1000000000L).toLong)
  }

  /** duration({years, months, weeks, days, hours, minutes, seconds,
    * milliseconds, microseconds, nanoseconds}) — fractional values spill
    * into finer units (reference DurationValue.build). */
  def buildDuration(m: Map[String, Any]): DDuration = {
    def g(k: String): BigDecimal = m.get(k) match {
      case Some(n: Number) => BigDecimal(n.toString)
      case None => BigDecimal(0)
      case Some(x) => throw new IllegalArgumentException(s"bad duration component $x")
    }
    val months = g("years") * 12 + g("months")
    val wholeMonths = months.setScale(0, BigDecimal.RoundingMode.DOWN)
    val mfSecs = (months - wholeMonths) * 2629746 // see parseDuration
    val days = g("weeks") * 7 + g("days") +
      (mfSecs / 86400).setScale(0, BigDecimal.RoundingMode.DOWN)
    val wholeDays = days.setScale(0, BigDecimal.RoundingMode.DOWN)
    val secs = g("hours") * 3600 + g("minutes") * 60 + g("seconds") +
      g("milliseconds") / 1000 + g("microseconds") / 1000000 +
      g("nanoseconds") / 1000000000 + (days - wholeDays) * 86400 + mfSecs % 86400
    val totalN = (secs * 1000000000L).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    mkDuration(wholeMonths.toLong, wholeDays.toLong,
      (totalN / 1000000000L).toLong, (totalN % 1000000000L).toLong)
  }

  // ---------------- truncation ----------------

  private def truncDate(d: LocalDate, unit: String): LocalDate = unit match {
    case "millennium" => LocalDate.of(d.getYear / 1000 * 1000, 1, 1)
    case "century"    => LocalDate.of(d.getYear / 100 * 100, 1, 1)
    case "decade"     => LocalDate.of(d.getYear / 10 * 10, 1, 1)
    case "year"       => LocalDate.of(d.getYear, 1, 1)
    case "weekyear" =>
      // Jan 4 is always in week 1 of the week-based year
      LocalDate.of(d.get(IsoFields.WEEK_BASED_YEAR), 1, 4)
        .`with`(WeekFields.ISO.dayOfWeek(), 1)
    case "quarter" =>
      LocalDate.of(d.getYear, (d.get(IsoFields.QUARTER_OF_YEAR) - 1) * 3 + 1, 1)
    case "month" => LocalDate.of(d.getYear, d.getMonthValue, 1)
    case "week"  => d.`with`(WeekFields.ISO.dayOfWeek(), 1)
    case "day"   => d
    case u => throw new IllegalArgumentException(s"cannot truncate date to $u")
  }

  private def truncTime(t: LocalTime, unit: String): LocalTime = unit match {
    case "day"         => LocalTime.MIDNIGHT
    case "hour"        => t.truncatedTo(ChronoUnit.HOURS)
    case "minute"      => t.truncatedTo(ChronoUnit.MINUTES)
    case "second"      => t.truncatedTo(ChronoUnit.SECONDS)
    case "millisecond" => t.truncatedTo(ChronoUnit.MILLIS)
    case "microsecond" => t.truncatedTo(ChronoUnit.MICROS)
    case u => throw new IllegalArgumentException(s"cannot truncate time to $u")
  }

  private val DateUnits = Set("millennium", "century", "decade", "year",
    "weekyear", "quarter", "month", "week")

  /** A date-only value's time components are midnight for truncation
    * purposes (datetime.truncate('minute', date(...)) is legal). */
  private def timeOrMidnight(v: TVal): LocalTime = v match {
    case DDate(_) => LocalTime.MIDNIGHT
    case _        => timeOf(v)
  }

  /** <kind>.truncate(unit, v [, overrides]) — truncate then re-apply the
    * override components (reference TemporalTruncate semantics). The
    * `kind` decides the RESULT type; v supplies the components. */
  def truncate(kind: String, unitRaw: String, v0: TVal, over: Map[String, Any]): TVal = {
    val unit = unitRaw.toLowerCase
    // a timezone override REPLACES the zone on the truncated local clock —
    // no instant conversion (TCK Temporal9 [2]: 'hour' of 12:31-01:00 with
    // {timezone: Europe/Stockholm} is 12:00+01:00[Stockholm], not 14:00)
    val v = v0
    def dPart: LocalDate =
      if (DateUnits(unit) || unit == "day") truncDate(dateOf(v), unit)
      else dateOf(v)
    def tPart: LocalTime =
      if (DateUnits(unit) || unit == "day") LocalTime.MIDNIGHT
      else truncTime(timeOrMidnight(v), unit)
    val mapKeys = over - "timezone"
    kind match {
      case "date" =>
        val d0 = dPart
        if (mapKeys.isEmpty) DDate(d0)
        else DDate(buildDate(mapKeys + ("date" -> DDate(d0))))
      case "localtime" =>
        val t0 = truncTime(timeOrMidnight(v), unit)
        if (mapKeys.isEmpty) DLocalTime(t0)
        else DLocalTime(buildTime(mapKeys + ("time" -> DLocalTime(t0))))
      case "time" =>
        val t0 = truncTime(timeOrMidnight(v), unit)
        val t1 = if (mapKeys.isEmpty) t0 else buildTime(mapKeys + ("time" -> DLocalTime(t0)))
        val off = over.get("timezone").map(z => parseZone(z.asInstanceOf[String]))
          .collect { case zo: ZoneOffset => zo }
          .orElse(offsetOf(v)).getOrElse(ZoneOffset.UTC)
        DZonedTime(OffsetTime.of(t1, off))
      case "localdatetime" =>
        val base = LocalDateTime.of(dPart, tPart)
        if (mapKeys.isEmpty) DLocalDT(base)
        else DLocalDT(LocalDateTime.of(
          buildDate(dateKeys(mapKeys) + ("date" -> DDate(base.toLocalDate))),
          buildTime(timeKeys(mapKeys) + ("time" -> DLocalTime(base.toLocalTime)))))
      case "datetime" =>
        val zone: ZoneId = over.get("timezone").map(z => parseZone(z.asInstanceOf[String]))
          .orElse(v match { case DZonedDT(zd) => Some(zd.getZone); case _ => None })
          .getOrElse(ZoneOffset.UTC)
        val base = LocalDateTime.of(dPart, tPart)
        val built =
          if (mapKeys.isEmpty) base
          else LocalDateTime.of(
            buildDate(dateKeys(mapKeys) + ("date" -> DDate(base.toLocalDate))),
            buildTime(timeKeys(mapKeys) + ("time" -> DLocalTime(base.toLocalTime))))
        DZonedDT(built.atZone(zone))
      case k => throw new IllegalArgumentException(s"cannot truncate to kind $k")
    }
  }

  private val DateKeys = Set("year", "month", "day", "week", "dayOfWeek",
    "quarter", "dayOfQuarter", "ordinalDay", "date", "datetime")
  private val TimeKeys = Set("hour", "minute", "second", "millisecond",
    "microsecond", "nanosecond", "time", "datetime")
  def dateKeys(m: Map[String, Any]): Map[String, Any] = m.filter(kv => DateKeys(kv._1))
  def timeKeys(m: Map[String, Any]): Map[String, Any] = m.filter(kv => TimeKeys(kv._1))

  // ---------------- duration.between and friends ----------------

  private def isTimeOnly(v: TVal): Boolean = v match {
    case DLocalTime(_) | DZonedTime(_) => true
    case _                             => false
  }

  /** Anchor a date-carrying pair onto comparable java.time values: when
    * either side is zoned, the local side is placed in the zoned side's
    * zone (the TCK's mixed-kind rows confirm this rule); both-local pairs
    * stay LocalDateTime. */
  private def anchorPair(a: TVal, b: TVal)
      : Either[(LocalDateTime, LocalDateTime), (ZonedDateTime, ZonedDateTime)] = {
    val zoneOpt = (a match { case DZonedDT(z) => Some(z.getZone); case _ => None })
      .orElse(b match { case DZonedDT(z) => Some(z.getZone); case _ => None })
    zoneOpt match {
      case Some(zone) =>
        def zdt(v: TVal): ZonedDateTime = v match {
          case DZonedDT(z) => z
          case DLocalDT(l) => l.atZone(zone)
          case DDate(d)    => d.atStartOfDay(zone)
          case _           => throw new IllegalArgumentException(s"no date in $v")
        }
        Right((zdt(a), zdt(b)))
      case None =>
        def ldt(v: TVal): LocalDateTime = v match {
          case DLocalDT(l) => l
          case DDate(d)    => d.atStartOfDay
          case _           => throw new IllegalArgumentException(s"no date in $v")
        }
        Left((ldt(a), ldt(b)))
    }
  }

  private def timeOnlyNanos(a: TVal, b: TVal): Long = {
    // pure time difference; instants only when BOTH carry offsets; a
    // date-only side contributes midnight
    val (oa, ob) = (offsetOf(a), offsetOf(b))
    val (ta, tb) = (timeOrMidnight(a), timeOrMidnight(b))
    if (oa.isDefined && ob.isDefined)
      tb.toNanoOfDay - ob.get.getTotalSeconds * 1000000000L -
        (ta.toNanoOfDay - oa.get.getTotalSeconds * 1000000000L)
    else tb.toNanoOfDay - ta.toNanoOfDay
  }

  def between(a: TVal, b: TVal): DDuration = {
    if (isTimeOnly(a) || isTimeOnly(b)) {
      val nanos = timeOnlyNanos(a, b)
      mkDuration(0, 0, 0, nanos)
    } else anchorPair(a, b) match {
      case Right((za, zb)) =>
        val months = ChronoUnit.MONTHS.between(za, zb)
        val za2 = za.plusMonths(months)
        val days = ChronoUnit.DAYS.between(za2, zb)
        val nanos = ChronoUnit.NANOS.between(za2.plusDays(days), zb)
        mkDuration(months, days, 0, nanos)
      case Left((la, lb)) =>
        val months = ChronoUnit.MONTHS.between(la, lb)
        val la2 = la.plusMonths(months)
        val days = ChronoUnit.DAYS.between(la2, lb)
        val nanos = ChronoUnit.NANOS.between(la2.plusDays(days), lb)
        mkDuration(months, days, 0, nanos)
    }
  }

  /** A time-only value paired with a date-carrying one anchors onto the
    * other side's DATE (and zone, for a local time) so the difference is
    * instant-based — DST-aware on a zoned partner (TCK Temporal10 [8]:
    * inSeconds(datetime(Oct 29 00:00 Stockholm), localtime 04:00) is PT5H,
    * not the 4-hour wall difference). */
  private def anchorTimeOnly(t: TVal, other: TVal): TVal = {
    val d = dateOf(other)
    (t, other) match {
      case (DLocalTime(lt), DZonedDT(z)) => DZonedDT(d.atTime(lt).atZone(z.getZone))
      case (DZonedTime(ot), _) =>
        DZonedDT(d.atTime(ot.toLocalTime).atZone(ot.getOffset))
      case (DLocalTime(lt), _) => DLocalDT(d.atTime(lt))
      case _ => t
    }
  }

  def betweenIn(unit: String, a: TVal, b: TVal): DDuration = {
    if (isTimeOnly(a) || isTimeOnly(b)) {
      def hasDate(v: TVal) = v match {
        case DDate(_) | DLocalDT(_) | DZonedDT(_) => true; case _ => false }
      unit match {
        case "inMonths" => DDuration(0, 0, 0, 0)
        case "inDays"   => DDuration(0, 0, 0, 0)
        case _ if isTimeOnly(a) && hasDate(b) =>
          betweenIn(unit, anchorTimeOnly(a, b), b)
        case _ if isTimeOnly(b) && hasDate(a) =>
          betweenIn(unit, a, anchorTimeOnly(b, a))
        case _ => mkDuration(0, 0, 0, timeOnlyNanos(a, b))
      }
    } else anchorPair(a, b) match {
      case Right((za, zb)) => unit match {
        case "inMonths" => DDuration(ChronoUnit.MONTHS.between(za, zb), 0, 0, 0)
        case "inDays"   => DDuration(0, ChronoUnit.DAYS.between(za, zb), 0, 0)
        case _ =>
          // seconds+nanos, not total nanos: NANOS.between overflows Long
          // past ~292 years (TCK Temporal10 [10])
          val d = java.time.Duration.between(za, zb)
          mkDuration(0, 0, d.getSeconds, d.getNano.toLong)
      }
      case Left((la, lb)) => unit match {
        case "inMonths" => DDuration(ChronoUnit.MONTHS.between(la, lb), 0, 0, 0)
        case "inDays"   => DDuration(0, ChronoUnit.DAYS.between(la, lb), 0, 0)
        case _ =>
          val d = java.time.Duration.between(la, lb)
          mkDuration(0, 0, d.getSeconds, d.getNano.toLong)
      }
    }
  }

  // ---------------- arithmetic ----------------

  def plus(v: TVal, d: DDuration): TVal = v match {
    case DDate(x) =>
      // a date absorbs months, days, AND whole days from the time part
      // (⌊seconds/86400⌋, symmetric toward zero — TCK Temporal8 [1]: a
      // 33.97-hour time component moves the date one day each direction);
      // the sub-day remainder truncates
      val extraDays = (d.totalNanos / BigInt(86400000000000L)).toLong
      DDate(x.plusMonths(d.months).plusDays(d.days + extraDays))
    case DLocalDT(x)   => DLocalDT(x.plusMonths(d.months).plusDays(d.days)
      .plusSeconds(d.seconds).plusNanos(d.nanos))
    case DZonedDT(x)   => DZonedDT(x.plusMonths(d.months).plusDays(d.days)
      .plusSeconds(d.seconds).plusNanos(d.nanos))
    case DLocalTime(x) => DLocalTime(x.plusSeconds(d.seconds).plusNanos(d.nanos))
    case DZonedTime(x) => DZonedTime(x.plusSeconds(d.seconds).plusNanos(d.nanos))
    case x: DDuration  => mkDuration(x.months + d.months, x.days + d.days,
      x.seconds + d.seconds, x.nanos + d.nanos)
  }

  def negate(d: DDuration): DDuration =
    mkDuration(-d.months, -d.days, -d.seconds, -d.nanos)

  def minus(v: TVal, d: DDuration): TVal = plus(v, negate(d))

  def scale(d: DDuration, k: BigDecimal): DDuration = {
    val months = BigDecimal(d.months) * k
    val wm = months.setScale(0, BigDecimal.RoundingMode.DOWN)
    // fractional month → Gregorian average days (365.2425/12 = 30.436875,
    // exactly 2629746 s) — same calendar constant parseDuration/
    // buildDuration use; a plain 30 silently drops 0.436875 d/month
    val days = BigDecimal(d.days) * k + (months - wm) * BigDecimal("30.436875")
    val wd = days.setScale(0, BigDecimal.RoundingMode.DOWN)
    val secs = (BigDecimal(d.seconds) + BigDecimal(d.nanos) / 1000000000L) * k +
      (days - wd) * 86400
    // truncate (not round) the sub-nano remainder — the reference's long
    // cast drops it: 1 ns × 0.5 is 0, not 1 (TCK Temporal8 [7])
    val tn = (secs * 1000000000L).setScale(0, BigDecimal.RoundingMode.DOWN).toBigInt
    mkDuration(wm.toLong, wd.toLong, (tn / 1000000000L).toLong, (tn % 1000000000L).toLong)
  }

  // ---------------- component access ----------------

  def component(v: TVal, name: String): Option[Any] = {
    val wf = WeekFields.ISO
    def dc(d: LocalDate): PartialFunction[String, Any] = {
      case "year"         => d.getYear.toLong
      case "quarter"      => d.get(IsoFields.QUARTER_OF_YEAR).toLong
      case "month"        => d.getMonthValue.toLong
      case "week"         => d.get(wf.weekOfWeekBasedYear()).toLong
      case "weekYear"     => d.get(IsoFields.WEEK_BASED_YEAR).toLong
      case "day"          => d.getDayOfMonth.toLong
      case "ordinalDay"   => d.getDayOfYear.toLong
      case "dayOfWeek" | "weekDay" => d.getDayOfWeek.getValue.toLong
      case "dayOfQuarter" | "quarterDay" => d.get(IsoFields.DAY_OF_QUARTER).toLong
    }
    def tc(t: LocalTime): PartialFunction[String, Any] = {
      case "hour"        => t.getHour.toLong
      case "minute"      => t.getMinute.toLong
      case "second"      => t.getSecond.toLong
      case "millisecond" => (t.getNano / 1000000).toLong
      case "microsecond" => (t.getNano / 1000).toLong
      case "nanosecond"  => t.getNano.toLong
    }
    def oc(o: ZoneOffset): PartialFunction[String, Any] = {
      case "offset"        => renderOffset(o)
      case "offsetMinutes" => (o.getTotalSeconds / 60).toLong
      case "offsetSeconds" => o.getTotalSeconds.toLong
      case "timezone"      => renderOffset(o)
    }
    val pf: PartialFunction[String, Any] = v match {
      case DDate(d)      => dc(d)
      case DLocalDT(d)   => dc(d.toLocalDate) orElse tc(d.toLocalTime)
      case DZonedDT(d)   => dc(d.toLocalDate) orElse tc(d.toLocalTime) orElse
        // zone name BEFORE oc: oc also answers "timezone" (as the offset),
        // which would shadow a named zone like Europe/Stockholm
        ({
          case "timezone"     => d.getZone.toString
          case "epochSeconds" => d.toEpochSecond
          case "epochMillis"  => d.toInstant.toEpochMilli
        }: PartialFunction[String, Any]) orElse oc(d.getOffset)
      case DLocalTime(t) => tc(t)
      case DZonedTime(t) => tc(t.toLocalTime) orElse oc(t.getOffset)
      case dd: DDuration => {
        case "years"   => dd.months / 12
        case "months"  => dd.months
        case "weeks"   => dd.days / 7
        case "days"    => dd.days
        case "hours"   => (dd.totalNanos / BigInt(3600000000000L)).toLong
        case "minutes" => (dd.totalNanos / BigInt(60000000000L)).toLong
        case "seconds" => dd.seconds
        case "milliseconds" => (dd.totalNanos / 1000000).toLong
        case "microseconds" => (dd.totalNanos / 1000).toLong
        case "nanoseconds"  => dd.totalNanos.toLong
        case "monthsOfYear"    => dd.months % 12
        case "monthsOfQuarter" => dd.months % 3
        case "quarters"        => dd.months / 3
        case "quartersOfYear"  => (dd.months % 12) / 3
        case "daysOfWeek"      => dd.days % 7
        case "minutesOfHour"   => (dd.totalNanos / BigInt(60000000000L)).toLong % 60
        case "secondsOfMinute" => dd.seconds % 60
        case "millisecondsOfSecond" => dd.nanos / 1000000
        case "microsecondsOfSecond" => dd.nanos / 1000
        case "nanosecondsOfSecond"  => dd.nanos
      }
    }
    pf.lift(name)
  }

  def renderOffset(o: ZoneOffset): String =
    if (o.getTotalSeconds == 0) "Z" else o.getId

  // ---------------- Spark column materialization ----------------

  /** Fold result → Spark literal column. Native types where Spark has
    * them (DateType, µs TimestampNTZ — ordering/comparison stay native);
    * a tagged `{_tkind, _iso, components…}` struct literal otherwise.
    * The struct is parquet-storable (property writes) and component
    * fields keep `stored.year`-style access working at runtime. */
  def kindName(v: TVal): String = v match {
    case _: DLocalDT   => "localdatetime"
    case _: DZonedDT   => "datetime"
    case _: DLocalTime => "localtime"
    case _: DZonedTime => "time"
    case _: DDuration  => "duration"
    case _: DDate      => "date"
  }

  /** Sort key: total nanos on the kind's chronological axis (instant for
    * zoned values; average-length for durations). Split `/1000` + `%1000`
    * into `_sortus`/`_sortns` so year-9999 instants stay in Long range. */
  def sortNanos(v: TVal): BigInt = v match {
    case DZonedDT(z)   => BigInt(z.toEpochSecond) * 1000000000L + z.getNano
    case DLocalDT(l)   => BigInt(l.toEpochSecond(ZoneOffset.UTC)) * 1000000000L + l.getNano
    case DZonedTime(t) =>
      BigInt(t.toLocalTime.toNanoOfDay) - BigInt(t.getOffset.getTotalSeconds) * 1000000000L
    case DLocalTime(t) => BigInt(t.toNanoOfDay)
    case d: DDuration  =>
      d.totalNanos + (BigInt(d.months) * 2629746 + BigInt(d.days) * 86400) * 1000000000L
    case DDate(d)      => BigInt(d.toEpochDay) * 86400000000000L
  }

  /** The component-name order of the tagged struct encoding, per kind
    * family. Shared by the literal `column` builder and the runtime
    * encoder ([[TemporalRuntime]]) so both produce identical structs. */
  def componentOrder(v: TVal): Seq[String] = v match {
    case _: DDuration =>
      Seq("months", "days", "seconds", "nanosecondsOfSecond",
        "years", "quarters", "weeks", "hours", "minutes",
        "milliseconds", "microseconds", "nanoseconds",
        "quartersOfYear", "monthsOfYear", "monthsOfQuarter",
        "daysOfWeek", "minutesOfHour", "secondsOfMinute",
        "millisecondsOfSecond", "microsecondsOfSecond")
    case _ =>
      Seq("year", "quarter", "month", "week", "weekYear", "day",
        "ordinalDay", "dayOfWeek", "weekDay", "dayOfQuarter",
        "quarterDay", "hour", "minute", "second", "millisecond",
        "microsecond", "nanosecond", "timezone", "offset",
        "offsetMinutes", "offsetSeconds", "epochSeconds", "epochMillis")
  }

  /** The full (name, value) field list of the tagged struct encoding —
    * `_tkind`, `_sortus`/`_sortns`, `_iso`, then the kind's defined
    * components in [[componentOrder]]. */
  def structFields(v: TVal): Seq[(String, Any)] = {
    val sn = sortNanos(v)
    Seq("_tkind" -> (kindName(v): Any),
      "_sortus" -> (sn / 1000).toLong, "_sortns" -> (sn % 1000).toLong,
      "_iso" -> render(v)) ++
      componentOrder(v).flatMap(n => component(v, n).map(n -> _))
  }

  def column(v: TVal): org.apache.spark.sql.Column = column(v, forceStruct = false)

  /** `forceStruct = true` skips the native fast paths — used when a value
    * must type-match sibling struct-encoded values (mixed-precision
    * literal lists, runtime-computed results). */
  def column(v: TVal, forceStruct: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    v match {
      case DDate(d) if !forceStruct => lit(java.sql.Date.valueOf(d))
      case DLocalDT(d) if !forceStruct && d.getNano % 1000 == 0 => lit(d)
      case _ =>
        // struct comparison is field-by-field: `_sortus`/`_sortns` right
        // after the kind make ORDER BY chronological (instant order for
        // zoned values — lexicographic _iso order is NOT, e.g.
        // '12:35+05:00' precedes '10:35-08:00')
        struct(structFields(v).map { case (n, x) => lit(x).as(n) }: _*)
    }
  }

  // ---------------- comparison ----------------

  /** Total order within a kind; None across kinds (openCypher null). */
  def cmp(a: TVal, b: TVal): Option[Int] = (a, b) match {
    case (DDate(x), DDate(y))           => Some(x.compareTo(y))
    case (DLocalDT(x), DLocalDT(y))     => Some(x.compareTo(y))
    case (DZonedDT(x), DZonedDT(y))     => Some(x.toInstant.compareTo(y.toInstant))
    case (DLocalTime(x), DLocalTime(y)) => Some(x.compareTo(y))
    case (DZonedTime(x), DZonedTime(y)) =>
      Some(java.lang.Long.compare(
        x.toLocalTime.toNanoOfDay - x.getOffset.getTotalSeconds * 1000000000L,
        y.toLocalTime.toNanoOfDay - y.getOffset.getTotalSeconds * 1000000000L))
    case (x: DDuration, y: DDuration) =>
      // durations are only comparable when unambiguous; compare by
      // average-length total (the reference's pragmatic order)
      val ax = x.totalNanos + (BigInt(x.months) * 2629746 + BigInt(x.days) * 86400) * 1000000000L
      val ay = y.totalNanos + (BigInt(y.months) * 2629746 + BigInt(y.days) * 86400) * 1000000000L
      Some(ax.compare(ay))
    case _ => None
  }
}
