package graft.promql

import graft.sql.Parser
import graft.sql.Parser.{ParseException, TId, TNum, TOp, TStr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** PromQL-lite front-end — the reference serves PromQL over its
  * time-series types (server/.../GetPromQLQueryRangeHandler.java,
  * GetPromQLQueryHandler.java; SURVEY.md §2 "HTTP/PromQL endpoints").
  * This closes the last deferred query surface: range-query evaluation of
  *
  *   [agg] [by (labels)] ( fn ( metric{label="v", label2!="v", l=~"re"} [range] ) ) [op scalar]
  *
  * with fn ∈ rate | increase | sum_over_time | avg_over_time |
  * min_over_time | max_over_time | count_over_time | last_over_time and
  * agg ∈ sum | avg | min | max | count. A bare selector (no [range]) is
  * last_over_time with a one-step lookback, Prometheus's instant-vector
  * default. increase = last − first sample in the window (counter
  * semantics); rate = increase / window-seconds.
  *
  * Distributed evaluation — the part Prometheus does per-step on one node:
  * each sample explodes to the step indexes whose window (t−W, t] covers
  * it (a bounded factor ≤ W/step + 1), then ONE shuffle groups
  * (step, series-labels). No per-step re-scan, no driver loop: wall-clock
  * scales with samples × (W/step), not with the step count, and the
  * explode+groupBy pipeline is whole-stage-codegen'd.
  */
object PromQL {

  final case class Matcher(label: String, op: String, value: String)
  sealed trait PExpr
  final case class Selector(metric: String, matchers: Seq[Matcher],
      rangeSec: Option[Long]) extends PExpr
  final case class FnOver(fn: String, sel: Selector) extends PExpr
  final case class AggBy(op: String, by: Seq[String], arg: PExpr) extends PExpr
  final case class ScalarOp(op: String, e: PExpr, scalar: Double) extends PExpr

  private val OverFns = Set("rate", "increase", "sum_over_time", "avg_over_time",
    "min_over_time", "max_over_time", "count_over_time", "last_over_time")
  private val AggOps = Set("sum", "avg", "min", "max", "count")

  // ---------------- parser ----------------

  def parse(text: String): PExpr = graft.StatementCache.cached("promql", text) {
    val p = new Parser.P(Parser.lex(text))
    val e = parseExpr(p)
    if (p.peek != Parser.TEof) throw ParseException(s"trailing input at ${p.peek}")
    e
  }

  private def parseExpr(p: Parser.P): PExpr = {
    val base = parseUnary(p)
    // binary with a scalar literal on the right: expr (+|-|*|/) number
    p.peek match {
      case TOp(op @ ("+" | "-" | "*" | "/")) =>
        p.next()
        p.next() match {
          case TNum(s) => ScalarOp(op, base, s.toDouble)
          case t => throw ParseException(s"expected scalar after $op, found $t")
        }
      case _ => base
    }
  }

  private def parseUnary(p: Parser.P): PExpr = p.peek match {
    case TId(id) if AggOps.contains(id.toLowerCase) =>
      // `sum [by (l1, l2)] (expr)`
      p.next()
      val by = if (p.kw("BY")) {
        p.expectOp("(")
        val b = Seq.newBuilder[String]
        b += Parser.ident(p)
        while (p.op(",")) b += Parser.ident(p)
        p.expectOp(")")
        b.result()
      } else Seq.empty
      p.expectOp("(")
      val arg = parseExpr(p)
      p.expectOp(")")
      AggBy(id.toLowerCase, by, arg)
    case TId(id) if OverFns.contains(id.toLowerCase) =>
      p.next(); p.expectOp("(")
      val sel = parseSelector(p)
      p.expectOp(")")
      FnOver(id.toLowerCase, sel)
    case _ => parseSelector(p)
  }

  private def parseSelector(p: Parser.P): Selector = {
    val metric = Parser.ident(p)
    val ms = Seq.newBuilder[Matcher]
    if (p.op("{")) {
      if (!p.op("}")) {
        var more = true
        while (more) {
          val l = Parser.ident(p)
          val op =
            if (p.op("=~")) "=~" else if (p.op("!~")) "!~"
            else if (p.op("!=")) "!=" else { p.expectOp("="); "=" }
          val v = p.next() match {
            case TStr(s) => s
            case t => throw ParseException(s"expected quoted label value, found $t")
          }
          ms += Matcher(l, op, v)
          more = p.op(",")
        }
        p.expectOp("}")
      }
    }
    val range = if (p.op("[")) {
      val n = p.next() match {
        case TNum(s) => s.toLong
        case t => throw ParseException(s"expected duration, found $t")
      }
      val unit = Parser.ident(p).toLowerCase match {
        case "s" => 1L; case "m" => 60L; case "h" => 3600L; case "d" => 86400L
        case u => throw ParseException(s"unknown duration unit $u")
      }
      p.expectOp("]")
      Some(n * unit)
    } else None
    Selector(metric, ms.result(), range)
  }

  // ---------------- evaluation ----------------

  /** Metric registry: metric name → (table, timestamp col, value col,
    * label cols). The events table is the TS demo source. */
  private def source(spark: SparkSession, dir: String, metric: String)
      : (DataFrame, String, String, Seq[String]) = metric match {
    case "events" => (graft.Tables.events(spark, dir), "ts", "value",
      Seq("event_type", "user_id"))
    case other => throw ParseException(s"unknown metric $other")
  }

  private def decSum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)

  /** Range-query evaluation on the step grid start + i*step, i ≥ 0,
    * grid ≤ end. `start`/`end` are naive ISO timestamps ("2024-01-02
    * 00:00:00"), interpreted in the session's UTC zone (tz-independent of
    * the JVM default). Output: (t, <label cols>, value), one row per
    * step × live series. */
  def rangeQuery(spark: SparkSession, dir: String, text: String,
      start: String, end: String, stepSec: Long): DataFrame =
    evalExpr(spark, dir, parse(text), start, end, stepSec)

  private def isoToUs(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  private def evalExpr(spark: SparkSession, dir: String, e: PExpr,
      start: String, end: String, stepSec: Long): DataFrame = e match {

    case sel: Selector => // instant vector: last sample in a one-step lookback
      evalExpr(spark, dir, FnOver("last_over_time", sel.copy(rangeSec = Some(stepSec))),
        start, end, stepSec)

    case ScalarOp(op, inner, s) =>
      val df = evalExpr(spark, dir, inner, start, end, stepSec)
      val v = op match {
        case "+" => col("value") + s
        case "-" => col("value") - s
        case "*" => col("value") * s
        case "/" => col("value") / s
      }
      df.withColumn("value", v)

    case AggBy(op, by, arg) =>
      val df = evalExpr(spark, dir, arg, start, end, stepSec)
      val keys = col("t") +: by.map(col)
      val agg = op match {
        case "sum"   => decSum(col("value"))
        case "avg"   => (sum(col("value").cast(DecimalType(28, 4))) / count(lit(1))).cast(DoubleType)
        case "min"   => min(col("value"))
        case "max"   => max(col("value"))
        case "count" => count(lit(1)).cast(DoubleType) // PromQL vectors are float
      }
      df.groupBy(keys: _*).agg(agg.as("value"))

    case FnOver(fn, sel) =>
      val w = sel.rangeSec.getOrElse(
        throw ParseException(s"$fn needs a range selector — metric[5m]"))
      val (tbl, tsCol, valCol, labels) = source(spark, dir, sel.metric)
      val filtered = sel.matchers.foldLeft(tbl) { (d, m) =>
        val c = col(m.label).cast("string")
        d.filter(m.op match {
          case "="  => c === m.value
          case "!=" => c =!= m.value
          case "=~" => c.rlike("^(?:" + m.value + ")$") // PromQL anchors fully
          case "!~" => !c.rlike("^(?:" + m.value + ")$")
        })
      }
      // Step-index interval covered by each sample: t = start + i*step with
      // ts ≤ t < ts + W and start ≤ t ≤ end. Long math in micros. `div`
      // truncates toward zero, which is ceiling (wrong) for negative
      // numerators — a pre-start sample would land in step 0 — so shift by
      // M whole steps to keep every numerator non-negative (floor = trunc),
      // then shift back.
      val S = stepSec * 1000000L
      val W = w * 1000000L
      val startUs = isoToUs(start)
      val endUs = isoToUs(end)
      val maxI = (endUs - startUs) / S
      val M = startUs / S + 1 // us ≥ 0 (epoch) ⇒ us - startUs + M*S ≥ 0
      val iFirst = greatest(lit(0L),
        expr(s"(unix_micros($tsCol) - ${startUs}L + ${M * S}L + ${S - 1}L) div ${S}L - ${M}L"))
      val iLast = least(lit(maxI),
        expr(s"(unix_micros($tsCol) - ${startUs}L + ${M * S}L + ${W - 1}L) div ${S}L - ${M}L"))
      val exploded = filtered
        .withColumn("__i0", iFirst).withColumn("__i1", iLast)
        .filter(col("__i0") <= col("__i1"))
        .withColumn("__i", explode(sequence(col("__i0"), col("__i1"))))
        .withColumn("t", timestamp_micros(lit(startUs) + col("__i") * S))
      val keys = col("t") +: labels.map(col)
      val v = col(valCol)
      val agg = fn match {
        case "sum_over_time"   => decSum(v)
        case "avg_over_time"   => (sum(v.cast(DecimalType(28, 4))) / count(lit(1))).cast(DoubleType)
        case "min_over_time"   => min(v)
        case "max_over_time"   => max(v)
        case "count_over_time" => count(lit(1)).cast(DoubleType)
        case "last_over_time"  => max_by(v, col(tsCol))
        case "increase"        => (max_by(v, col(tsCol)) - min_by(v, col(tsCol))).cast(DoubleType)
        case "rate"            => ((max_by(v, col(tsCol)) - min_by(v, col(tsCol))) / w).cast(DoubleType)
      }
      exploded.groupBy(keys: _*).agg(agg.as("value"))
  }
}
