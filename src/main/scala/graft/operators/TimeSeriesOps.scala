package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series / ordered-window surface.
  *
  * The reference has no OVER clause; its ordered-window semantics are the
  * `ts.*` aggregated functions (reference function/sql/time/SQLFunctionLag
  * .java:40, SQLFunctionLead.java:40, SQLFunctionRank.java:36,
  * SQLFunctionRowNumber.java:33, SQLFunctionMovingAvg.java:37,
  * SQLFunctionDelta.java:30, SQLFunctionRate.java:44, SQLFunctionTsFirst
  * .java:30, SQLFunctionTsLast.java:30, SQLFunctionTsPercentile.java:40,
  * SQLFunctionTimeBucket.java:41, SQLFunctionInterpolate.java:37,
  * SQLFunctionCorrelate.java:32). Spark's Window API supersedes all of
  * them; `TsFunctions` exposes the reference names as sugar.
  *
  * Scale notes: window partitioning is by series key (user_id here) so the
  * shuffle is one exchange on the series key and each window is evaluated
  * within a partition — at 100 TB the series key must be the table's
  * partition/bucket key so the exchange is avoided entirely.
  */
object TsFunctions {
  /** Canonical series window: one time-series = one partition key, ordered
    * by timestamp with a unique tiebreaker for determinism. */
  def seriesWindow(key: Column, ts: Column, tiebreak: Column): WindowSpec =
    Window.partitionBy(key).orderBy(ts, tiebreak)

  def tsLag(value: Column, offset: Int, w: WindowSpec): Column  = lag(value, offset).over(w)
  def tsLead(value: Column, offset: Int, w: WindowSpec): Column = lead(value, offset).over(w)
  def tsRank(w: WindowSpec): Column      = rank().over(w)
  def tsRowNumber(w: WindowSpec): Column = row_number().over(w)
  def tsDelta(value: Column, w: WindowSpec): Column = value - lag(value, 1).over(w)
  /** Per-second rate of change, reference SQLFunctionRate.java:44. */
  def tsRate(value: Column, ts: Column, w: WindowSpec): Column = {
    val dv = value - lag(value, 1).over(w)
    val dt = unix_timestamp(ts) - unix_timestamp(lag(ts, 1).over(w))
    when(dt > 0, dv / dt)
  }
  def tsMovingAvg(value: Column, windowSize: Int, w: WindowSpec): Column =
    avg(value).over(w.rowsBetween(-(windowSize - 1), 0))
  /** Gap-fill with the last non-null value (SQLFunctionInterpolate.java:37
    * previous-value mode). */
  def tsInterpolate(value: Column, w: WindowSpec): Column =
    last(value, ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0))
  /** Interval-snap bucketing (SQLFunctionTimeBucket.java:41). */
  def timeBucket(interval: String, ts: Column): Column = date_trunc(interval, ts)
}

object TimeSeriesOps {
  import TsFunctions._

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private val w = seriesWindow(col("user_id"), col("ts"), col("event_id"))

  val all: Seq[Q] = Seq(

    // ---- ts.lag / ts.delta / ts.rate ----
    Q("q_ts_lag_delta",
      """SELECT event_id, user_id, value,
        |  lag(value) OVER w AS prev_value,
        |  value - lag(value) OVER w AS delta,
        |  round((value - lag(value) OVER w)
        |        / nullif(floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)), 0), 6) AS rate
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      ev(s, d).filter(col("user_id") < 20)
        .select(
          col("event_id"), col("user_id"), col("value"),
          tsLag(col("value"), 1, w).as("prev_value"),
          tsDelta(col("value"), w).as("delta"),
          round(tsRate(col("value"), col("ts"), w), 6).as("rate"))
        .orderBy("event_id")
    },

    // ---- ts.lead ----
    Q("q_ts_lead",
      """SELECT event_id, user_id,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin) { (s, d) =>
      ev(s, d).filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"),
          tsLead(col("event_type"), 1, w).as("next_type"))
        .orderBy("event_id")
    },

    // ---- ts.rank / ts.rowNumber (value-ordered within event_type) ----
    Q("q_ts_rank",
      """SELECT event_id, event_type,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  row_number() OVER w AS rn
        |FROM events WHERE event_id < 500
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val wv = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
      ev(s, d).filter(col("event_id") < 500)
        .select(col("event_id"), col("event_type"),
          rank().over(wv).as("rnk"),
          dense_rank().over(wv).as("drnk"),
          row_number().over(wv).as("rn"))
        .orderBy("event_id")
    },

    // ---- ts.movingAvg (5-row trailing window) ----
    Q("q_ts_moving_avg",
      """SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin) { (s, d) =>
      ev(s, d).filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"),
          round(tsMovingAvg(col("value"), 5, w), 4).as("mavg"))
        .orderBy("event_id")
    },

    // ---- ts.first / ts.last per series (arg-min/max by timestamp) ----
    Q("q_ts_first_last",
      """SELECT user_id,
        |  arg_min(value, ts) AS first_value,
        |  arg_max(value, ts) AS last_value,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      ev(s, d).groupBy(col("user_id"))
        .agg(
          min_by(col("value"), col("ts")).as("first_value"),
          max_by(col("value"), col("ts")).as("last_value"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    },

    // ---- ts.percentile per tag ----
    Q("q_ts_percentile",
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5D)"), 4).as("p50"),
          round(expr("percentile(value, 0.95D)"), 4).as("p95"))
        .orderBy("event_type")
    },

    // ---- ts.timeBucket: tumbling-window aggregate (the continuous-
    //      aggregate batch shape; reference SQLFunctionTimeBucket.java:41,
    //      schema/ContinuousAggregate.java:23-48) ----
    Q("q_time_bucket",
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  count(*) AS n, sum(value::DECIMAL(28,4))::DOUBLE AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy(timeBucket("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("bucket", "event_type")
    },

    // ---- ts.interpolate: previous-value gap fill over a nulled series ----
    Q("q_ts_interpolate",
      """SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |      FROM events WHERE user_id < 20)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      ev(s, d).filter(col("user_id") < 20)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .select(col("event_id"), col("user_id"),
          tsInterpolate(col("v"), w).as("filled"))
        .orderBy("event_id")
    },

    // ---- time-weighted average over irregular samples (TimescaleDB-class
    //      op the reference's downsampling tiers approximate): each sample
    //      weighted by its hold time until the next sample in the same
    //      (series, day) bucket; exact integer arithmetic — cents × µs —
    //      so the one IEEE divide at the end is engine-identical ----
    Q("q_ts_twa",
      """SELECT user_id, day,
        |  round(sum(CAST(round(value * 100) AS BIGINT) * dt_us)
        |        / (100.0 * sum(dt_us)), 6) AS twa
        |FROM (
        |  SELECT user_id, date_trunc('day', ts) AS day, value,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
        |  FROM events WHERE user_id < 10)
        |WHERE dt_us IS NOT NULL
        |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val day = date_trunc("day", col("ts"))
      ev(s, d).filter(col("user_id") < 10)
        .withColumn("day", day)
        .withColumn("dt_us", lead(unix_micros(col("ts")), 1).over(
          Window.partitionBy(col("user_id"), col("day")).orderBy(col("ts"), col("event_id")))
          - unix_micros(col("ts")))
        .filter(col("dt_us").isNotNull)
        .groupBy("user_id", "day")
        .agg(round(
          sum(round(col("value") * 100).cast("long") * col("dt_us"))
            / (lit(100.0) * sum(col("dt_us"))), 6).as("twa"))
        .orderBy("user_id", "day")
    },

    // ---- ts.correlate: Pearson correlation between two series
    //      (SQLFunctionCorrelate.java:32) ----
    Q("q_ts_correlate",
      """SELECT event_type, round(corr(value, floor(epoch(ts))), 4) AS c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(round(corr(col("value"), unix_timestamp(col("ts"))), 4).as("c"))
        .orderBy("event_type")
    }
  )
}
