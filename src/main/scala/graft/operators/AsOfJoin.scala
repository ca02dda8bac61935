package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each probe row picks the latest reference row
  * with `ref.ts <= probe.ts` within its key group.
  *
  * The reference engine has no as-of join (SURVEY.md §2.3 last row —
  * closest is ts.correlate); this is one of the beyond-the-reference
  * operators a training-data/time-series pipeline needs (the builder
  * brief's custom-operator archetype).
  *
  * Scale design — the union-window trick, NOT a range join: tag reference
  * rows, union both streams, one shuffle on the key, then a running
  * `last(ignoreNulls)` ordered by (ts, ref-first) fills each probe row
  * with the newest reference row at-or-before it. O(n log n) per key
  * group, no quadratic candidate pairs, no broadcast requirement —
  * survives 100 TB where a theta-join `l.ts >= r.ts` would explode.
  * Reference rows sort BEFORE probe rows at equal ts so `>=` semantics
  * match DuckDB's native ASOF JOIN (the oracle).
  */
object AsOfJoin {

  /** `left` and `right` must both carry `key` and `ts`; every other
    * `right` column is delivered to each left row as the as-of value
    * (null when no reference row precedes it). */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val valCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val taggedRight = right
      .select((col(key) +: col(ts) +: valCols.map(c => col(c).as(s"__r_$c"))) :+
        lit(1).as("__is_ref"): _*)
    val taggedLeft = left
      .select(left.columns.map(col) :+ lit(0).as("__is_ref"): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valCols.foldLeft(unioned)((d, c) =>
      d.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__is_ref") === 0)
      .select(left.columns.map(col) ++
        valCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  val all: Seq[Q] = Seq(

    // ---- each click picks the latest at-or-before error per user ----
    Q("q_asof_join",
      """SELECT l.event_id, l.user_id,
        |  r.value AS asof_value, epoch_us(r.ts) AS asof_ts_us
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click' AND user_id < 20) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click" && col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
      asof(clicks, errors, key = "user_id", ts = "ts")
        .select(col("event_id"), col("user_id"),
          col("asof_value"), col("asof_ts_us"))
        .orderBy("event_id")
    }
  )
}
