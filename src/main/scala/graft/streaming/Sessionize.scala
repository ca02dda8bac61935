package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Custom stateful streaming: gap-based sessionization per user —
  * SURVEY.md §2.10 last row ("stateful ops: flatMapGroupsWithState
  * available when needed"). Two equivalent paths:
  *
  *   - batch: Spark's built-in `session_window(ts, gap)` aggregation
  *     (prefer built-ins — codegen'd, merge-combines partials);
  *   - streaming: `KeyValueGroupedDataset.flatMapGroupsWithState` holding
  *     each user's events in [[GroupState]], re-sessionizing every batch
  *     and emitting the current sessions (update semantics). On a bounded
  *     AvailableNow stream the final emission equals the batch answer —
  *     exactly what the oracle checks. In a continuous deployment the
  *     same function runs unchanged; consumers keep the latest emission
  *     per (user, session start).
  *
  * Scale: state is per-user (the group key partitions the state store);
  * the gap split is O(n log n) in the group's events per trigger.
  * Session timestamps travel as epoch-µs longs so no sub-ms precision is
  * lost crossing the Timestamp boundary.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class Session(user_id: Long, s_start: Long, s_end: Long, n: Long, total: Double)

  /** Split one user's events into sessions: a gap > `gapMicros` between
    * consecutive events starts a new session; session end = last event +
    * gap (session_window semantics). Decimal-exact sums
    * (BigDecimal.valueOf == the oracle's DECIMAL cast on 2-dp data). */
  def split(evs: Seq[Ev], gapMicros: Long): Seq[Session] = {
    if (evs.isEmpty) return Seq.empty
    val sorted = evs.sortBy(_.ts_us)
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var start = sorted.head.ts_us
    var prev = start
    var n = 0L
    var total = BigDecimal(0)
    def flush(): Unit =
      out += Session(sorted.head.user_id, start, prev + gapMicros, n, total.toDouble)
    sorted.foreach { e =>
      if (e.ts_us - prev > gapMicros && n > 0) { flush(); start = e.ts_us; n = 0; total = 0 }
      prev = e.ts_us
      n += 1
      total += BigDecimal.valueOf(e.value)
    }
    flush()
    out.toSeq
  }

  /** Streaming sessionization over a bounded parquet stream; returns the
    * final memory-sink table (= the batch answer, see scaladoc). */
  def streamSessions(
      spark: SparkSession, srcDir: String, gapMicros: Long, sinkName: String,
      userFilter: Long): DataFrame = {
    import spark.implicits._
    // Layout-adaptive read ([[graft.Tables.eventsStream]]) — ts arrives as
    // µs TimestampType whatever the parquet carried; unix_micros recovers
    // the exact epoch-µs long the session math runs on.
    val evs = graft.Tables.eventsStream(spark, srcDir)
      .filter(col("user_id") < userFilter)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]
    val sessions = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[Ev], state: GroupState[Seq[Ev]]) => {
          val all = state.getOption.getOrElse(Seq.empty) ++ batch
          state.update(all)
          split(all, gapMicros).iterator
        })
    // r12: state partitions sized from the source like the other stream
    // queries (was: the session's batch default, 32 state stores for a
    // single-file bounded replay) — see StateScope.
    val q = StateScope.withStatePartitions(
        spark, StateScope.statePartitionsFor(spark, srcDir)) {
      val q0 = sessions.writeStream.format("memory").queryName(sinkName)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q0.awaitTermination(); q0
    }
    spark.table(sinkName)
  }
}
