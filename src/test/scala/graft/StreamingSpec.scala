package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream-stream join's state bound (VERDICT r4 #5): with both
  * sides watermarked, Spark evicts join state older than
  * watermark + join range, so state size tracks the RECENT window, not
  * the whole stream — the invariant that lets the join run unbounded.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  test("stream-stream join state is watermark-bounded and matches the batch join") {
    // lay the events out as many time-ordered files so AvailableNow +
    // maxFilesPerTrigger=1 runs one micro-batch per file and the
    // watermark advances between batches (a single file would be one
    // batch: no eviction observable)
    val srcDir = "/tmp/graft_state/streamspec_join_src"
    val p = java.nio.file.Paths.get(srcDir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val ev = Tables.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
      .filter(col("user_id") < 10)
    val n = 12
    // one file per time slice, written SEQUENTIALLY in slice order: the
    // file source admits files in modification-time order, so the stream
    // replays in event-time order and the watermark advances every batch
    val Array(lo, hi) = ev
      .agg(unix_micros(min(col("ts"))), unix_micros(max(col("ts")))).collect()
      .head.toSeq.map(_.toString.toLong).toArray
    val step = (hi - lo) / n + 1
    val tsUs = unix_micros(col("ts"))
    (0 until n).foreach { k =>
      ev.filter(tsUs >= lo + k * step && tsUs < lo + (k + 1) * step)
        .coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(5) // distinct mtimes → deterministic admission order
    }

    val (result, progress) =
      graft.operators.StreamingOps.streamSelfJoin(spark, srcDir, Some(1))

    // 1) correctness: stream answer ≡ batch answer on the same data
    val batch = {
      val e = ev // already normalized to µs TimestampType
      val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
      val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"))
      a.join(b, col("a_user") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("a_id"), col("b_id"), col("a_user").as("user_id"))
    }
    val got = result.orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    val exp = batch.orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    assert(got == exp, s"stream join != batch join (${got.length} vs ${exp.length} rows)")

    // 2) the state bound: after the final batch, retained state on each
    //    side is only rows that could still match — ts ≥ watermark − 1h
    //    (the join range). Derive the bound from the reported watermark
    //    itself plus that range, and compare to the actual row count in
    //    that window; anything near total input means eviction is broken.
    val withState = progress.filter(_.stateOperators.nonEmpty)
    assert(withState.length >= n - 1, s"expected ~$n micro-batches, got ${withState.length}")
    val last = withState.last
    val wmStr = last.eventTime.get("watermark")
    assert(wmStr != null, "no watermark reported on the final batch")
    val wm = java.time.Instant.parse(wmStr).toEpochMilli
    val stateRows = last.stateOperators.map(_.numRowsTotal).sum
    val totalInput = ev.count()
    // the retained window is [watermark − 1h join range, ∞)
    val wmMicros = wm * 1000L
    val inWindow = ev.filter(tsUs >= lit(wmMicros - 3600L * 1000000L)).count()
    // each side keeps ≤ inWindow rows (+1 batch of slack for rows that
    // arrived after the watermark was computed)
    val lastBatchRows = last.numInputRows
    val bound = 2 * inWindow + lastBatchRows
    assert(stateRows <= bound,
      s"state $stateRows rows exceeds watermark-derived bound $bound " +
        s"(inWindow=$inWindow, lastBatch=$lastBatchRows)")
    assert(stateRows < totalInput,
      s"state $stateRows did not shrink below total input $totalInput — no eviction")
    // eviction actually happened somewhere along the run
    assert(withState.exists(_.stateOperators.exists(_.numRowsRemoved > 0)),
      "no batch reported evicted state rows")
  }
}
