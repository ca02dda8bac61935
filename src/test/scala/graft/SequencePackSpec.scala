package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed-scan contract of
  * [[graft.operators.SequencePack.globalRunningOffset]]: the two-phase
  * (partition-local window + driver prefix of a bounded per-partition
  * manifest) running sum must equal the naive single-partition global
  * window EXACTLY, for any partition count — the whole point is paying
  * zero correctness for removing the scale-killing global sort. */
class SequencePackSpec extends AnyFunSuite {
  import TestSession.spark

  test("two-phase running offset equals the single-partition window") {
    // non-uniform sizes and a non-contiguous key space
    val df = spark.range(0, 997).select(
      (col("id") * 3 + (col("id") % 5)).as("k"),
      ((col("id") * 31 % 211) + 1).as("n"))
    val naive = df.withColumn("start",
        sum(col("n")).over(Window.orderBy(col("k"))) - col("n"))
      .select("k", "start").orderBy("k").collect().toSeq
    for (parts <- Seq(1, 3, 16)) {
      val got = graft.operators.SequencePack
        .globalRunningOffset(df, "k", "n", parts)
        .select("k", "start").orderBy("k").collect().toSeq
      assert(got === naive, s"two-phase scan diverged at parts=$parts")
    }
  }

  test("empty input yields an empty result, not an error") {
    val df = spark.range(0).select(col("id").as("k"), lit(1L).as("n"))
    assert(graft.operators.SequencePack.globalRunningOffset(df, "k", "n", 4).count() === 0)
  }
}
