package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench exit predicate (r9 verdict, "What's wrong" #1): a clean
  * sweep must exit 0 even when contention tiebreak reruns fired; only a
  * query that actually THREW makes the sweep nonzero. The r9 regression was
  * positional — the rc check read the tiebreak Option instead of the error
  * Option after a tuple reshape — so these tests exercise rows with every
  * combination of (tiebreak, err) populated.
  */
class BenchSpec extends AnyFunSuite {
  import Bench.BenchRow

  test("clean sweep with no reruns exits 0") {
    val rows = Seq(
      BenchRow("q_a", 0.4, 0.3, None, None),
      BenchRow("q_b", 1.2, 1.1, None, None))
    assert(Bench.exitCode(rows) == 0)
  }

  test("clean sweep WITH tiebreak reruns still exits 0") {
    val rows = Seq(
      BenchRow("q_a", 3.0, 0.6, Some(0.55), None),
      BenchRow("q_b", 0.2, 0.2, None, None))
    assert(Bench.exitCode(rows) == 0)
  }

  test("any thrown query exits 2, with or without reruns elsewhere") {
    val rows = Seq(
      BenchRow("q_a", 3.0, 0.6, Some(0.55), None),
      BenchRow("q_bad", 0.01, 0.01, None, Some("AnalysisException: boom")))
    assert(Bench.exitCode(rows) == 2)
    assert(Bench.exitCode(rows.take(1)) == 0)
  }

  test("per-row min takes the tiebreak run when it is fastest") {
    assert(BenchRow("q", 3.0, 0.6, Some(0.5), None).min == 0.5)
    assert(BenchRow("q", 3.0, 0.6, None, None).min == 0.6)
  }
}
