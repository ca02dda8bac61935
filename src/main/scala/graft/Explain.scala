package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** EXPLAIN / PROFILE surface (reference parser/ExplainStatement.java,
  * ProfileStatement.java — SURVEY.md §2.11 last row).
  *
  * EXPLAIN = the Catalyst plan in the requested mode; PROFILE = run the
  * plan, then read back the per-operator runtime metrics Spark collected
  * (rows produced, time in exchange, spill sizes…) — the same numbers the
  * reference's profiler attaches to each execution step.
  */
object Explain {

  /** Plan text: mode ∈ simple | extended | codegen | cost | formatted. */
  def explain(df: DataFrame, mode: String = "formatted"): String =
    df.queryExecution.explainString(ExplainMode.fromString(mode))

  /** Execute and return (operator, metric, value) rows. */
  def profile(df: DataFrame): Seq[(String, String, Long)] = {
    df.collect() // drive THIS queryExecution (count() would plan a new one)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[(String, String, Long)] = {
      // AQE wraps the real tree; its `children` is empty — descend into
      // the materialized adaptive plan (and reused/staged subtrees).
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p.metrics.toSeq.map { case (name, m) => (p.nodeName, name, m.value) } ++
        kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
