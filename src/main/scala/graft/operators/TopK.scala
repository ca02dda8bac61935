package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-global top-k with a rank column, shaped so the FULL input is
  * never sorted in a single partition.
  *
  * `df.orderBy(o).limit(k)` compiles to `TakeOrderedAndProject`: each
  * partition keeps its local top-k (a bounded heap), and only k·P rows
  * merge — the two-phase partial top-k a 1000-executor cluster needs.
  * The rank is then derived with `row_number()` over the ALREADY-limited
  * ≤k rows: `TakeOrderedAndProjectExec.outputPartitioning` is
  * `SinglePartition` and its `outputOrdering` is the sort order, so
  * Catalyst inserts NO Exchange and NO Sort for the window — the plan is
  * `Window(TakeOrderedAndProject(...))` with zero shuffles after the
  * aggregation that produced the scores. Contrast with
  * `row_number().over(Window.orderBy(...))` on the unlimited input, which
  * moves EVERY row to one partition (the round-2 scale-killer; see
  * reference index/fulltext/FullTextQueryExecutor.java:178 for the
  * semantics being ranked).
  *
  * `order` must be a deterministic total order (ties broken by id) so the
  * k-th boundary is engine-portable.
  */
object TopK {

  def ranked(df: DataFrame, k: Int, rankCol: String, order: Column*): DataFrame =
    df.orderBy(order: _*)
      .limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))
}
