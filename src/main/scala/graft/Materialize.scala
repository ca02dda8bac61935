package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative operators (BFS levels,
  * PageRank/CC/label-prop rounds, gremlin repeat, dedup signature reuse).
  *
  * These loops pin intermediate frames so a 20-round fixpoint doesn't
  * build a 20-deep plan and shared subtrees run once. On `local[*]`,
  * `localCheckpoint` is the right tool: blocks live in the one and only
  * "executor", and it skips the reliable-checkpoint write+reread. On a
  * real cluster it is a reliability trade — executor-local, NON-replicated
  * blocks mean one lost executor kills the job, and the pinned lineage
  * defeats dynamic allocation.
  *
  * Policy: when a checkpoint directory is configured (`spark.checkpoint.dir`
  * or `SparkContext.setCheckpointDir` — i.e. a deployment that cares about
  * executor loss), use reliable `checkpoint` into it; otherwise fall back
  * to `localCheckpoint`. Local-mode behavior (and the bench) is unchanged.
  */
object Materialize {

  /** Materialize (or, with eager=false, mark-for-materialization) `df`,
    * truncating lineage via the configured checkpoint policy. */
  def once(df: DataFrame, eager: Boolean = true): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.getConf.getOption("spark.checkpoint.dir").foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }
}
