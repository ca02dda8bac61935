package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Push struct-field extraction through conditional branches:
  *
  *   GetStructField(CaseWhen(c1 -> struct1, …, else), i)
  *     → CaseWhen(c1 -> GetStructField(struct1, i), …)
  *
  * Catalyst's SimplifyExtractValueOps collapses
  * GetStructField(CreateNamedStruct) but does NOT look through
  * CaseWhen/If, so a per-row conditional struct — the variant calculus'
  * dispatch shape ([[graft.cypher.Variant]]: `when(cond, asInt)
  * .when(…, asStr).otherwise(asList)`) — is materialized in FULL (12
  * fields, three canonical string encodings) even when the consumer
  * reads only the 3 sort-key fields. Pushing the extraction into the
  * branches lets the existing rule prune every untouched field: the
  * 1M-row mixed ORDER BY drops from ~12 computed encodings per row to
  * the 3 the sort actually needs (pinned by VariantPerfSpec).
  *
  * The trade: each extracted field re-evaluates the branch CONDITIONS.
  * Dispatch conditions are cheap scalar predicates (rank compares, `%`),
  * while branch values are wide struct constructions — strictly the
  * right side of the trade for the shapes this engine generates; the
  * branch-count cap keeps pathological many-armed conditionals out.
  *
  * Registered via `spark.experimental.extraOptimizations`
  * ([[graft.GraftSession.build]]) — runs after the main optimizer
  * batch, and the built-in SimplifyExtractValueOps + constant folding
  * run again afterward in the fixed-point loop of the same batch.
  */
object ExtractThroughBranches extends Rule[LogicalPlan] {
  private val MaxBranches = 10

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GetStructField(cw: CaseWhen, ord, name)
        if cw.branches.length <= MaxBranches && constructsStruct(cw) =>
      CaseWhen(
        cw.branches.map { case (c, v) => (c, extract(v, ord, name)) },
        cw.elseValue.map(extract(_, ord, name)))
    case GetStructField(If(p, t, f), ord, name)
        if constructs(t) || constructs(f) =>
      If(p, extract(t, ord, name), extract(f, ord, name))
  }

  /** Extraction with immediate collapse over struct constructors: this
    * batch runs AFTER the main operator-optimization fixed point, so
    * SimplifyExtractValueOps won't get another pass — collapse
    * GetStructField(CreateNamedStruct) here (same rewrite the built-in
    * rule performs) or the pushed extraction would still build the
    * whole struct per branch. */
  private def extract(e: Expression, ord: Int, name: Option[String]): Expression = e match {
    case c: CreateNamedStruct => c.valExprs(ord)
    case If(p, t, f) => If(p, extract(t, ord, name), extract(f, ord, name))
    case cw: CaseWhen if cw.branches.length <= MaxBranches =>
      CaseWhen(cw.branches.map { case (c, v) => (c, extract(v, ord, name)) },
        cw.elseValue.map(extract(_, ord, name)))
    case other => GetStructField(other, ord, name)
  }

  /** Only rewrite when at least one branch actually BUILDS a struct —
    * pushing into plain column references just duplicates the CaseWhen
    * per field with nothing to prune. */
  private def constructsStruct(cw: CaseWhen): Boolean =
    cw.branches.exists(b => constructs(b._2)) || cw.elseValue.exists(constructs)

  private def constructs(e: Expression): Boolean = e match {
    case _: CreateNamedStruct => true
    case _: UpdateFields => true
    case If(_, t, f) => constructs(t) || constructs(f)
    case c: CaseWhen => constructsStruct(c)
    case a: Alias => constructs(a.child)
    case _ => false
  }
}
