package graft.sql

/** AST for the ArcadeDB-SQL-dialect front-end (SURVEY.md §3.1).
  *
  * Mirrors the reference's statement surface at the granularity our
  * translator needs (reference query/sql/parser/SelectStatement.java and
  * the 226-file parser AST package; grammar
  * engine/src/main/antlr4/.../SQLParser.g4): SELECT projections over one
  * type target with WHERE / GROUP BY / HAVING / ORDER BY / SKIP / LIMIT /
  * DISTINCT / UNWIND. There is deliberately NO separate logical algebra —
  * like the reference (AST → physical directly), we go AST → Catalyst,
  * and Catalyst provides the optimizing middle the reference lacks.
  */
object Ast {

  sealed trait Expr
  final case class Ident(name: String)                          extends Expr
  final case class NumLit(v: BigDecimal, isIntegral: Boolean)   extends Expr
  final case class StrLit(v: String)                            extends Expr
  final case class BoolLit(v: Boolean)                          extends Expr
  case object NullLit                                           extends Expr
  final case class FnCall(name: String, args: Seq[Expr], star: Boolean = false) extends Expr
  /** value.method(args) — reference SQLMethod surface. */
  final case class MethodCall(target: Expr, name: String, args: Seq[Expr]) extends Expr
  /** value.field — struct-field / graph-variable property access. */
  final case class PropAccess(target: Expr, name: String)       extends Expr
  final case class Bin(op: String, l: Expr, r: Expr)            extends Expr
  final case class Neg(e: Expr)                                 extends Expr
  final case class Not(e: Expr)                                 extends Expr
  final case class InList(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  final case class Between(e: Expr, lo: Expr, hi: Expr)         extends Expr
  final case class LikeOp(e: Expr, pat: Expr, caseInsensitive: Boolean) extends Expr
  /** MATCHES = regex (reference QueryOperatorMatches). */
  final case class Matches(e: Expr, pat: Expr)                  extends Expr
  final case class IsNull(e: Expr, negated: Boolean)            extends Expr
  /** CONTAINS on collections (CONTAINSALL/CONTAINSANY variants). */
  final case class ContainsOp(e: Expr, kind: String, arg: Expr) extends Expr
  /** List literal `[e1, e2, ...]`. */
  final case class ArrayLit(items: Seq[Expr])                   extends Expr
  /** `CASE [operand] WHEN w THEN t ... [ELSE e] END` — searched form when
    * `operand` is None (openCypher caseExpression; a dialect superset on
    * the SQL side, whose grammar lacks CASE). */
  final case class CaseExpr(operand: Option[Expr],
      branches: Seq[(Expr, Expr)], els: Option[Expr])           extends Expr

  /** Embedded-document literal `{'k': v, …}` (reference json-style map
    * literals in projections, e.g. `SELECT {'x': 1}`) → a struct column. */
  final case class StructLit(fields: Seq[(String, Expr)])          extends Expr
  /** Nested projection `expr:{f1, f2 AS a}` / `expr:{*, !f}` (reference
    * query/sql/parser/NestedProjection.java — re-projects an embedded
    * document to the named fields, or all-but-excluded with `*`/`!`). */
  final case class NestedProj(target: Expr,
      includes: Seq[(String, Option[String])], excludes: Seq[String],
      star: Boolean)                                               extends Expr

  /** Cypher list quantifier `all|any|none|single(v IN list WHERE p)`
    * (Cypher25Parser.g4 quantifier) → higher-order forall/exists. */
  final case class Quantifier(kind: String, varName: String,
      list: Expr, pred: Expr)                                      extends Expr

  /** Cypher list comprehension `[v IN list WHERE p | m]` (Cypher25Parser.g4
    * listComprehension; reference executes it as an interpreted expression
    * — here it compiles to higher-order `filter`/`transform` columns, so
    * it stays inside codegen). WHERE and the `| map` part are each
    * optional. */
  final case class ListComp(varName: String, list: Expr,
      where: Option[Expr], map: Option[Expr])                   extends Expr
  /** Cypher pattern comprehension `[(a)-[:T]->(b) WHERE p | m]`
    * (Cypher25Parser.g4 patternComprehension). `chain` is the front-end's
    * pattern representation, kept opaque at this layer — only the Cypher
    * pipeline can resolve it against a graph (it becomes a grouped
    * collect over the pattern's join frame). */
  final case class PatternComp(chain: AnyRef, where: Option[Expr],
      map: Expr,
      /** `[p = (a)-->(b) | …]`: the comprehension's own path variable —
        * the map expression may return the whole path value through it. */
      pathVar: Option[String] = None,
      /** A BARE pattern in expression position (`WHERE (n)-->(a)`), not a
        * comprehension or EXISTS/COUNT block: openCypher forbids it from
        * introducing new named variables and from appearing in a
        * projection (TCK Pattern1 [10][22][23]). */
      bare: Boolean = false)                                    extends Expr

  /** Scalar subquery `(SELECT …)` — resolved to a [[Resolved]] literal at
    * compile time (the reference evaluates global LET subqueries once,
    * SelectExecutionPlanner.splitLet :745). */
  final case class Subquery(sel: Select)                        extends Expr
  /** Multi-clause existential/count subquery `EXISTS { MATCH … WITH …
    * RETURN … }` — the body is kept as VERBATIM SOURCE (its own variable
    * scope, parsed and compiled by the Cypher pipeline as a standalone
    * query correlated on the outer variables it references). */
  final case class ExistsSub(body: String, isCount: Boolean)    extends Expr
  /** Engine-internal: a pre-evaluated scalar (never produced by the parser). */
  final case class Resolved(value: Any)                         extends Expr
  /** A LET-bound 1x1 subquery result carries BOTH readings: the scalar
    * (arithmetic/comparison uses — `$top - 2000`) and the one-row result
    * set (collection uses — `unionall($a, $b)`, `expand($b)`); the use
    * site picks (reference LET binds a ResultSet; a 1x1 auto-unwraps in
    * scalar contexts). */
  final case class LetDual(scalar: Expr, list: Expr)             extends Expr
  /** Engine-internal: a pre-built Spark Column (never produced by the
    * parser) — the Cypher front-end's dynamic-typing (variant) rewrites
    * emit these, carrying their static tag ('v' variant, 'b' boolean,
    * 'i' integral, …) so the surrounding typing rules keep composing. */
  final case class ColRef(c: org.apache.spark.sql.Column, tag: Char = '?',
      dt: Option[org.apache.spark.sql.types.DataType] = None,
      /** The wrapped column is an AGGREGATE call — containsAgg must see
        * it so implicit grouping keeps treating it as one. */
      agg: Boolean = false) extends Expr
  /** Engine-internal: a compile-time-folded temporal value
    * ([[Temporals.TVal]]) — the Cypher front-end's exact temporal
    * interpreter produces these; [[Temporals.column]] materializes them. */
  final case class TemporalLit(v: Temporals.TVal)               extends Expr

  final case class Projection(expr: Expr, alias: Option[String])
  final case class OrderItem(expr: Expr, asc: Boolean)

  /** Top-down expression rewrite: applies `f` at the node, then recurses
    * into the (possibly replaced) node's children. Leaves [[Subquery]]
    * and [[PatternComp]] chains opaque (their inner scopes bind their own
    * variables); their WHERE/map expressions are still rewritten. */
  def mapDown(e: Expr)(f: Expr => Expr): Expr = {
    def go(x: Expr): Expr = mapDown(x)(f)
    f(e) match {
      case x @ (Ident(_) | NumLit(_, _) | StrLit(_) | BoolLit(_) | NullLit |
                Resolved(_) | ColRef(_, _, _, _) | TemporalLit(_) | Subquery(_) |
                ExistsSub(_, _)) => x
      case FnCall(n, args, st)    => FnCall(n, args.map(go), st)
      case MethodCall(t, n, args) => MethodCall(go(t), n, args.map(go))
      case PropAccess(t, n)       => PropAccess(go(t), n)
      case Bin(op, l, r)          => Bin(op, go(l), go(r))
      case Neg(x)                 => Neg(go(x))
      case Not(x)                 => Not(go(x))
      case InList(x, xs, n)       => InList(go(x), xs.map(go), n)
      case Between(x, lo, hi)     => Between(go(x), go(lo), go(hi))
      case LikeOp(x, p, ci)       => LikeOp(go(x), go(p), ci)
      case Matches(x, p)          => Matches(go(x), go(p))
      case IsNull(x, n)           => IsNull(go(x), n)
      case ContainsOp(x, k, a)    => ContainsOp(go(x), k, go(a))
      case ArrayLit(xs)           => ArrayLit(xs.map(go))
      case CaseExpr(op, bs, els)  =>
        CaseExpr(op.map(go), bs.map { case (w, t) => (go(w), go(t)) }, els.map(go))
      case StructLit(fs)          => StructLit(fs.map { case (k, v) => (k, go(v)) })
      case NestedProj(t, inc, exc, st) => NestedProj(go(t), inc, exc, st)
      case Quantifier(k, v, l, p) => Quantifier(k, v, go(l), go(p))
      case ListComp(v, l, w, m)   => ListComp(v, go(l), w.map(go), m.map(go))
      case PatternComp(ch, w, m, pv, bare) => PatternComp(ch, w.map(go), go(m), pv, bare)
      case other                  => other
    }
  }

  /** DML statements (reference InsertExecutionPlanner.java,
    * UpdateExecutionPlanner.java, DeleteExecutionPlanner.java; grammar
    * SQLParser.g4 insertStatement/updateStatement/deleteStatement). */
  sealed trait Stmt
  /** INSERT INTO t [(cols)] VALUES (…),(…) | SET c = e, … |
    * CONTENT {…} / [{…}, …] | [FROM] SELECT …. SET desugars to a
    * one-row VALUES; CONTENT rows carry their own keys (schema-evolving). */
  final case class InsertStmt(target: String, cols: Seq[String],
      values: Seq[Seq[Expr]], from: Option[Select],
      content: Seq[Expr] = Seq.empty) extends Stmt
  /** One UPDATE … REMOVE item. `form`:
    *  - "eq"      — `REMOVE c = v`: drop map key v / list value v
    *  - "bracket" — `REMOVE c[i]` / `c[i, j, …]`: drop map key(s) /
    *                list element(s) BY INDEX (reference remove1/remove2)
    *  - "all"     — `REMOVE c`: drop the whole property */
  final case class UpdateRemove(col: String, form: String, args: Seq[Expr])

  /** UPDATE t [SET c = e, …] [REMOVE item, …] [CONTENT {…}] [MERGE {…}]
    * [UPSERT] [RETURN BEFORE|AFTER|COUNT] [WHERE …]. CONTENT replaces
    * the whole property set with the map; MERGE folds the map's keys in,
    * keeping the others (reference UpdateStatementExecutionTest
    * content()/merge()). */
  final case class UpdateStmt(target: String, sets: Seq[(String, Expr)],
      upsert: Boolean, ret: String, where: Option[Expr],
      removes: Seq[UpdateRemove] = Seq.empty,
      content: Option[Expr] = None, mergeMap: Option[Expr] = None) extends Stmt
  /** DELETE FROM t [WHERE …]. */
  final case class DeleteStmt(target: String, where: Option[Expr]) extends Stmt

  final case class Select(
      projections: Seq[Projection], // empty = SELECT *
      from: String,
      where: Option[Expr],
      groupBy: Seq[Expr],
      having: Option[Expr],
      orderBy: Seq[OrderItem],
      skip: Option[Long],
      limit: Option[Long],
      distinct: Boolean,
      unwind: Option[String],
      lets: Seq[(String, Expr)] = Seq.empty,
      /** "plain" | "rollup" | "cube" | "sets" — multi-dimensional GROUP BY
        * (free Spark capability; the reference grammar has only plain
        * GROUP BY, SQLParser.g4:1262 — SURVEY.md §2.4). */
      groupKind: String = "plain",
      /** For groupKind = "sets": the explicit grouping sets. */
      groupSets: Seq[Seq[Expr]] = Seq.empty,
      /** Derived-table target `FROM (SELECT …)` (reference
        * FetchFromResultsetStep); when set, `from` is empty. */
      fromSub: Option[Select] = None,
      /** `SELECT *, !a, !b` — star-projection exclusions (reference
        * exclude(); the top-level sibling of nested `{*, !f}`). */
      excludes: Seq[String] = Seq.empty)
}
