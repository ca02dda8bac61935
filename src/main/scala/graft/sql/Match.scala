package graft.sql

import graft.cypher.Cypher
import graft.cypher.Cypher.{MatchC, NodePat, PatternChain, RelPat, ReturnItem}
import graft.graph.PropertyGraph
import graft.sql.Ast._
import graft.sql.Parser.{ParseException, TEof, TId, TStr}
import org.apache.spark.sql.DataFrame

/** The SQL dialect's own graph-pattern statement (reference grammar
  * SQLParser.g4:233-296 matchStatement, planner
  * exec/MatchExecutionPlanner.java:59):
  *
  *   MATCH {type: customer, as: c, where: (key < 50)}
  *           -placed->{type: order, as: o}
  *           .out('contains'){type: part, as: p}
  *   RETURN c.key AS k, count(*) AS n  [ORDER BY …] [SKIP …] [LIMIT …]
  *
  * Supported surface: `{type:, as:, where: (…)}` node filters, arrow edges
  * `-E->` / `<-E-`, method edges `.out('E')` / `.in('E')`, multiple
  * comma-separated path expressions (joined on shared aliases), RETURN
  * [DISTINCT] with Cypher-style implicit grouping, ORDER BY / SKIP /
  * LIMIT.
  *
  * Translation: the statement parses into the same clause structures the
  * openCypher front-end produces and compiles through [[Cypher.compile]]
  * — one pattern-join backend serves both query languages, the same way
  * the reference's MatchExecutionPlanner and Cypher planner share the
  * match-step machinery. A node filter's `where` uses bare property names
  * scoped to its node (matchFilterItem semantics); they are qualified to
  * `alias.prop` during parsing so the shared compiler sees ordinary
  * property accesses.
  */
object Match {

  def parse(text: String): Cypher.CypherQuery = {
    val p = new Parser.P(Parser.lex(text, dashComments = true))
    p.expectKw("MATCH")
    val chains = Seq.newBuilder[PatternChain]
    val wheres = Seq.newBuilder[Expr]
    def path(): Unit = {
      val nodes = Seq.newBuilder[NodePat]
      val rels = Seq.newBuilder[RelPat]
      nodes += filter(p, wheres)
      var go = true
      while (go) {
        if (p.op("-")) { // -Edge->
          val e = Parser.ident(p)
          p.expectOp("-")
          p.expectOp(">")
          rels += RelPat(None, Some(e), direction = "out")
          nodes += filter(p, wheres)
        } else if (p.op("<")) { // <-Edge-
          p.expectOp("-")
          val e = Parser.ident(p)
          p.expectOp("-")
          rels += RelPat(None, Some(e), direction = "in")
          nodes += filter(p, wheres)
        } else if (p.op(".")) { // .out('Edge') / .in('Edge')
          val m = Parser.ident(p).toLowerCase
          val ltr = m match {
            case "out" => true
            case "in"  => false
            case other => throw ParseException(s"unsupported match method $other")
          }
          p.expectOp("(")
          val e = p.next() match {
            case TStr(s) => s
            case t => throw ParseException(s"expected edge-type string, found $t")
          }
          p.expectOp(")")
          rels += RelPat(None, Some(e), direction = if (ltr) "out" else "in")
          nodes += filter(p, wheres)
        } else go = false
      }
      chains += PatternChain(nodes.result(), rels.result(), optional = false)
    }
    path()
    while (p.op(",")) path()
    p.expectKw("RETURN")
    val distinct = p.kw("DISTINCT")
    val items = Seq.newBuilder[ReturnItem]
    def item(): Unit = {
      val e = Parser.parseExpr(p)
      val alias = if (p.kw("AS")) Some(Parser.ident(p)) else None
      items += ReturnItem(e, alias)
    }
    item()
    while (p.op(",")) item()
    val orderBy = if (p.kw("ORDER")) {
      p.expectKw("BY")
      val b = Seq.newBuilder[OrderItem]
      var more = true
      while (more) {
        val e = Parser.parseExpr(p)
        val asc = if (p.kw("DESC")) false else { p.kw("ASC"); true }
        b += OrderItem(e, asc)
        more = p.op(",")
      }
      b.result()
    } else Seq.empty
    val skip = if (p.kw("SKIP"))
      Some(NumLit(BigDecimal(Parser.longLit(p)), isIntegral = true)) else None
    val limit = if (p.kw("LIMIT"))
      Some(NumLit(BigDecimal(Parser.longLit(p)), isIntegral = true)) else None
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    val where = wheres.result().reduceOption((a, b) => Bin("AND", a, b))
    Cypher.CypherQuery(Seq(MatchC(chains.result(), where)),
      items.result(), distinct, orderBy, skip, limit)
  }

  private var anon = 0
  private def freshVar(): String = synchronized { anon += 1; s"_m$anon" }

  /** `{type: t, as: v, where: (expr)}` — all keys optional; `where` props
    * are qualified to the node's alias. */
  private def filter(p: Parser.P, wheres: collection.mutable.Builder[Expr, Seq[Expr]]): NodePat = {
    p.expectOp("{")
    var varName: Option[String] = None
    var label: Option[String] = None
    var cond: Option[Expr] = None
    if (!p.op("}")) {
      var more = true
      while (more) {
        val k = Parser.ident(p).toLowerCase
        p.expectOp(":")
        k match {
          case "type" => label = Some(p.next() match {
            case TId(s) => s
            case TStr(s) => s
            case t => throw ParseException(s"expected type name, found $t")
          })
          case "as" => varName = Some(Parser.ident(p))
          case "where" =>
            p.expectOp("(")
            cond = Some(Parser.parseExpr(p))
            p.expectOp(")")
          case other => throw ParseException(s"unsupported match filter key $other")
        }
        more = p.op(",")
      }
      p.expectOp("}")
    }
    val v = varName.getOrElse(freshVar())
    cond.foreach(c => wheres += qualify(c, v))
    NodePat(Some(v), label)
  }

  /** Scope bare identifiers in a node filter's `where` to the node alias. */
  private def qualify(e: Expr, v: String): Expr = {
    def q(x: Expr): Expr = qualify(x, v)
    e match {
      case Ident(n)               => PropAccess(Ident(v), n)
      case pa: PropAccess         => pa // already scoped (alias.prop)
      case Bin(op, l, r)          => Bin(op, q(l), q(r))
      case Neg(x)                 => Neg(q(x))
      case Not(x)                 => Not(q(x))
      case FnCall(n, args, s)     => FnCall(n, args.map(q), s)
      case MethodCall(t, m, args) => MethodCall(q(t), m, args.map(q))
      case InList(x, es, n)       => InList(q(x), es.map(q), n)
      case Between(x, lo, hi)     => Between(q(x), q(lo), q(hi))
      case LikeOp(x, pat, ci)     => LikeOp(q(x), pat, ci)
      case Matches(x, pat)        => Matches(q(x), pat)
      case IsNull(x, n)           => IsNull(q(x), n)
      case ContainsOp(x, k, a)    => ContainsOp(q(x), k, q(a))
      case ArrayLit(es)           => ArrayLit(es.map(q))
      case CaseExpr(op, bs, els)  => CaseExpr(op.map(q), bs.map(b => (q(b._1), q(b._2))), els.map(q))
      case other                  => other
    }
  }

  /** Entry point: run a SQL-dialect MATCH statement against a graph. */
  def query(g: PropertyGraph, text: String): DataFrame =
    Cypher.compile(g, parse(text))
}
