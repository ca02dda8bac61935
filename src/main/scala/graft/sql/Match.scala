package graft.sql

import graft.cypher.Cypher
import graft.cypher.Cypher.{MatchC, NodePat, PatternChain, RelPat, ReturnItem}
import graft.graph.PropertyGraph
import graft.sql.Ast._
import graft.sql.Parser.{ParseException, TEof, TId, TNum, TOp, TStr}
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

  def parse(text: String): Cypher.CypherQuery = parseFull(text)._1

  /** Parse plus the context-variable RETURN mode (`$patterns` / `$paths` /
    * `$elements` / `$pathElements` — reference MatchExecutionPlanner
    * returnPatterns/returnPaths/returnElements/returnPathElements) and the
    * named/all variable lists the modes project. */
  private[graft] def parseFull(text: String): (Cypher.CypherQuery, Option[(String, Seq[String])]) = {
    // dashComments OFF: the MATCH pattern surface uses `-->` / `<--`
    // anonymous arrows (same reason the openCypher front-end keeps it off)
    val p = new Parser.P(Parser.lex(text))
    p.expectKw("MATCH")
    val chains = Seq.newBuilder[PatternChain]
    val negChains = Seq.newBuilder[PatternChain]
    val wheres = Seq.newBuilder[Expr]
    val namedVars = Seq.newBuilder[String]
    val allVars = Seq.newBuilder[String]
    def path(neg: Boolean): Unit = {
      val nodes = Seq.newBuilder[NodePat]
      val rels = Seq.newBuilder[RelPat]
      var chainOptional = false
      // a NOT chain may only reference ALREADY-BOUND aliases: its unnamed
      // nodes stay anonymous inside the predicate and a `where:` there has
      // no outer row to filter (reference negativePattern shapes)
      val negWheres = Seq.newBuilder[Expr]
      def node(f: Filter): NodePat =
        // inside NOT, only aliases bound by a positive chain keep their
        // name (they correlate the anti-join); anything else — unnamed or
        // referenced nowhere outside — is existential, i.e. anonymous
        if (neg && !(f.named && allVars.result().contains(f.node.varName.get)))
          f.node.copy(varName = None)
        else f.node
      def track(f: Filter): Unit = if (!neg) {
        f.node.varName.foreach(allVars += _)
        if (f.named) f.node.varName.foreach(namedVars += _)
      }
      def dest(rel: RelPat): Unit = {
        val f = filter(p, if (neg) negWheres else wheres)
        nodes += node(f)
        track(f)
        if (f.optional) chainOptional = true
        // while/maxDepth/$depth-window turn the incoming edge into a
        // variable-length walk (reference matchPathItem whileCondition /
        // maxDepth — MatchStatementExecutionTest testWhile/maxDepth:
        // depth 0 = the origin node itself, so the default window is
        // 0..bound, narrowed by any `where: ($depth …)` comparisons)
        rels += (f.depth match {
          case Some((lo, hi)) => rel.copy(hops = Some((lo, hi)))
          case None => rel
        })
      }
      nodes += {
        val f = filter(p, if (neg) negWheres else wheres)
        track(f)
        if (f.optional) chainOptional = true
        node(f)
      }
      var go = true
      while (go) {
        if (p.op("-")) { // -Edge-> | --> (anonymous)
          if (p.op("-")) {
            p.expectOp(">")
            dest(RelPat(None, None, direction = "out"))
          } else {
            val e = Parser.ident(p)
            p.expectOp("-")
            p.expectOp(">")
            dest(RelPat(None, Some(e), direction = "out"))
          }
        } else if (p.op("<")) { // <-Edge- | <-- (anonymous)
          p.expectOp("-")
          if (p.op("-")) dest(RelPat(None, None, direction = "in"))
          else {
            val e = Parser.ident(p)
            p.expectOp("-")
            dest(RelPat(None, Some(e), direction = "in"))
          }
        } else if (p.op(".")) { // .out('Edge') / .in('Edge') / .both('Edge')
          val m = Parser.ident(p).toLowerCase
          val dir = m match {
            case "out"  => "out"
            case "in"   => "in"
            case "both" => "both"
            case other => throw ParseException(s"unsupported match method $other")
          }
          p.expectOp("(")
          val e = if (p.peek == Parser.TOp(")")) None else Some(p.next() match {
            case TStr(s) => s
            case t => throw ParseException(s"expected edge-type string, found $t")
          })
          p.expectOp(")")
          dest(RelPat(None, e, direction = dir))
        } else go = false
      }
      // an optional chain still anchors its first node (reference
      // `optional:true` keeps every left row): emit a mandatory
      // single-node chain for the anchor, then the full chain as the
      // left-join extension — the same two-clause shape openCypher's
      // `MATCH (a) OPTIONAL MATCH (a)-->(b)` produces
      if (neg) {
        // `NOT {…}-->{…}`: an anti-pattern over already-bound aliases
        // (reference negativePattern tests) — compiled as a negated
        // pattern predicate on the shared Cypher backend
        if (negWheres.result().nonEmpty)
          throw ParseException("where: is not supported inside a NOT pattern")
        negChains += PatternChain(nodes.result(), rels.result(), optional = false)
      } else {
        if (chainOptional)
          chains += PatternChain(Seq(nodes.result().head), Seq.empty, optional = false)
        chains += PatternChain(nodes.result(), rels.result(), optional = chainOptional)
      }
    }
    path(neg = false)
    while (p.op(",")) path(neg = p.kw("NOT"))
    p.expectKw("RETURN")
    val distinct = p.kw("DISTINCT")
    // context-variable projections: `RETURN $patterns|$paths|$elements|$pathElements`
    val ctxMode: Option[(String, Seq[String])] = p.peek match {
      case TId(n) if Set("$patterns", "$paths", "$elements", "$pathElements")
          .exists(_.equalsIgnoreCase(n)) =>
        p.next()
        val named = namedVars.result().distinct
        val all = allVars.result().distinct
        n.toLowerCase.stripPrefix("$") match {
          case "patterns"     => Some("patterns" -> named)
          case "paths"        => Some("paths" -> all)
          case "elements"     => Some("elements" -> named)
          case "pathelements" => Some("pathelements" -> all)
        }
      case _ => None
    }
    val items = Seq.newBuilder[ReturnItem]
    def item(): Unit = {
      val e = Parser.parseExpr(p)
      val alias = if (p.kw("AS")) Some(Parser.ident(p)) else None
      items += ReturnItem(e, alias)
    }
    ctxMode match {
      case Some((_, vars)) =>
        require(vars.nonEmpty, "context-variable RETURN needs at least one pattern variable")
        vars.foreach(v => items += ReturnItem(Ident(v), Some(v)))
      case None =>
        item()
        while (p.op(",")) item()
    }
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
    // $patterns/$elements project DISTINCT named bindings (the reference
    // dedups the pattern set); $paths keeps one row per path
    val dedup = distinct ||
      ctxMode.exists(m => m._1 == "patterns" || m._1 == "elements")
    (Cypher.CypherQuery(
      Seq(MatchC(chains.result(), where,
        patternPreds = negChains.result().map(c => (c, true)))),
      items.result(), dedup, orderBy, skip, limit), ctxMode)
  }

  private var anon = 0
  private def freshVar(): String = synchronized { anon += 1; s"_m$anon" }

  private final case class Filter(node: NodePat, depth: Option[(Int, Int)],
      optional: Boolean, named: Boolean)

  /** `{type: t, as: v, where: (expr), optional: true, while: ($depth < n),
    * maxDepth: n}` — all keys optional; `where` props are qualified to the
    * node's alias. while/maxDepth and `where` comparisons on the `$depth`
    * context variable compose into one depth WINDOW (lo, hi) on the
    * preceding edge: depth 0 is the origin node, `while ($depth < n)`
    * reaches depth n, and `where: ($depth = k)` pins the window — exactly
    * the reference's whileCondition/maxDepth/depth-filter semantics
    * re-expressed as a var-length hop range. */
  private def filter(p: Parser.P, wheres: collection.mutable.Builder[Expr, Seq[Expr]]): Filter = {
    p.expectOp("{")
    var varName: Option[String] = None
    var label: Option[String] = None
    var cond: Option[Expr] = None
    var optional = false
    var lo = 0
    var hi = -1 // -1 = no depth traversal requested
    def widen(newHi: Int): Unit = hi = math.max(hi, newHi)
    // intersect the window with a `$depth <op> k` comparison
    def narrow(op: String, k: Int): Unit = op match {
      case "="  => lo = math.max(lo, k); hi = if (hi < 0) k else math.min(hi, k)
      case ">"  => lo = math.max(lo, k + 1)
      case ">=" => lo = math.max(lo, k)
      case "<"  => hi = if (hi < 0) k - 1 else math.min(hi, k - 1)
      case "<=" => hi = if (hi < 0) k else math.min(hi, k)
      case other => throw ParseException(s"unsupported \\$$depth comparison $other")
    }
    def isDepthRef(e: Expr): Boolean = e match {
      case Ident(n) => n.equalsIgnoreCase("$depth")
      case _ => false
    }
    def depthCond(e: Expr): Boolean = e match {
      case Bin(op, l, NumLit(k, _)) if isDepthRef(l) => narrow(op, k.toInt); true
      case Bin(op, NumLit(k, _), r) if isDepthRef(r) =>
        val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=")
        narrow(flip.getOrElse(op, op), k.toInt); true
      case _ => false
    }
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
            val c = Parser.parseExpr(p)
            p.expectOp(")")
            // a pure-$depth predicate narrows the hop window instead of
            // becoming a row filter
            if (!depthCond(c)) cond = Some(c)
          case "optional" => optional = p.next() match {
            case TId(s) => s.equalsIgnoreCase("true")
            case t => throw ParseException(s"expected true/false, found $t")
          }
          case "while" =>
            p.expectOp("(")
            val c = Parser.parseExpr(p)
            p.expectOp(")")
            c match {
              case BoolLit(true) | Ident("true") => widen(Int.MaxValue)
              case Bin("<", l, NumLit(k, _)) if isDepthRef(l)  => widen(k.toInt)
              case Bin("<=", l, NumLit(k, _)) if isDepthRef(l) => widen(k.toInt + 1)
              case other => throw ParseException(
                s"while supports (true) and \\$$depth bounds, got $other")
            }
          case "maxdepth" => p.next() match {
            case TNum(s) => widen(s.toInt)
            case t => throw ParseException(s"expected maxDepth number, found $t")
          }
          case other => throw ParseException(s"unsupported match filter key $other")
        }
        more = p.op(",")
      }
      p.expectOp("}")
    }
    val v = varName.getOrElse(freshVar())
    cond.foreach(c => wheres += qualify(c, v))
    Filter(NodePat(Some(v), label),
      if (hi < 0 && lo == 0) None else Some((lo, if (hi < 0) Int.MaxValue else hi)),
      optional, named = varName.isDefined)
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
  def query(g: PropertyGraph, text: String): DataFrame = {
    val (cq, ctxMode) = parseFull(text)
    val base = Cypher.compile(g, cq)
    ctxMode match {
      // $elements / $pathElements: one row per DISTINCT element across the
      // projected variables — unpivot the node structs and dedup on id
      case Some((m, vars)) if m == "elements" || m == "pathelements" =>
        vars.map(v => base.select(org.apache.spark.sql.functions.col(s"$v.*")))
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .dropDuplicates("id")
      case _ => base
    }
  }
}
