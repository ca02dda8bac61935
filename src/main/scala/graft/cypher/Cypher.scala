package graft.cypher

import graft.graph.PropertyGraph
import graft.sql.{Ast, Parser}
import graft.sql.Ast._
import graft.sql.Parser.{ParseException, TEof, TId, TOp}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** openCypher front-end for the MATCH/RETURN core (the reference's second
  * primary query surface — query/opencypher/planner/CypherExecutionPlanner
  * .java:44, grammar Cypher25Parser.g4; SURVEY.md §3.2).
  *
  * Supported: `MATCH` pattern chains `(a:label)-[r:type]->(b)` (both
  * directions, multi-hop), additional `MATCH` / `OPTIONAL MATCH` clauses
  * joined on shared variables (ExpandInto / OptionalMatchStep analogs),
  * `WHERE`, `RETURN [DISTINCT]` with aggregates and Cypher's implicit
  * grouping (non-aggregate items are the group key), `ORDER BY`, `SKIP`,
  * `LIMIT`. Expressions reuse the dialect expression parser (`a.key`,
  * functions, count(DISTINCT …)).
  *
  * Translation: each pattern chain becomes vertices⋈edges⋈vertices joins
  * over the [[PropertyGraph]] DataFrames with per-variable column
  * prefixes; a later clause joins its chain to the accumulated frame on
  * the shared variables' id columns (left_outer when OPTIONAL). Catalyst
  * then owns join strategy — broadcast for small anchors, shuffle-hash
  * otherwise — which is the distributed replacement for the reference's
  * cost-based expansion-order rule (optimizer/rules/JoinOrderRule.java:58).
  */
object Cypher {

  final case class NodePat(varName: Option[String], label: Option[String])
  /** `hops = None` → single edge; `Some((lo, hi))` → variable-length
    * `*lo..hi` (walk semantics: edge composition, matching a recursive-CTE
    * oracle; openCypher's relationship-uniqueness is not enforced). */
  final case class RelPat(relType: Option[String], leftToRight: Boolean,
      hops: Option[(Int, Int)] = None)
  final case class PatternChain(nodes: Seq[NodePat], rels: Seq[RelPat], optional: Boolean)
  final case class ReturnItem(expr: Expr, alias: Option[String])
  final case class CypherQuery(
      patterns: Seq[PatternChain],
      where: Option[Expr],
      items: Seq[ReturnItem],
      distinct: Boolean,
      orderBy: Seq[OrderItem],
      skip: Option[Long],
      limit: Option[Long])

  // ---------------- parser ----------------

  def parse(text: String): CypherQuery = {
    val p = new Parser.P(Parser.lex(text))
    val patterns = Seq.newBuilder[PatternChain]
    var where: Option[Expr] = None
    var go = true
    while (go) {
      val optional = p.kw("OPTIONAL")
      p.expectKw("MATCH")
      patterns += parseChain(p, optional)
      while (p.op(",")) patterns += parseChain(p, optional)
      if (p.kw("WHERE")) {
        val w = Parser.parseExpr(p)
        where = Some(where.fold(w)(prev => Bin("AND", prev, w)))
      }
      go = p.peekKw("MATCH") || p.peekKw("OPTIONAL")
    }
    p.expectKw("RETURN")
    val distinct = p.kw("DISTINCT")
    val items = Seq.newBuilder[ReturnItem]
    items += parseItem(p)
    while (p.op(",")) items += parseItem(p)
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
    val skip = if (p.kw("SKIP")) Some(Parser.longLit(p)) else None
    val limit = if (p.kw("LIMIT")) Some(Parser.longLit(p)) else None
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    CypherQuery(patterns.result(), where, items.result(), distinct, orderBy, skip, limit)
  }

  private def parseItem(p: Parser.P): ReturnItem = {
    val e = Parser.parseExpr(p)
    val alias = if (p.kw("AS")) Some(Parser.ident(p)) else None
    ReturnItem(e, alias)
  }

  private def parseChain(p: Parser.P, optional: Boolean): PatternChain = {
    val nodes = Seq.newBuilder[NodePat]
    val rels = Seq.newBuilder[RelPat]
    nodes += parseNode(p)
    var go = true
    while (go) {
      if (p.op("-")) {
        // -[r:type*lo..hi]-> or -[r:type]-
        p.expectOp("[")
        val v = p.peek match { case TId(s) => p.next(); Some(s); case _ => None }
        val t = if (p.op(":")) Some(Parser.ident(p)) else None
        val hops = parseHops(p)
        p.expectOp("]")
        p.expectOp("-")
        val ltr = p.op(">")
        val _ = v // relationship variables accepted, not yet projectable
        rels += RelPat(t, leftToRight = ltr, hops)
        nodes += parseNode(p)
      } else if (p.op("<")) {
        // <-[r:type]-
        p.expectOp("-")
        p.expectOp("[")
        val v = p.peek match { case TId(s) => p.next(); Some(s); case _ => None }
        val t = if (p.op(":")) Some(Parser.ident(p)) else None
        val hops = parseHops(p)
        p.expectOp("]")
        p.expectOp("-")
        val _ = v
        rels += RelPat(t, leftToRight = false, hops)
        nodes += parseNode(p)
      } else go = false
    }
    PatternChain(nodes.result(), rels.result(), optional)
  }

  /** `*`, `*n`, `*lo..hi` (bare `*` defaults to 1..3). The lexer emits
    * "1..3" as a single numeric token (digits+dots), split here. */
  private def parseHops(p: Parser.P): Option[(Int, Int)] =
    if (p.op("*")) {
      p.peek match {
        case Parser.TNum(s) =>
          p.next()
          if (s.contains("..")) {
            val parts = s.split("\\.\\.")
            Some((parts(0).toInt, parts(1).toInt))
          } else Some((s.toInt, s.toInt))
        case _ => Some((1, 3))
      }
    } else None

  private def parseNode(p: Parser.P): NodePat = {
    p.expectOp("(")
    val v = p.peek match {
      case TId(s) => p.next(); Some(s)
      case _ => None
    }
    val label = if (p.op(":")) Some(Parser.ident(p)) else None
    p.expectOp(")")
    NodePat(v, label)
  }

  // ---------------- translator ----------------

  /** Rewrite `v.prop` property accesses into the flat `v_prop` columns
    * the pattern join produces. */
  private def flatten(e: Expr): Expr = e match {
    case PropAccess(Ident(v), prop) => Ident(s"${v}_$prop")
    case PropAccess(t, prop)        => PropAccess(flatten(t), prop)
    case Ident(v)                   => Ident(s"${v}_id") // bare node var = its identity
    case Bin(op, l, r)              => Bin(op, flatten(l), flatten(r))
    case Neg(x)                     => Neg(flatten(x))
    case Not(x)                     => Not(flatten(x))
    case FnCall(n, args, s)         => FnCall(n, args.map(flatten), s)
    case MethodCall(t, m, args)     => MethodCall(flatten(t), m, args.map(flatten))
    case InList(x, es, n)           => InList(flatten(x), es.map(flatten), n)
    case Between(x, lo, hi)         => Between(flatten(x), flatten(lo), flatten(hi))
    case LikeOp(x, pat, ci)         => LikeOp(flatten(x), pat, ci)
    case Matches(x, pat)            => Matches(flatten(x), pat)
    case IsNull(x, n)               => IsNull(flatten(x), n)
    case ContainsOp(x, k, a)        => ContainsOp(flatten(x), k, flatten(a))
    case other                      => other
  }

  private var anon = 0
  private def freshVar(): String = synchronized { anon += 1; s"_anon$anon" }

  /** One chain → joined DataFrame with v_* columns per node variable. */
  private def chainFrame(g: PropertyGraph, chain: PatternChain): (DataFrame, Set[String]) = {
    def nodeFrame(n: NodePat): (DataFrame, String) = {
      val v = n.varName.getOrElse(freshVar())
      val base = n.label.fold(g.vertices)(l => g.vertices.filter(col("label") === l))
      val renamed = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"${v}_$c"))
      (renamed, v)
    }
    val (first, v0) = nodeFrame(chain.nodes.head)
    var df = first
    var vars = Set(v0)
    var prevVar = v0
    chain.rels.zip(chain.nodes.tail).foreach { case (rel, node) =>
      val (nf, v) = nodeFrame(node)
      val e0 = rel.relType.fold(g.edges)(t => g.edges.filter(col("label") === t))
      val eAlias = freshVar()
      // variable-length: union of h-fold edge compositions for h in lo..hi
      val eBase = rel.hops match {
        case None => e0.select(col("src"), col("dst"))
        case Some((lo, hi)) =>
          require(lo >= 1 && hi >= lo && hi <= 8, s"unsupported hop range $lo..$hi")
          val one = e0.select(col("src"), col("dst"))
          def compose(h: Int): DataFrame =
            (1 until h).foldLeft(one)((acc, _) =>
              acc.alias("l").join(one.alias("r"), col("l.dst") === col("r.src"))
                .select(col("l.src").as("src"), col("r.dst").as("dst")))
          (lo to hi).map(compose).reduce(_ union _).distinct()
      }
      val e = eBase.select(col("src").as(s"${eAlias}_src"), col("dst").as(s"${eAlias}_dst"))
      val (fromCol, toCol) =
        if (rel.leftToRight) (s"${eAlias}_src", s"${eAlias}_dst")
        else (s"${eAlias}_dst", s"${eAlias}_src")
      df = df.join(e, col(s"${prevVar}_id") === col(fromCol))
        .join(nf, col(toCol) === col(s"${v}_id"))
        .drop(s"${eAlias}_src", s"${eAlias}_dst")
      vars += v
      prevVar = v
    }
    (df, vars)
  }

  def compile(g: PropertyGraph, q: CypherQuery): DataFrame = {
    // join chains on shared variables' id columns
    var acc: DataFrame = null
    var bound = Set.empty[String]
    q.patterns.foreach { chain =>
      val (cf, vars) = chainFrame(g, chain)
      if (acc == null) { acc = cf; bound = vars }
      else {
        val shared = (bound intersect vars).toSeq.sorted
        val joinType = if (chain.optional) "left_outer" else "inner"
        if (shared.isEmpty) acc = acc.crossJoin(cf)
        else {
          // join on the shared vars' identity; the chain frame carries its
          // own copies of the shared columns — rename them away first so
          // the join condition binds unambiguously, then drop them
          val dup = cf.columns.filter(c => shared.exists(v => c.startsWith(s"${v}_")))
          val renamed = cf.withColumnsRenamed(dup.map(c => c -> s"__dup_$c").toMap)
          val cond = shared.map(v => acc(s"${v}_id") === renamed(s"__dup_${v}_id")).reduce(_ && _)
          acc = acc.join(renamed, cond, joinType)
            .drop(dup.map(c => s"__dup_$c").toIndexedSeq: _*)
        }
        bound ++= vars
      }
    }
    q.where.foreach(w => acc = acc.filter(graft.sql.Translator.toColumn(flatten(w))))

    val items = q.items.map(it => it.copy(expr = flatten(it.expr)))
    val hasAgg = items.exists(it => graft.sql.Translator.containsAgg(it.expr))
    def name(it: ReturnItem, i: Int): String = it.alias.getOrElse(exprLabel(q.items(i).expr))
    var out =
      if (hasAgg) {
        // Cypher implicit grouping: non-aggregate items are the keys
        val keys = items.zipWithIndex.collect { case (it, i) if !graft.sql.Translator.containsAgg(it.expr) =>
          graft.sql.Translator.toColumn(it.expr).as(name(it, i)) }
        val aggs = items.zipWithIndex.collect { case (it, i) if graft.sql.Translator.containsAgg(it.expr) =>
          graft.sql.Translator.toColumn(it.expr).as(name(it, i)) }
        if (keys.isEmpty) acc.agg(aggs.head, aggs.tail: _*)
        else acc.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      } else
        acc.select(items.zipWithIndex.map { case (it, i) =>
          graft.sql.Translator.toColumn(it.expr).as(name(it, i)) }: _*)

    if (q.distinct) out = out.distinct()
    if (q.orderBy.nonEmpty)
      out = out.orderBy(q.orderBy.map { o =>
        val c = o.expr match {
          case Ident(n) if out.columns.contains(n) => col(n)
          case other => graft.sql.Translator.toColumn(flatten(other))
        }
        if (o.asc) c.asc else c.desc
      }: _*)
    q.skip.foreach(n => out = out.offset(n.toInt))
    q.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  private def exprLabel(e: Expr): String = e match {
    case PropAccess(Ident(v), p) => s"${v}_$p"
    case Ident(v) => v
    case FnCall(n, _, _) => n.toLowerCase
    case _ => "expr"
  }

  /** Entry point: run a Cypher query against a property graph. */
  def query(g: PropertyGraph, text: String): DataFrame = compile(g, parse(text))
}
