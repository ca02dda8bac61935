package graft.gremlin

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gremlin traversal front-end — the Spark re-expression of the reference's
  * TinkerPop integration (reference gremlin/src/main/java/com/arcadedb/gremlin/
  * ArcadeGraph.java, ArcadeVertex.java, step rewrites ArcadeTraversalStrategy.java,
  * ArcadeFilterByTypeStep.java, ArcadeCountGlobalStep.java).
  *
  * The reference wraps its record iterators in TinkerPop's pull-based step
  * machinery; here a traversal compiles to ONE declarative DataFrame plan —
  * each out()/in() hop is a join against the edges relation, filters push
  * into the scan, and the terminal aggregation is a Spark aggregate, so
  * Catalyst sees the whole pipeline (and e.g. prunes vertex-property columns
  * the traversal never reads).
  *
  * Supported step surface (the analytics-relevant subset of TinkerPop):
  *   g.V() / g.E()                       — full scans
  *   hasLabel('l'), has('k', v|pred)    — filters; preds: eq/neq/gt/gte/lt/
  *                                         lte/within/without/between/
  *                                         containing/startingWith/endingWith
  *   out/in/both('l'?)                  — vertex hops (bag semantics: one
  *                                         traverser per edge, like TinkerPop)
  *   outE/inE('l'?), outV()/inV()       — edge-object hops
  *   as('x'), select('a','b').by('k')   — path-step capture / projection
  *   values('k')                        — property projection (column `value`)
  *   dedup(), order().by('k', desc?), limit(n)
  *   count() / sum() / min() / max()    — terminal aggregates (column `value`;
  *                                         sums are decimal-exact per the
  *                                         library-wide parity rule)
  *   groupCount().by('k')               — grouped count (rows (k, cnt),
  *                                         sorted by key — the rendered form
  *                                         of TinkerPop's result map)
  *
  * Traverser multiplicity is preserved exactly as TinkerPop defines it:
  * no implicit distinct — `out()` emits one traverser per matching edge, so
  * count()/groupCount() agree with the reference's bag semantics.
  */
object Gremlin {

  // ---------- token model ----------

  /** One chained call: name + raw argument source + attached .by(...) modulators. */
  private final case class Step(name: String, args: List[Arg], by: List[List[Arg]])

  private sealed trait Arg
  private final case class SArg(s: String) extends Arg                  // 'str'
  private final case class NArg(d: Double) extends Arg                  // number
  private final case class IdArg(s: String) extends Arg                 // bare identifier (asc/desc)
  private final case class PArg(name: String, args: List[Arg]) extends Arg // pred call gt(5)

  /** Split `s` on `sep` at paren/quote depth zero. */
  private def splitTop(s: String, sep: Char): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var depth = 0; var q: Char = 0
    for (c <- s) {
      if (q != 0) { cur += c; if (c == q) q = 0 }
      else if (c == '\'' || c == '"') { q = c; cur += c }
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def parseArg(raw: String): Arg = {
    val t = raw.trim
    if (t.isEmpty) throw new IllegalArgumentException("empty argument")
    else if (t.head == '\'' || t.head == '"') SArg(t.substring(1, t.length - 1))
    else if (t.last == ')') {
      val p = t.indexOf('(')
      val inner = t.substring(p + 1, t.length - 1).trim
      PArg(t.substring(0, p).trim,
        if (inner.isEmpty) Nil else splitTop(inner, ',').map(parseArg))
    }
    else if (t.matches("[-+]?[0-9.]+([eE][-+]?[0-9]+)?")) NArg(t.toDouble)
    else IdArg(t)
  }

  /** Parse `g.V().has(...)...` into steps with .by() modulators attached. */
  private def parse(text: String): List[Step] =
    graft.StatementCache.cached("gremlin", text)(parseImpl(text))

  private def parseImpl(text: String): List[Step] = {
    val body = text.trim.stripPrefix("g").stripPrefix(".")
    val calls = splitTop(body, '.').map { c =>
      val t = c.trim
      val p = t.indexOf('(')
      require(p > 0 && t.endsWith(")"), s"malformed step: $t")
      val inner = t.substring(p + 1, t.length - 1).trim
      (t.substring(0, p).trim,
        if (inner.isEmpty) Nil else splitTop(inner, ',').map(parseArg))
    }
    // attach by() modulators to the preceding step (TinkerPop modulator rule)
    calls.foldLeft(List.empty[Step]) {
      case (acc, ("by", args)) =>
        require(acc.nonEmpty, ".by() with no step to modulate")
        acc.init :+ acc.last.copy(by = acc.last.by :+ args)
      case (acc, (name, args)) => acc :+ Step(name, args, Nil)
    }
  }

  // ---------- predicate compilation ----------

  private def litOf(a: Arg): Column = a match {
    case SArg(s) => lit(s)
    case NArg(d) => if (d == d.floor && math.abs(d) < 1e15) lit(d.toLong) else lit(d)
    case other   => throw new IllegalArgumentException(s"expected literal, got $other")
  }

  /** has('k', X) where X is a literal (equality) or a P predicate. */
  private def predicate(c: Column, a: Arg): Column = a match {
    case PArg("eq", List(v))          => c === litOf(v)
    case PArg("neq", List(v))         => c =!= litOf(v)
    case PArg("gt", List(v))          => c > litOf(v)
    case PArg("gte", List(v))         => c >= litOf(v)
    case PArg("lt", List(v))          => c < litOf(v)
    case PArg("lte", List(v))         => c <= litOf(v)
    case PArg("within", vs)           => c.isin(vs.map(litOf): _*)
    case PArg("without", vs)          => !c.isin(vs.map(litOf): _*)
    case PArg("between", List(a1, a2)) => c >= litOf(a1) && c < litOf(a2) // [a, b)
    case PArg("containing", List(SArg(s)))   => c.contains(s)
    case PArg("startingWith", List(SArg(s))) => c.startsWith(s)
    case PArg("endingWith", List(SArg(s)))   => c.endsWith(s)
    case v @ (SArg(_) | NArg(_))      => c === litOf(v)
    case other => throw new IllegalArgumentException(s"unsupported predicate: $other")
  }

  // ---------- traverser state ----------

  /** `df` carries the current element's own columns plus `<alias>__<prop>`
    * columns for every as()-captured step. `vertexLike` distinguishes the
    * vertex schema (id/label/props) from the edge schema (src/dst/label/props).
    * `valueCol` is set once a values()/aggregate step collapses to a scalar. */
  private final case class State(df: DataFrame, vertexLike: Boolean, valueCol: Option[String])

  private val EdgeCols = Set("src", "dst")

  /** Columns that belong to the current element (not alias captures). */
  private def ownCols(df: DataFrame): Seq[String] = df.columns.toSeq.filterNot(_.contains("__"))
  private def aliasCols(df: DataFrame): Seq[String] = df.columns.toSeq.filter(_.contains("__"))

  // ---------- steps ----------

  def query(g: PropertyGraph, text: String): DataFrame = {
    val steps = parse(text)
    require(steps.nonEmpty, "empty traversal")

    var st = steps.head match {
      case Step("V", Nil, _) => State(g.vertices, vertexLike = true, None)
      case Step("E", Nil, _) => State(g.edges, vertexLike = false, None)
      case s => throw new IllegalArgumentException(s"traversal must start with V()/E(), got ${s.name}")
    }

    def strArg(s: Step, i: Int): String = s.args(i) match {
      case SArg(v) => v
      case other   => throw new IllegalArgumentException(s"${s.name}: expected string arg, got $other")
    }

    /** Vertex hop: join edges (optionally label-filtered), land on far vertex. */
    def hop(dirOut: Boolean, label: Option[String]): State = {
      val e = label.fold(g.edges)(l => g.edges.filter(col("label") === l))
      val (near, far) = if (dirOut) ("src", "dst") else ("dst", "src")
      val carried = aliasCols(st.df).map(col) :+ col(s"e.$far").as("__hop_id")
      val expanded = st.df.alias("t")
        .join(e.alias("e"), col("t.id") === col(s"e.$near"))
        .select(carried: _*)
      State(
        expanded.join(g.vertices.alias("v"), col("__hop_id") === col("v.id"))
          .drop("__hop_id"),
        vertexLike = true, None)
    }

    /** Vertex → incident edge objects. */
    def hopE(dirOut: Boolean, label: Option[String]): State = {
      val e = label.fold(g.edges)(l => g.edges.filter(col("label") === l))
      val near = if (dirOut) "src" else "dst"
      val carried = aliasCols(st.df).map(c => col(s"t.$c")) ++
        e.columns.map(c => col(s"e.$c"))
      State(
        st.df.alias("t").join(e.alias("e"), col("t.id") === col(s"e.$near"))
          .select(carried: _*),
        vertexLike = false, None)
    }

    /** Edge object → endpoint vertex. */
    def endV(end: String): State = {
      val carried = aliasCols(st.df).map(col) :+ col(end).as("__hop_id")
      State(
        st.df.select(carried: _*)
          .join(g.vertices.alias("v"), col("__hop_id") === col("v.id"))
          .drop("__hop_id"),
        vertexLike = true, None)
    }

    for (s <- steps.tail) s match {
      case Step("hasLabel", List(SArg(l)), _) =>
        st = st.copy(df = st.df.filter(col("label") === l))
      case Step("has", List(SArg(k), p), _) =>
        st = st.copy(df = st.df.filter(predicate(col(k), p)))
      case Step("out", args, _)  => st = hop(dirOut = true,  args.headOption.map(_ => strArg(s, 0)))
      case Step("in", args, _)   => st = hop(dirOut = false, args.headOption.map(_ => strArg(s, 0)))
      case Step("both", args, _) =>
        val l = args.headOption.map(_ => strArg(s, 0))
        val a = hop(dirOut = true, l)
        val b = hop(dirOut = false, l) // both read the pre-step state
        st = State(a.df.unionByName(b.df), vertexLike = true, None)
      case Step("outE", args, _) => st = hopE(dirOut = true,  args.headOption.map(_ => strArg(s, 0)))
      case Step("inE", args, _)  => st = hopE(dirOut = false, args.headOption.map(_ => strArg(s, 0)))
      case Step("outV", Nil, _)  => st = endV("src")
      case Step("inV", Nil, _)   => st = endV("dst")

      case Step("as", List(SArg(a)), _) =>
        // capture the current element's columns under an alias prefix
        val own = ownCols(st.df)
        val withAlias = own.foldLeft(st.df)((d, c) => d.withColumn(s"${a}__$c", col(c)))
        st = st.copy(df = withAlias)

      case Step("select", sels, bys) =>
        require(sels.nonEmpty, "select() needs step labels")
        val names = sels.map { case SArg(v) => v; case o => throw new IllegalArgumentException(s"select: $o") }
        // .by('k') modulators apply round-robin (TinkerPop rule); default id
        val keys: List[String] =
          if (bys.isEmpty) List.fill(names.size)("id")
          else names.indices.map(i => bys(i % bys.size) match {
            case List(SArg(k)) => k
            case o             => throw new IllegalArgumentException(s"select.by: $o")
          }).toList
        val proj = names.zip(keys).map { case (n, k) => col(s"${n}__$k").as(n) }
        st = State(st.df.select(proj: _*), vertexLike = false, None)

      case Step("values", List(SArg(k)), _) =>
        st = State(st.df.select(col(k).as("value")), st.vertexLike, Some("value"))

      case Step("dedup", Nil, _)  => st = st.copy(df = st.df.distinct())
      case Step("limit", List(NArg(n)), _) => st = st.copy(df = st.df.limit(n.toInt))

      case Step("order", Nil, bys) =>
        val sorts: Seq[Column] =
          if (bys.isEmpty) Seq(col(st.valueCol.getOrElse("id")).asc)
          else bys.map {
            case List(SArg(k))                => col(k).asc
            case List(SArg(k), IdArg("desc")) => col(k).desc
            case List(SArg(k), IdArg("asc"))  => col(k).asc
            case List(IdArg("desc"))          => col(st.valueCol.getOrElse("id")).desc
            case o => throw new IllegalArgumentException(s"order.by: $o")
          }
        st = st.copy(df = st.df.orderBy(sorts: _*))

      case Step("count", Nil, _) =>
        st = State(st.df.select(count(lit(1)).as("value")), vertexLike = false, Some("value"))
      case Step("sum", Nil, _) =>
        val v = st.valueCol.getOrElse(throw new IllegalArgumentException("sum() needs values()"))
        // decimal-exact: double sums are summation-order-dependent
        st = State(
          st.df.select(sum(col(v).cast("decimal(28,4)")).cast("double").as("value")),
          vertexLike = false, Some("value"))
      case Step("min", Nil, _) =>
        val v = st.valueCol.getOrElse(throw new IllegalArgumentException("min() needs values()"))
        st = State(st.df.select(min(col(v)).as("value")), vertexLike = false, Some("value"))
      case Step("max", Nil, _) =>
        val v = st.valueCol.getOrElse(throw new IllegalArgumentException("max() needs values()"))
        st = State(st.df.select(max(col(v)).as("value")), vertexLike = false, Some("value"))

      case Step("groupCount", Nil, bys) =>
        val key = bys match {
          case List(List(SArg(k))) => k
          case Nil                 => st.valueCol.getOrElse("id")
          case o                   => throw new IllegalArgumentException(s"groupCount.by: $o")
        }
        // rendered form of TinkerPop's result map, sorted by key for determinism
        st = State(
          st.df.groupBy(col(key)).agg(count(lit(1)).as("cnt")).orderBy(col(key)),
          vertexLike = false, None)

      case other => throw new IllegalArgumentException(s"unsupported step: ${other.name}")
    }
    st.df
  }
}
