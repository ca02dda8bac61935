package graft.sql

import graft.graph.PropertyGraph
import graft.sql.Ast.Expr
import graft.sql.Parser.{ParseException, TEof, TStr}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL dialect's TRAVERSE statement (reference grammar
  * SQLParser.g4:220-229 traverseStatement, executors
  * exec/BreadthFirstTraverseStep.java:34 / DepthFirstTraverseStep.java:36):
  *
  *   TRAVERSE out(['EdgeType']) | in(...) | both(...)
  *   FROM <vertexType> [WHERE <seed filter>] [MAXDEPTH n]
  *
  * Seeds are the FROM type's vertices passing WHERE (bare identifiers are
  * the vertex's own properties); the traversal is the distributed BFS
  * frontier loop in [[PropertyGraph.traverse]] — per-depth distinct-join
  * expansion, not the reference's single-node iterator stack — and emits
  * one row per reached vertex with its first (minimum) reach depth, the
  * breadth-first contract of the reference's BreadthFirstTraverseStep.
  * Result: (key, label, depth) ordered by (depth, label, key).
  */
object Traverse {

  final case class TraverseStmt(direction: String, edgeLabel: Option[String],
      fromLabel: String, where: Option[Expr], maxDepth: Int)

  def parse(text: String): TraverseStmt = {
    val p = new Parser.P(Parser.lex(text, dashComments = true))
    p.expectKw("TRAVERSE")
    val dir = Parser.ident(p).toLowerCase
    if (!Seq("out", "in", "both").contains(dir))
      throw ParseException(s"expected out/in/both, found $dir")
    p.expectOp("(")
    val edgeLabel = p.peek match {
      case TStr(s) => p.next(); Some(s)
      case _ => None
    }
    p.expectOp(")")
    p.expectKw("FROM")
    val from = Parser.ident(p)
    val where = if (p.kw("WHERE")) Some(Parser.parseExpr(p)) else None
    val depth = if (p.kw("MAXDEPTH")) Parser.longLit(p).toInt else Int.MaxValue
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    TraverseStmt(dir, edgeLabel, from, where, depth)
  }

  /** Entry point: run a TRAVERSE statement against a property graph. */
  def query(g: PropertyGraph, text: String): DataFrame = {
    val st = parse(text)
    val seeds = st.where.foldLeft(
      g.vertices.filter(col("label") === st.fromLabel))(
      (d, w) => d.filter(Translator.toColumn(w)))
    g.traverse(seeds, st.maxDepth, st.direction, st.edgeLabel)
      .join(g.vertices, "id")
      .select(col("key"), col("label"), col("depth"))
      .orderBy("depth", "label", "key")
  }
}
