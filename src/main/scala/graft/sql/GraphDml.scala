package graft.sql

import graft.graph.MutableGraph
import graft.sql.Ast.Expr
import graft.sql.Parser.{ParseException, TEof}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The SQL dialect's graph DML statements (reference grammar
  * SQLParser.g4 createVertexStatement / createEdgeStatement /
  * deleteVertexStatement; planners CreateVertexExecutionPlanner.java,
  * CreateEdgeExecutionPlanner.java, DeleteExecutionPlanner.java):
  *
  *   CREATE VERTEX <label> SET k = v, ...
  *   CREATE EDGE <label> FROM (SELECT … FROM <label> [WHERE …])
  *                       TO   (SELECT … FROM <label> [WHERE …]) [SET k = v, …]
  *   DELETE VERTEX <label> [WHERE <expr>]
  *
  * CREATE EDGE follows the reference's semantics: one edge per
  * (from-record × to-record) pair — each side is an id set produced by
  * its subquery over the vertex table. DELETE VERTEX detaches incident
  * edges first (the reference's DeleteStep over a vertex type cascades
  * through GraphEngine edge removal). All three route to the same
  * [[MutableGraph]] mutations the Cypher write clauses use — one write
  * backend, two front-ends, like the shared read backend in sql/Match.
  */
object GraphDml {

  sealed trait GStmt
  final case class CreateVertex(label: String, sets: Seq[(String, Expr)]) extends GStmt
  final case class CreateEdge(label: String, from: Ast.Select, to: Ast.Select,
      sets: Seq[(String, Expr)]) extends GStmt
  final case class DeleteVertex(label: String, where: Option[Expr]) extends GStmt
  /** MOVE VERTEX <label> TO TYPE:<label2> [SET …] [WHERE …] (reference
    * MoveVertexStep.java:40 — delete + reinsert into the target type with
    * edges repointed; here the surrogate id is stable, so the relabel
    * leaves every incident edge valid with no repointing pass). */
  final case class MoveVertex(label: String, toLabel: String,
      sets: Seq[(String, Expr)], where: Option[Expr]) extends GStmt

  def parse(sql: String): GStmt = {
    val p = new Parser.P(Parser.lex(sql, dashComments = true))
    val st =
      if (p.kw("CREATE")) {
        if (p.kw("VERTEX")) {
          val label = Parser.ident(p)
          val sets = if (p.kw("SET")) parseSets(p) else Seq.empty
          CreateVertex(label, sets)
        } else {
          p.expectKw("EDGE")
          val label = Parser.ident(p)
          p.expectKw("FROM")
          p.expectOp("(")
          val from = Parser.parseSelect(p)
          p.expectOp(")")
          p.expectKw("TO")
          p.expectOp("(")
          val to = Parser.parseSelect(p)
          p.expectOp(")")
          val sets = if (p.kw("SET")) parseSets(p) else Seq.empty
          CreateEdge(label, from, to, sets)
        }
      } else if (p.kw("DELETE")) {
        p.expectKw("VERTEX")
        val label = Parser.ident(p)
        val where = if (p.kw("WHERE")) Some(Parser.parseExpr(p)) else None
        DeleteVertex(label, where)
      } else if (p.kw("MOVE")) {
        p.expectKw("VERTEX")
        val label = Parser.ident(p)
        p.expectKw("TO")
        p.expectKw("TYPE")
        p.expectOp(":")
        val to = Parser.ident(p)
        val sets = if (p.kw("SET")) parseSets(p) else Seq.empty
        val where = if (p.kw("WHERE")) Some(Parser.parseExpr(p)) else None
        MoveVertex(label, to, sets, where)
      } else throw ParseException(s"expected CREATE/DELETE/MOVE VERTEX or CREATE EDGE, found ${p.peek}")
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    st
  }

  private def parseSets(p: Parser.P): Seq[(String, Expr)] = {
    val b = Seq.newBuilder[(String, Expr)]
    var more = true
    while (more) {
      val k = Parser.ident(p)
      p.expectOp("=")
      b += k -> Parser.parseExpr(p)
      more = p.op(",")
    }
    b.result()
  }

  /** Evaluate an edge-endpoint subquery: its FROM is a vertex label; the
    * result is the matching vertices' id set. */
  private def idSet(mg: MutableGraph, sel: Ast.Select): DataFrame = {
    val base = mg.vertices.filter(col("label") === sel.from)
    sel.where.foldLeft(base)((d, w) => d.filter(Translator.toColumn(w))).select(col("id"))
  }

  def execute(mg: MutableGraph, sql: String): DataFrame = {
    def cols(sets: Seq[(String, Expr)]): Seq[Column] =
      sets.map { case (k, e) => Translator.toColumn(e).as(k) }
    parse(sql) match {
      case CreateVertex(label, sets) =>
        mg.createVertices(graft.OneRow(mg.spark).select(cols(sets) :+ lit(label).as("label"): _*))
      case CreateEdge(label, from, to, sets) =>
        val rows = idSet(mg, from).select(col("id").as("src"))
          .crossJoin(idSet(mg, to).select(col("id").as("dst")))
          .select(col("src") +: col("dst") +: lit(label).as("label") +: cols(sets): _*)
        mg.createEdges(rows)
      case DeleteVertex(label, where) =>
        val base = mg.vertices.filter(col("label") === label)
        val ids = where.foldLeft(base)((d, w) => d.filter(Translator.toColumn(w)))
          .select(col("id"))
        mg.deleteVertices(ids, detach = true)
      case MoveVertex(label, to, sets, where) =>
        val base = mg.vertices.filter(col("label") === label)
        val ids = where.foldLeft(base)((d, w) => d.filter(Translator.toColumn(w)))
          .select(col("id"))
        mg.setVertexProps(ids, ("label" -> lit(to)) +:
          sets.map { case (k, e) => k -> Translator.toColumn(e) })
    }
    graft.OneRow(mg.spark).select(lit(1).as("ok"))
  }
}
