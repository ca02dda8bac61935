package graft.cypher

import graft.graph.{GraphAlgos, PropertyGraph}
import graft.sql.Ast.{Expr, Neg, NumLit}
import graft.sql.Parser.ParseException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Procedure registry for Cypher `CALL` (reference
  * query/opencypher/executor/steps/CallStep.java:48 dispatching through
  * function/procedure/ProcedureRegistry.java). Each procedure returns a
  * DataFrame; schema introspection procedures derive from the graph's
  * DataFrames (labels/types are one distinct-aggregate over the data,
  * property keys come from the schema — no scan), and the algo procedures
  * delegate to the deterministic [[GraphAlgos]] DataFrame programs.
  */
object Procedures {

  private def litToInt(e: Expr): Int = e match {
    case NumLit(v, _) => v.toInt
    case other => throw ParseException(s"procedure arg must be a literal number, got $other")
  }
  private def litToDouble(e: Expr): Double = e match {
    case NumLit(v, _) => v.toDouble
    case Neg(NumLit(v, _)) => -v.toDouble
    case other => throw ParseException(s"procedure arg must be a literal number, got $other")
  }

  def invoke(g: PropertyGraph, name: String, args: Seq[Expr]): DataFrame =
    name.toLowerCase match {
      case "db.labels" =>
        g.vertices.select(col("label")).distinct()
      case "db.relationshiptypes" =>
        g.edges.select(col("label").as("relationshipType")).distinct()
      case "db.propertykeys" =>
        // property keys are schema facts, not data: structural columns
        // (id/src/dst/label) excluded, vertex+edge keys unioned
        val keys = (g.vertices.columns.filterNot(Set("id", "label")) ++
          g.edges.columns.filterNot(Set("src", "dst", "label"))).distinct.sorted
        val spark = g.vertices.sparkSession
        import spark.implicits._
        keys.toSeq.toDF("propertyKey")
      case "algo.pagerank" =>
        val iters = if (args.nonEmpty) litToInt(args(0)) else 10
        val reset = if (args.length > 1) litToDouble(args(1)) else 0.15
        GraphAlgos.pageRank(g.vertices.select(col("id")),
          g.edges.select(col("src"), col("dst")), iters, reset)
      case "algo.connectedcomponents" | "algo.cc" =>
        val iters = if (args.nonEmpty) litToInt(args(0)) else 10
        GraphAlgos.connectedComponents(g.vertices.select(col("id")),
          g.edges.select(col("src"), col("dst")), iters)
      case other =>
        throw ParseException(s"unknown procedure $other")
    }
}
