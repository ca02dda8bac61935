package graft.tck

import graft.cypher.Cypher
import graft.graph.MutableGraph

/** Repro main for the Janino "is not an rvalue" codegen failures:
  * runs the TCK Graph4 [5] query with codegen fallback disabled so the
  * failure is a hard error instead of a silent interpreted fallback. */
object CodegenRepro {
  def main(args: Array[String]): Unit = {
    System.setProperty("spark.testing", "true") // Utils.isTesting → log generated code on compile failure
    val spark = graft.GraftSession.build("local[2]", "2", "graft-codegen-repro")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val mg = MutableGraph.empty(spark, "/tmp/graft_codegen_repro")
    println("STEP: create")
    Cypher.execute(mg, "CREATE ()-[:T]->()")
    println("STEP: query")
    val out = Cypher.query(mg.graph,
      "MATCH (a)-[r]->() WITH [r, 1] AS list RETURN type(list[0])").collect()
    println("RESULT: " + out.mkString("|"))
    spark.stop()
  }
}
