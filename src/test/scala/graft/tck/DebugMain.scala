package graft.tck

/** Scratch reproduction main (not part of the suite). */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("local[4]", "4", "graft-debug")
    val mg = graft.graph.MutableGraph.empty(spark, "/tmp/graft-debug-g")
    def exec(q: String): Unit = {
      println(s"--- $q")
      try {
        val df = graft.cypher.Cypher.execute(mg, q)
        df.show(30, truncate = false)
      } catch {
        case e: Throwable =>
          println("ERROR: " + e.toString.take(4000))
      }
    }
    args.headOption match {
      case Some("match4") =>
        exec("""CREATE (a {var: 'start'}), (b {var: 'end'})
          | WITH *
          | UNWIND range(1, 20) AS i
          | CREATE (n {var: i})
          | WITH a, b, [a] + collect(n) + [b] AS nodeList
          | UNWIND range(0, size(nodeList) - 2, 1) AS i
          | WITH nodeList[i] AS n1, nodeList[i+1] AS n2
          | CREATE (n1)-[:T]->(n2)""".stripMargin.replace("\n", " "))
        exec("MATCH (n) RETURN n.var")
        exec("MATCH (a)-[:T]->(b) RETURN a.var, b.var")
        exec("MATCH (n {var: 'start'}) RETURN n")
        exec("MATCH (n {var: 'start'})-[:T*]->(m {var: 'end'}) RETURN m")
      case other =>
        println(s"unknown repro: $other")
    }
    spark.stop()
  }
}
