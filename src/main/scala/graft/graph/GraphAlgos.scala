package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Materialize

/** Distributed graph algorithms as iterative DataFrame programs, the
  * Spark-native re-expression of the reference's OLAP algorithm suite
  * (graph/olap/GraphAlgorithms.java — PageRank :164, connected components
  * :309, Dijkstra single-source :981, label propagation :1118, local
  * clustering coefficient :1252).
  *
  * Each iteration is one join + one aggregation — plain shuffles that
  * partition by vertex id at any scale; lineage is truncated per iteration
  * with localCheckpoint so a 20-iteration run doesn't build a 20-deep plan.
  * GraphX remains the scale path for long-running fixpoints (see
  * PropertyGraph.toGraphX); these explicit loops exist where the reference
  * pins exact semantics a DuckDB oracle can replay (deterministic
  * tie-breaks, fixed iteration counts).
  */
object GraphAlgos {

  /** Iterations between lineage-truncating checkpoints inside the pinned
    * loops. The rank/label recurrence references its previous value ONCE
    * per level, so the un-checkpointed plan grows linearly — a ~8-deep
    * plan is cheaper to analyze than 8 checkpoint-materialization jobs'
    * worth of scheduler round-trips (the r7 bench showed ~5 tiny stages ×
    * iteration of pure overhead on a 25-node graph). */
  private val CheckpointEvery = 8

  /** Static PageRank, GraphX formulation (rank0 = 1.0; rank' = reset +
    * (1−reset)·Σ rank/outdeg over in-edges), fixed iteration count.
    * `edges` = (src, dst) directed. Reference GraphAlgorithms.java:164.
    * The degree-annotated edge relation is loop-invariant: persisted once,
    * reused by every iteration, released after the final rank (an eager
    * localCheckpoint) is materialized. */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int, reset: Double): DataFrame = {
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Eager localCheckpoint, NOT persist(): a cached plan is planned with
    // AQE disabled (canChangeCachedPlanOutputPartitioning=false), so a
    // derived edge relation (e.g. a self-join) would lose its runtime
    // broadcast/coalesce — measured 4-25x slower. The checkpoint runs one
    // AQE-planned job and iterations reuse the materialized blocks;
    // ContextCleaner reclaims them once the result drops the reference.
    val e = Materialize.once(edges.join(outDeg, Seq("src")))
    var rank = vertices.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to iters) {
      val msgs = e.join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("msum"))
      rank = vertices.select(col("id"))
        .join(msgs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(reset) + lit(1.0 - reset) * coalesce(col("msum"), lit(0.0))).as("rank"))
      if (i % CheckpointEvery == 0 && i < iters) rank = Materialize.once(rank, eager = false)
    }
    Materialize.once(rank)
  }

  /** Connected components by iterative min-id propagation (HashMin), the
    * set-oriented form of GraphAlgorithms.java:309. `edges` must contain
    * both directions for undirected graphs. Converges in O(diameter). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIters: Int): DataFrame = {
    val e = Materialize.once(edges) // see pageRank: AQE-planned once, not persist()
    var comp = vertices.select(col("id"), col("id").as("comp"))
    var changed = true
    var i = 0
    // r12 negative result (verdict #7): batching TWO propagation rounds
    // per convergence probe — lazy localCheckpoint between the rounds,
    // probe every second round — measured WORSE (q_dedup_clusters
    // 2.33 → 3.0 s, same-box stash A/B ×2): the unmaterialized checkpoint
    // between the rounds has unknown stats, so AQE plans round 2's joins
    // as sort-merge instead of broadcasting the tiny nbrMin aggregate.
    // The per-round eager checkpoint is what keeps every round broadcast-
    // shaped; the probe count over its local blocks costs ~nothing.
    while (changed && i < maxIters) {
      i += 1
      val nbrMin = e.join(comp.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("nbr"))
      // carry the previous label through the update so the convergence
      // sentinel is a filter over the checkpointed rows, not a self-join
      val next = Materialize.once(comp.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        ) // eager: also settles `changed` below
      changed = next.filter(col("comp") =!= col("prev")).limit(1).count() > 0
      comp = next.select("id", "comp")
    }
    comp
  }

  /** Synchronous label propagation with a deterministic tie-break (max
    * neighbor-label count, ties → smallest label), fixed iteration count —
    * GraphAlgorithms.java:1118 with the tie order pinned so every engine
    * replays the same communities. `edges` both directions. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val e = Materialize.once(edges) // loop-invariant (often a derived join —
    // e.g. a co-purchase self-join): one AQE-planned materialization instead
    // of `iters` recomputes; see pageRank for why persist() is wrong here
    var lab = vertices.select(col("id"), col("id").as("lab"))
    for (i <- 1 to iters) {
      val byCount = Window.partitionBy(col("id"))
        .orderBy(col("c").desc, col("lab"))
      val best = e.join(lab.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byCount))
        .filter(col("rn") === 1)
        .select(col("id"), col("lab").as("best"))
      lab = lab.join(best, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("best"), col("lab")).as("lab"))
      if (i % CheckpointEvery == 0 && i < iters) lab = Materialize.once(lab, eager = false)
    }
    Materialize.once(lab)
  }

  /** Local clustering coefficient cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    * over an undirected graph given in canonical a<b orientation —
    * GraphAlgorithms.java:1252. Triangle listing reuses the degree-ordered
    * wedge join (skew-bounded out-degree, PartitionedTriangleOp analog). */
  def clusteringCoefficient(canonEdges: DataFrame): DataFrame = {
    val und = canonEdges.select(col("a").as("u"), col("b").as("v"))
      .union(canonEdges.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    // wedges x–y–z on the canonical orientation; closing edge check lists
    // each triangle once, then each corner credits all three vertices
    val e = canonEdges
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val triPerV = tri.select(col("x").as("u"))
      .union(tri.select(col("y").as("u")))
      .union(tri.select(col("z").as("u")))
      .groupBy("u").agg(count(lit(1)).as("tri"))
    deg.join(triPerV, Seq("u"), "left_outer")
      .select(col("u").as("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") > 1,
          round(lit(2.0) * coalesce(col("tri"), lit(0L)) / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("cc"))
  }

  /** Walk counts per destination and depth (the set-oriented form of the
    * reference's all-paths enumeration, GraphAlgorithms.java:513): w_h =
    * w_{h-1} × A as repeated join+sum — matrix-power shape, one shuffle
    * per depth, counts never materialize individual paths. */
  def walkCounts(edges: DataFrame, sourceFilter: Column, vertices: DataFrame,
      maxDepth: Int): DataFrame = {
    var front = vertices.filter(sourceFilter)
      .select(col("id"), lit(1L).as("walks"))
    var acc: DataFrame = null
    for (d <- 1 to maxDepth) {
      front = Materialize.once(
        front.join(edges.withColumnRenamed("src", "id"), Seq("id"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("walks")).as("walks")), eager = false)
      val level = front.withColumn("depth", lit(d))
      acc = if (acc == null) level else acc.unionByName(level)
    }
    acc.select("depth", "id", "walks")
  }

  /** A* single-pair shortest path (reference function/sql/graph/
    * SQLFunctionAstar.java) as distributed branch-and-bound: Bellman-Ford
    * relaxation rounds with heuristic pruning — once a goal cost B is
    * known, states with g + h(v) > B are dropped (h admissible ⇒ no
    * optimal path is lost). A sequential priority-queue A* is a
    * single-node design; set-oriented relaxation + pruning keeps every
    * step a distributed join, and the only driver fetch is the scalar
    * goal cost per round. `edges` = (src, dst, w). */
  def aStarPair(edges: DataFrame, source: Long, target: Long,
      h: Column => Column, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    var dist = graft.OneRow(spark).select(lit(source).as("id"), lit(0.0).as("g"))
    var best = Double.PositiveInfinity
    for (r <- 1 to iters) {
      val relaxed = dist.join(edges.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("dst").as("id"), (col("g") + col("w")).as("g"))
      dist = dist.union(relaxed).groupBy("id").agg(min(col("g")).as("g"))
      // r12 (verdict #7): probe the goal every SECOND round — the probe is
      // the loop's only driver action (the lazy checkpoints materialize
      // under it), so halving the probes halves the scheduler round-trips.
      // Skipping a probe only delays pruning by one round; pruning never
      // drops a state on an optimal path (h admissible), so the final
      // min-g at the target after `iters` relaxations is identical.
      if (r % 2 == 0 || r == iters) {
        val hit = dist.filter(col("id") === target).select("g").limit(2).collect()
        if (hit.nonEmpty) best = math.min(best, hit(0).getDouble(0))
        if (!best.isInfinite) dist = dist.filter(col("g") + h(col("id")) <= best + 1e-9)
      }
      dist = Materialize.once(dist, eager = false)
    }
    dist.filter(col("id") === target)
      .select(col("id"), round(col("g"), 6).as("dist"))
  }

  /** Weighted single-source shortest paths by distributed Bellman-Ford
    * relaxation, `iters` rounds == exact min-cost over paths of ≤ `iters`
    * edges (reference SQLFunctionDijkstra / GraphAlgorithms.java:981 —
    * a sequential heap walk is a single-node design; relaxation rounds
    * are the set-oriented equivalent). `edges` = (src, dst, w). */
  def weightedSssp(edges: DataFrame, sourceFilter: Column, vertices: DataFrame, iters: Int): DataFrame = {
    var dist = vertices.filter(sourceFilter)
      .select(col("id"), lit(0.0).as("dist"))
    for (_ <- 1 to iters) {
      val relaxed = dist.join(edges.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = Materialize.once(dist.union(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist")), eager = false)
    }
    dist
  }
}
