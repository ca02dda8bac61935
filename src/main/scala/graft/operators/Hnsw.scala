package graft.operators

import scala.collection.mutable

/** In-partition HNSW graph (Malkov & Yashunin 2016, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable Small
  * World graphs") over cosine similarity — the same index family the
  * reference embeds single-node via jvector
  * (engine/src/main/java/com/arcadedb/index/vector/LSMVectorIndex.java:68-75).
  *
  * Distribution model (the 100 TB shape): one graph per PARTITION, built
  * inside `mapPartitions` over the partitioned corpus; queries broadcast,
  * fan out to every partition's graph, and the per-partition top-k merge
  * exactly in a final window — so recall loss can only come from the
  * in-partition graph walk, never from partitioning. Build is O(n·M·efC)
  * per partition and stays in executor memory; nothing index-shaped
  * crosses the shuffle.
  *
  * Determinism (oracle requirement — no runtime randomness anywhere in the
  * library): the per-node level draw replaces `Math.random` with a
  * splitmix64 hash of the node id mapped to (0,1], and every heap
  * tie-breaks on id. Same input, same graph, same answer.
  *
  * Vectors are L2-normalized at build; distance = 1 − dot.
  */
final class HnswIndex private (
    ids: Array[Long], unit: Array[Array[Double]], m: Int, efConstruction: Int) {

  private val mMax0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)
  // neighbors(level)(node) — level 0 sized for every node, upper levels
  // grow lazily as nodes draw them
  private val levels = new Array[Int](ids.length)
  private val neighbors = mutable.ArrayBuffer[mutable.Map[Int, mutable.ArrayBuffer[Int]]]()
  private var entry: Int = -1
  private var maxLevel: Int = -1

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    1.0 - s
  }

  /** splitmix64 of the node id → uniform in (0,1]; level = ⌊−ln(u)·mL⌋. */
  private def levelOf(id: Long): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0, 1]
    math.min((-math.log(u) * mL).toInt, 24)
  }

  private def nbrs(lc: Int, node: Int): mutable.ArrayBuffer[Int] =
    neighbors(lc).getOrElseUpdate(node, mutable.ArrayBuffer.empty[Int])

  /** Greedy single-entry descent at layer `lc`. */
  private def greedy(q: Array[Double], ep0: Int, lc: Int): Int = {
    var ep = ep0
    var d = dist(q, unit(ep))
    var improved = true
    while (improved) {
      improved = false
      val ns = neighbors(lc).get(ep)
      if (ns.isDefined) {
        var i = 0
        val arr = ns.get
        while (i < arr.length) {
          val cand = arr(i)
          val cd = dist(q, unit(cand))
          if (cd < d || (cd == d && ids(cand) < ids(ep))) { d = cd; ep = cand; improved = true }
          i += 1
        }
      }
    }
    ep
  }

  /** Beam search at one layer: returns up to `ef` closest (dist, node). */
  private def searchLayer(q: Array[Double], ep: Int, ef: Int, lc: Int): mutable.ArrayBuffer[(Double, Int)] = {
    // candidates: min-heap by distance; results: max-heap by distance
    implicit val ordAsc: Ordering[(Double, Int)] =
      Ordering.by[(Double, Int), (Double, Long)] { case (d, n) => (-d, -ids(n)) }
    implicit val ordDesc: Ordering[(Double, Int)] =
      Ordering.by[(Double, Int), (Double, Long)] { case (d, n) => (d, ids(n)) }
    val visited = mutable.BitSet(ep)
    val d0 = dist(q, unit(ep))
    val cand = mutable.PriorityQueue((d0, ep))(ordAsc)   // pops closest first
    val res = mutable.PriorityQueue((d0, ep))(ordDesc)   // pops farthest first
    while (cand.nonEmpty) {
      val (cd, c) = cand.dequeue()
      if (cd > res.head._1 && res.size >= ef) { cand.clear() }
      else {
        val ns = neighbors(lc).get(c)
        if (ns.isDefined) {
          var i = 0
          val arr = ns.get
          while (i < arr.length) {
            val e = arr(i)
            if (!visited.contains(e)) {
              visited += e
              val ed = dist(q, unit(e))
              if (res.size < ef || ed < res.head._1) {
                cand.enqueue((ed, e))
                res.enqueue((ed, e))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
    }
    val out = mutable.ArrayBuffer.from(res)
    out.sortInPlace()(Ordering.by { case (d, n) => (d, ids(n)) })
    out
  }

  /** Link `node` to the ≤ mmax closest of `cands` at `lc`, bidirectional
    * with neighbor-list pruning (simple-closest selection). */
  private def connect(node: Int, cands: mutable.ArrayBuffer[(Double, Int)], lc: Int): Unit = {
    val mmax = if (lc == 0) mMax0 else m
    val chosen = cands.filter(_._2 != node).take(m)
    val ns = nbrs(lc, node)
    for ((_, c) <- chosen) {
      ns += c
      val back = nbrs(lc, c)
      back += node
      if (back.length > mmax) {
        // prune to the mmax closest of c's current neighbors
        val pruned = back.map(x => (dist(unit(c), unit(x)), x))
          .sortBy { case (d, x) => (d, ids(x)) }.take(mmax).map(_._2)
        back.clear(); back ++= pruned
      }
    }
  }

  private def insert(i: Int): Unit = {
    val lvl = levelOf(ids(i))
    levels(i) = lvl
    while (neighbors.length <= lvl) neighbors += mutable.Map.empty
    if (entry < 0) { entry = i; maxLevel = lvl; return }
    var ep = entry
    var lc = maxLevel
    while (lc > lvl) { ep = greedy(unit(i), ep, lc); lc -= 1 }
    while (lc >= 0) {
      val w = searchLayer(unit(i), ep, efConstruction, lc)
      connect(i, w, lc)
      ep = w.head._2
      lc -= 1
    }
    if (lvl > maxLevel) { maxLevel = lvl; entry = i }
  }

  /** Top-k (id, cosine), best first; ties broken by id. */
  def search(q0: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Seq.empty
    val nrm = math.sqrt(q0.map(x => x * x).sum)
    val q = if (nrm > 0) q0.map(_ / nrm) else q0
    var ep = entry
    var lc = maxLevel
    while (lc > 0) { ep = greedy(q, ep, lc); lc -= 1 }
    searchLayer(q, ep, math.max(ef, k), 0)
      .take(k).map { case (d, n) => (ids(n), 1.0 - d) }.toSeq
  }
}

object HnswIndex {
  /** Build over one partition's (id, vector) pairs. Insertion order is
    * sorted by id so the graph is independent of iterator order. */
  def build(elems: Array[(Long, Array[Double])], m: Int = 16, efConstruction: Int = 64): HnswIndex = {
    val sorted = elems.sortBy(_._1)
    val ids = sorted.map(_._1)
    val unit = sorted.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val idx = new HnswIndex(ids, unit, m, efConstruction)
    var i = 0
    while (i < ids.length) { idx.insert(i); i += 1 }
    idx
  }
}
