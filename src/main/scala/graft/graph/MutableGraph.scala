package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writable property graph backing the Cypher write clauses (reference
  * cypher CREATE/SET/DELETE/MERGE — query/opencypher planner write steps
  * and the underlying MutableVertex.java:42 / GraphEngine edge creation,
  * GraphEngine.java:66).
  *
  * Same storage model as [[graft.sources.MutableTable]]: each mutation
  * derives the next vertices/edges state declaratively, writes it to a
  * staging directory (the write reads the still-intact current state) and
  * swaps staging into place. At 100 TB the backing
  * would be Delta/Iceberg MERGE; the derivation (affected-id set → join →
  * rewrite) is what those formats execute underneath. Affected-id sets are
  * broadcast — a write touches few vertices while the table is huge, so
  * the rewrite is one broadcast-hash pass over the big side, no shuffle.
  */
final class MutableGraph(val spark: SparkSession, vDir: String, eDir: String) {

  def vertices: DataFrame = spark.read.parquet(vDir)
  def edges: DataFrame = spark.read.parquet(eDir)
  def graph: PropertyGraph = PropertyGraph(vertices, edges)

  // Roll back swaps torn by a crash in a previous session, if any.
  graft.sources.Publish.recover(spark, vDir)
  graft.sources.Publish.recover(spark, eDir)

  // r11: staging write + swap instead of localCheckpoint + in-place
  // overwrite — one distributed materialization per mutation instead of
  // two (see MutableTable.overwrite); input frames evaluate during the
  // staging write, while both backing dirs are still intact. r12: the
  // swap is the shared crash-safe rename-aside protocol in Publish.
  // r12 (verdict #2): the staging swap beat the r10 checkpoint+in-place
  // protocol in a same-session interleaved A/B (q_cypher_create med
  // 2.22 s vs 2.53 s over 5 pairs) — the r11 sweep regression was
  // environmental. Kept.
  private def overwriteV(next: DataFrame): Unit =
    graft.sources.Publish.overwrite(next, vDir)
  private def overwriteE(next: DataFrame): Unit =
    graft.sources.Publish.overwrite(next, eDir)

  /** Schema-evolving append: columns missing on either side become null,
    * new property keys extend the schema (the reference's records are
    * schema-flexible property bags — Document.java:42; Delta/Iceberg
    * mergeSchema is the at-scale equivalent of this union). Shared
    * columns that exist on both sides still cast through union's
    * wider-type resolution. */
  private def evolved(base: DataFrame, rows: DataFrame): DataFrame =
    MutableGraph.evolvedUnion(base, rows)

  /** CREATE (n:label {...}) — append vertex rows, evolving the schema. */
  def createVertices(rows: DataFrame): Unit =
    overwriteV(evolved(vertices, rows))

  /** CREATE (a)-[:T {...}]->(b) — append edge rows, evolving the schema.
    * Every created edge gets a persistent `_eid` identity (parallel edges
    * between the same endpoints are distinct relationships — openCypher
    * relationship identity; cf. the reference's RID-per-edge model).
    * Offset + monotonically_increasing_id keeps the assignment
    * distributed — ids are unique, not dense. */
  def createEdges(rows: DataFrame): Unit = {
    val e = edges
    val withId =
      if (rows.columns.contains("_eid")) rows
      else {
        val next =
          if (e.columns.contains("_eid"))
            Option(e.agg(max(col("_eid"))).head.get(0))
              .map(_.toString.toLong + 1).getOrElse(0L)
          else 0L
        // single evaluation (inside the staging write), so the
        // non-deterministic id assignment is observed exactly once
        rows.withColumn("_eid", lit(next) + monotonically_increasing_id())
      }
    overwriteE(evolved(e, withId))
  }

  /** SET v.prop = expr on vertices whose id ∈ `ids`. Set expressions are
    * Columns over the vertex row's own properties. */
  def setVertexProps(ids: DataFrame, sets: Seq[(String, Column)]): Unit = {
    val keys = ids.select(col("id").as("__set_id")).distinct()
    val marked = vertices.join(broadcast(keys), col("id") === col("__set_id"), "left_outer")
    val next = sets.foldLeft(marked) { case (d, (p, c)) =>
      // a property the schema has never seen extends it (schema-flexible
      // records): untouched rows hold null, not an unresolved column
      val prev = if (d.columns.contains(p)) col(p) else lit(null)
      d.withColumn(p, when(col("__set_id").isNotNull, c).otherwise(prev))
    }.drop("__set_id")
    overwriteV(next)
  }

  /** SET v.prop = <per-row value>: `updates` carries `__set_id` plus one
    * column per property, one row per horizon binding. Rows reduce to one
    * per id (last wins — openCypher leaves multi-binding SET order
    * unspecified); untouched vertices keep their values. */
  def setVertexPropsValues(updates: DataFrame): Unit = {
    val props = updates.columns.filterNot(_ == "__set_id").toSeq
    val aggs = props.map(p => last(col(p)).as(s"__upd_$p"))
    val one = updates.groupBy(col("__set_id")).agg(aggs.head, aggs.tail: _*)
    val marked = vertices.join(broadcast(one), col("id") === col("__set_id"), "left_outer")
    val next = props.foldLeft(marked) { (d, p) =>
      val prev = if (d.columns.contains(p)) col(p) else lit(null)
      d.withColumn(p, when(col("__set_id").isNotNull, col(s"__upd_$p")).otherwise(prev))
    }.drop("__set_id" +: props.map(p => s"__upd_$p"): _*)
    overwriteV(next)
  }

  /** SET r.prop = <per-row value> on relationships: `updates` carries
    * `__set_eid` plus one column per property (last wins per edge). */
  def setEdgePropsValues(updates: DataFrame): Unit = {
    val props = updates.columns.filterNot(_ == "__set_eid").toSeq
    val aggs = props.map(p => last(col(p)).as(s"__upd_$p"))
    val one = updates.groupBy(col("__set_eid")).agg(aggs.head, aggs.tail: _*)
    if (!edges.columns.contains("_eid")) {
      if (edges.isEmpty) return // nothing to update (null-rel no-op SET)
      throw new IllegalStateException("edge store has no _eid identity column")
    }
    val marked = edges.join(broadcast(one), col("_eid") === col("__set_eid"), "left_outer")
    val next = props.foldLeft(marked) { (d, p) =>
      val prev = if (d.columns.contains(p)) col(p) else lit(null)
      d.withColumn(p, when(col("__set_eid").isNotNull, col(s"__upd_$p")).otherwise(prev))
    }.drop("__set_eid" +: props.map(p => s"__upd_$p"): _*)
    overwriteE(next)
  }

  /** SET v:Label / REMOVE v:Label on the vertices in `ids`: the label
    * column holds a ":"-joined sorted label set. */
  def setVertexLabels(ids: DataFrame, add: Seq[String], remove: Seq[String]): Unit = {
    val keys = ids.select(col("id").as("__lbl_id")).distinct()
    val marked = vertices.join(broadcast(keys), col("id") === col("__lbl_id"), "left_outer")
    val next = marked.withColumn("label",
      when(col("__lbl_id").isNotNull,
        MutableGraph.labelSetCol(col("label"), add, remove))
        .otherwise(col("label"))).drop("__lbl_id")
    overwriteV(next)
  }

  /** DELETE / DETACH DELETE: remove the vertices; with `detach`, incident
    * edges go first (the reference refuses a non-detach delete of a
    * connected vertex — we mirror only the detach path's semantics and
    * leave plain DELETE as vertex-only removal). */
  def deleteVertices(ids: DataFrame, detach: Boolean): Unit = {
    val keys = ids.select(col("id").as("__del_id")).distinct()
      .localCheckpoint(eager = true)
    if (!detach) {
      // openCypher: plain DELETE of a still-connected node is an error
      // (ConstraintVerificationFailed; use DETACH DELETE) — TCK Delete1 [7]
      val touching = edges
        .join(broadcast(keys),
          col("src") === col("__del_id") || col("dst") === col("__del_id"), "left_semi")
      if (!touching.isEmpty)
        throw new IllegalStateException(
          "ConstraintVerificationFailed: cannot delete a node with relationships; use DETACH DELETE")
    }
    if (detach) {
      val kept = edges
        .join(broadcast(keys), col("src") === col("__del_id"), "left_anti")
        .join(broadcast(keys), col("dst") === col("__del_id"), "left_anti")
      overwriteE(kept)
    }
    overwriteV(vertices.join(broadcast(keys), col("id") === col("__del_id"), "left_anti"))
  }

  /** DELETE r — remove relationships by their `_eid` identity. A store
    * that never saw an edge write has no identity column and nothing to
    * delete (an optional-match DELETE over an empty graph is a no-op). */
  def deleteEdges(eids: DataFrame): Unit = {
    val keys = eids.select(col("eid").as("__del_eid")).distinct()
    if (!edges.columns.contains("_eid")) {
      if (edges.isEmpty) return
      throw new IllegalStateException("edge store has no _eid identity column")
    }
    overwriteE(edges.join(broadcast(keys), col("_eid") === col("__del_eid"), "left_anti"))
  }

  /** MERGE (n:label {k: v, ...}): bind if a vertex matches `pred`, else
    * create `row` (match-or-create; reference MergeStep semantics for a
    * single node pattern). */
  def mergeVertex(pred: Column, row: DataFrame): Unit =
    if (vertices.filter(pred).isEmpty) createVertices(row)
}

object MutableGraph {
  /** Label-set column arithmetic over the ":"-joined sorted encoding:
    * add then remove, empty set → null. */
  def labelSetCol(stored: Column, add: Seq[String], remove: Seq[String]): Column = {
    val cur = filter(split(coalesce(stored, lit("")), ":"), x => x =!= "")
    val added =
      if (add.isEmpty) cur else array_union(cur, array(add.map(lit): _*))
    val removed = remove.foldLeft(added)((c, l) => array_remove(c, l))
    val joined = array_join(array_sort(removed), ":")
    when(joined === "", lit(null)).otherwise(joined)
  }

  /** Schema-evolving union: columns missing on either side become null,
    * new property keys extend the schema. openCypher properties are
    * dynamically typed PER RECORD: the same key may hold a string on one
    * node and a number on another. ANSI union coercion would resolve
    * string/bigint to bigint and throw a cast error the first time the
    * string value is read — resolve such conflicts to the VARIANT
    * encoding ([[graft.cypher.Variant]]): each record keeps its exact
    * kind, predicates dispatch per row, and the render layer restores
    * the original value (TCK MatchWhere5 [4] — `var` holding 'text' on
    * one node and 0 on another; cf. the reference's schema-flexible
    * Document.java property bags). Types the variant can't carry (e.g.
    * temporal structs vs strings) still fall back to string. */
  def evolvedUnion(base: DataFrame, rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.cypher.Variant
    val bt = base.schema.map(f => f.name -> f.dataType).toMap
    val rt = rows.schema.map(f => f.name -> f.dataType).toMap
    def variantOk(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType | BooleanType | StringType => true
      case _: DecimalType => true
      case ArrayType(et, _) => variantOk(et)
      case st: StructType => Variant.isVariantType(st)
      case _ => false
    }
    // the same property key holding a native temporal (µs-clean
    // TimestampNTZ / DateType) on one side and the tagged temporal struct
    // of the SAME kind on the other (mixed precision across records):
    // promote the native side to the struct encoding so the union keeps
    // full fidelity (TCK WithOrderBy1 [39] — sub-µs and µs-clean
    // localdatetime properties in one CREATE)
    def isNativeTemporal(dt: DataType) = dt == DateType || dt == TimestampNTZType
    def isTemporalStruct(dt: DataType, nativeOther: DataType) = dt match {
      case st: StructType if st.fieldNames.contains("_tkind") =>
        graft.sql.TemporalRuntime.kindOf(nativeOther)
          .contains(graft.sql.TemporalRuntime.structKind(st))
      case _ => false
    }
    val promote = (bt.keySet intersect rt.keySet).filter { k =>
      (isNativeTemporal(bt(k)) && isTemporalStruct(rt(k), bt(k))) ||
      (isNativeTemporal(rt(k)) && isTemporalStruct(bt(k), rt(k)))
    }
    val conflicting = (bt.keySet intersect rt.keySet).filter { k =>
      val (a, b) = (bt(k), rt(k))
      a != b && a != NullType && b != NullType && !promote(k)
    }
    val toVariant = conflicting.filter(k => variantOk(bt(k)) && variantOk(rt(k)))
    val toString0 = conflicting.filter { k =>
      !toVariant(k) && (bt(k) == StringType || rt(k) == StringType)
    }
    def coerce(d: DataFrame, t: Map[String, DataType]) = {
      val v = toVariant.foldLeft(d)((acc, k) =>
        acc.withColumn(k, Variant.ofDataType(col(k), t(k))))
      val s = toString0.foldLeft(v)((acc, k) => acc.withColumn(k, col(k).cast(StringType)))
      promote.foldLeft(s) { (acc, k) =>
        if (isNativeTemporal(t(k)))
          acc.withColumn(k, graft.sql.TemporalRuntime.promoteToStruct(col(k), t(k)))
        else acc
      }
    }
    coerce(base, bt).unionByName(coerce(rows, rt), allowMissingColumns = true)
  }

  /** Fresh writable copy of `g` under `dir` (vertices/, edges/). */
  def copyOf(spark: SparkSession, g: PropertyGraph, dir: String): MutableGraph = {
    g.vertices.write.mode("overwrite").parquet(s"$dir/vertices")
    g.edges.write.mode("overwrite").parquet(s"$dir/edges")
    new MutableGraph(spark, s"$dir/vertices", s"$dir/edges")
  }

  /** Fresh empty graph under `dir` — the minimal vertex/edge schemas;
    * properties appear through schema evolution as writes add them. */
  /** Store column carrying a vertex's USER `id` property. The `id`
    * column is the internal identity (always unique, auto-allocated);
    * an explicit `{id: n}` prop lands here instead, so two distinct
    * vertices may carry the same user id (TCK Merge5 [13]). Present on
    * every MutableGraph store (all-null until an explicit id prop is
    * written) — its presence is what tells the read layer "user id
    * props live in _uid", while parquet-derived graphs (no _uid) keep
    * `id` as plain data. */
  val UserId = "_uid"

  def empty(spark: SparkSession, dir: String): MutableGraph = {
    import org.apache.spark.sql.types._
    val vSchema = StructType(Seq(
      StructField("id", LongType), StructField("label", StringType),
      StructField(UserId, LongType)))
    val eSchema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType),
      StructField("label", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], vSchema)
      .write.mode("overwrite").parquet(s"$dir/vertices")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eSchema)
      .write.mode("overwrite").parquet(s"$dir/edges")
    new MutableGraph(spark, s"$dir/vertices", s"$dir/edges")
  }
}
