package graft.mongo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** MongoDB query-language front-end — the Spark re-expression of the
  * reference's MongoDB protocol plugin (reference mongodbw/ module, which
  * translates Mongo find/aggregate documents onto the engine's query
  * planner). A `find` document or an `aggregate` pipeline compiles to ONE
  * declarative DataFrame plan: $match becomes a pushdown-able filter,
  * $group a hash aggregate, $lookup a join — so Catalyst applies the same
  * optimizations Mongo queries would otherwise bypass.
  *
  * Filter surface: implicit equality, $eq $ne $gt $gte $lt $lte $in $nin
  * $regex $exists $mod, conjunction by juxtaposition, $and $or $nor $not.
  * Pipeline stages: $match $project $group $sort $limit $skip $unwind
  * $lookup $count. Accumulators: $sum $avg $min $max $count (double sums
  * decimal-exact per the library-wide parity rule). Expression operators
  * in $project / $group values: field paths "$f", literals, $add $subtract
  * $multiply $divide $concat $toUpper $toLower $split $abs $floor $ceil.
  */
object Mongo {

  private val M = new ObjectMapper()

  // ---------- filter documents ----------

  private def literal(n: JsonNode): Column =
    if (n.isTextual) lit(n.asText)
    else if (n.isIntegralNumber) lit(n.asLong)
    else if (n.isNumber) lit(n.asDouble)
    else if (n.isBoolean) lit(n.asBoolean)
    else if (n.isNull) lit(null)
    else throw new IllegalArgumentException(s"unsupported literal: $n")

  /** One field condition: value doc is either a literal (equality) or an
    * operator document like {"$gt": 5, "$lt": 10} (conditions AND-ed). */
  private def fieldCond(field: String, spec: JsonNode): Column = {
    if (!spec.isObject || !spec.fieldNames.asScala.exists(_.startsWith("$")))
      return col(field) === literal(spec)
    spec.properties.asScala.toSeq.map { e =>
      val c = col(field)
      e.getKey match {
        case "$eq"  => c === literal(e.getValue)
        case "$ne"  => c =!= literal(e.getValue)
        case "$gt"  => c > literal(e.getValue)
        case "$gte" => c >= literal(e.getValue)
        case "$lt"  => c < literal(e.getValue)
        case "$lte" => c <= literal(e.getValue)
        case "$in"  => c.isin(e.getValue.elements.asScala.map(literal).toSeq: _*)
        case "$nin" => !c.isin(e.getValue.elements.asScala.map(literal).toSeq: _*)
        case "$regex"  => c.rlike(e.getValue.asText)
        case "$exists" => if (e.getValue.asBoolean) c.isNotNull else c.isNull
        case "$mod" =>
          val args = e.getValue.elements.asScala.toList
          c % literal(args.head) === literal(args(1))
        case "$not" => !fieldCond(field, e.getValue)
        case op => throw new IllegalArgumentException(s"unsupported operator: $op")
      }
    }.reduce(_ && _)
  }

  /** Whole filter document → Column (top-level keys AND-ed, Mongo rule). */
  def filter(doc: JsonNode): Column = {
    val conds = doc.properties.asScala.toSeq.map { e =>
      e.getKey match {
        case "$and" => e.getValue.elements.asScala.map(filter).reduce(_ && _)
        case "$or"  => e.getValue.elements.asScala.map(filter).reduce(_ || _)
        case "$nor" => !e.getValue.elements.asScala.map(filter).reduce(_ || _)
        case f      => fieldCond(f, e.getValue)
      }
    }
    if (conds.isEmpty) lit(true) else conds.reduce(_ && _)
  }

  // ---------- expression documents ($project / $group values) ----------

  private def expr(n: JsonNode): Column =
    if (n.isTextual && n.asText.startsWith("$")) col(n.asText.drop(1))
    else if (n.isObject) {
      val e = n.properties.asScala.head
      def args = e.getValue.elements.asScala.map(expr).toList
      e.getKey match {
        case "$add"      => args.reduce(_ + _)
        case "$subtract" => args.reduce(_ - _)
        case "$multiply" => args.reduce(_ * _)
        case "$divide"   => args.reduce(_ / _)
        case "$concat"   => concat(args: _*)
        case "$toUpper"  => upper(expr(e.getValue))
        case "$toLower"  => lower(expr(e.getValue))
        case "$abs"      => abs(expr(e.getValue))
        case "$floor"    => floor(expr(e.getValue))
        case "$ceil"     => ceil(expr(e.getValue))
        case "$split" => // separator is a raw literal, not a Column
          val raw = e.getValue.elements.asScala.toList
          split(expr(raw.head), java.util.regex.Pattern.quote(raw(1).asText))
        case op => throw new IllegalArgumentException(s"unsupported expression: $op")
      }
    }
    else literal(n)

  // ---------- find ----------

  /** db.coll.find(filter, projection).sort(s).skip(n).limit(n) */
  def find(df: DataFrame, filterJson: String, projectionJson: String = null,
      sortJson: String = null, skip: Int = 0, limit: Int = -1): DataFrame = {
    var out = df.where(filter(M.readTree(filterJson)))
    if (projectionJson != null) {
      val p = M.readTree(projectionJson)
      val keep = p.properties.asScala.toSeq.filter(_.getValue.asInt == 1).map(_.getKey).toSeq
      out = out.select(keep.map(col): _*)
    }
    if (sortJson != null) out = out.orderBy(sortCols(M.readTree(sortJson)): _*)
    if (skip > 0) out = out.offset(skip)
    if (limit >= 0) out = out.limit(limit)
    out
  }

  private def sortCols(doc: JsonNode): Seq[Column] =
    doc.properties.asScala.toSeq.map(e =>
      if (e.getValue.asInt < 0) col(e.getKey).desc else col(e.getKey).asc).toSeq

  // ---------- aggregate ----------

  /** db.coll.aggregate(pipeline); `tables` resolves $lookup.from. */
  def aggregate(df: DataFrame, pipelineJson: String,
      tables: Map[String, DataFrame] = Map.empty): DataFrame = {
    val stages = M.readTree(pipelineJson)
    require(stages.isArray, "pipeline must be a JSON array")
    var cur = df
    val it = stages.elements.asScala.toList
    var i = 0
    while (i < it.size) {
      val stage = it(i)
      val e = stage.properties.asScala.head
      e.getKey match {
        case "$match" => cur = cur.where(filter(e.getValue))
        case "$project" =>
          val cols = e.getValue.properties.asScala.toSeq.flatMap { p =>
            if (p.getValue.isInt && p.getValue.asInt == 1) Some(col(p.getKey))
            else if (p.getValue.isInt && p.getValue.asInt == 0) None
            else Some(expr(p.getValue).as(p.getKey))
          }.toSeq
          cur = cur.select(cols: _*)
        case "$group" =>
          val spec = e.getValue
          val idNode = spec.get("_id")
          val keys: Seq[Column] =
            if (idNode == null || idNode.isNull) Nil
            else if (idNode.isTextual) Seq(expr(idNode).as("_id"))
            else idNode.properties.asScala.toSeq.map(p => expr(p.getValue).as(p.getKey)).toSeq
          val accs = spec.properties.asScala.toSeq.filter(_.getKey != "_id").map { a =>
            val acc = a.getValue.properties.asScala.head
            val c = acc.getKey match {
              case "$sum" if acc.getValue.isNumber && acc.getValue.asDouble == 1.0 =>
                count(lit(1))
              case "$sum" =>
                // decimal-exact: double sums are summation-order-dependent
                sum(expr(acc.getValue).cast("decimal(28,4)")).cast("double")
              case "$avg" => // exact decimal sum, then ONE IEEE divide
                sum(expr(acc.getValue).cast("decimal(28,4)")).cast("double") /
                  count(expr(acc.getValue))
              case "$min"   => min(expr(acc.getValue))
              case "$max"   => max(expr(acc.getValue))
              case "$count" => count(lit(1))
              case op => throw new IllegalArgumentException(s"unsupported accumulator: $op")
            }
            c.as(a.getKey)
          }.toSeq
          cur =
            if (keys.isEmpty) cur.agg(accs.head, accs.tail: _*)
            else cur.groupBy(keys: _*).agg(accs.head, accs.tail: _*)
        case "$sort"  => cur = cur.orderBy(sortCols(e.getValue): _*)
        case "$limit" => cur = cur.limit(e.getValue.asInt)
        case "$skip"  => cur = cur.offset(e.getValue.asInt)
        case "$count" => cur = cur.agg(count(lit(1)).as(e.getValue.asText))
        case "$unwind" =>
          val f = e.getValue.asText.stripPrefix("$")
          cur = cur.withColumn(f, explode(col(f)))
        case "$lookup" =>
          val spec = e.getValue
          val from = spec.get("from").asText
          val local = spec.get("localField").asText
          val foreign = spec.get("foreignField").asText
          val as = spec.get("as").asText
          val ft = tables.getOrElse(from,
            throw new IllegalArgumentException(s"unknown $$lookup collection: $from"))
          // $lookup immediately followed by $unwind of the same field is the
          // dominant join idiom — fuse the two into a plain join (no
          // array materialization); standalone $lookup builds the array.
          val fused = i + 1 < it.size && {
            val nx = it(i + 1).properties.asScala.head
            nx.getKey == "$unwind" && nx.getValue.asText.stripPrefix("$") == as
          }
          val fcols = ft.columns
          val fstruct = ft.select(col(foreign).as("__fk"),
            struct(fcols.map(col): _*).as(as))
          if (fused) {
            cur = cur.join(fstruct, col(local) === col("__fk"), "inner").drop("__fk")
            i += 1 // consume the $unwind
          } else {
            cur = cur.join(fstruct, col(local) === col("__fk"), "left").drop("__fk")
              .groupBy(cur.columns.map(col): _*)
              .agg(collect_list(col(as)).as(as))
          }
        case op => throw new IllegalArgumentException(s"unsupported stage: $op")
      }
      i += 1
    }
    cur
  }

  // ---------- write commands ----------
  // The reference's Mongo plugin translates the wire `insert` / `update` /
  // `delete` commands onto its SQL DML (MongoDBDatabaseWrapper.java:442,
  // 546, 505: replacement → CONTENT, $set → MERGE, $unset → REMOVE,
  // $inc → SET f += n; delete limit 1 = deleteOne, 0 = deleteMany). Here
  // they map onto the shared MutableTable write path, which already
  // carries those semantics (schema-evolving insert, null-out removal,
  // full-property-set replacement).

  import org.apache.spark.sql.SparkSession
  import graft.sources.MutableTable

  private def docRow(spark: SparkSession, d: JsonNode): DataFrame =
    graft.OneRow(spark).select(
      d.properties.asScala.toSeq.map(e => literal(e.getValue).as(e.getKey)): _*)

  /** `insert` command: JSON document or array of documents. Returns n. */
  def insertCmd(spark: SparkSession, table: MutableTable, documentsJson: String): Long = {
    val root = M.readTree(documentsJson)
    val docs = (if (root.isArray) root.elements.asScala.toSeq else Seq(root))
    table.insert(docs.map(docRow(spark, _))
      .reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** `update` command, one spec: {q, u, multi, upsert}. Returns n
    * (modified + upserted, the reference's response `n`). */
  def updateCmd(spark: SparkSession, table: MutableTable, qJson: String,
      uJson: String, multi: Boolean = true, upsert: Boolean = false): Long = {
    val q = M.readTree(qJson)
    val u = M.readTree(uJson)
    val isReplacement = !u.fieldNames.asScala.exists(_.startsWith("$"))
    val sets: Seq[(String, Column)] =
      if (isReplacement) {
        val keys = u.fieldNames.asScala.toSet
        u.properties.asScala.toSeq.map(e => e.getKey -> literal(e.getValue)) ++
          table.df.columns.filterNot(keys).map(_ -> lit(null)) // CONTENT: replace whole doc
      } else u.properties.asScala.toSeq.flatMap { e =>
        val operand = e.getValue.properties.asScala.toSeq
        e.getKey match {
          case "$set"   => operand.map(f => f.getKey -> literal(f.getValue))
          case "$unset" => operand.map(f => f.getKey -> lit(null))
          case "$inc"   => operand.map(f => f.getKey -> (col(f.getKey) + literal(f.getValue)))
          case op => throw new IllegalArgumentException(s"unsupported update operator $op")
        }
      }
    val where0 = filter(q)
    // updateOne mutates EXACTLY ONE matching row even when duplicate
    // documents exist (MutableTable.updateOne pins a synthetic rowid;
    // whole-row re-identification would hit every identical copy)
    val n = if (multi) table.update(where0, sets)._1
            else table.updateOne(where0, sets)
    if (n == 0 && upsert) {
      // seed from the filter's top-level equalities, then apply u
      // (MongoDBDatabaseWrapper.executeUpsert)
      val seed: Seq[(String, Column)] = q.properties.asScala.toSeq.collect {
        case e if !e.getKey.startsWith("$") && (!e.getValue.isObject) =>
          e.getKey -> literal(e.getValue)
        case e if !e.getKey.startsWith("$") && e.getValue.has("$eq") =>
          e.getKey -> literal(e.getValue.get("$eq"))
      }
      val applied: Seq[(String, Column)] =
        if (isReplacement) u.properties.asScala.toSeq.map(e => e.getKey -> literal(e.getValue))
        else u.properties.asScala.toSeq.flatMap { e =>
          val operand = e.getValue.properties.asScala.toSeq
          e.getKey match {
            case "$set"   => operand.map(f => f.getKey -> literal(f.getValue))
            case "$inc"   => operand.map(f => f.getKey -> literal(f.getValue)) // from zero
            case "$unset" => Nil
            case op => throw new IllegalArgumentException(s"unsupported update operator $op")
          }
        }
      val fields = (seed.toMap ++ applied.toMap).toSeq
      table.insert(graft.OneRow(spark).select(fields.map { case (k, c) => c.as(k) }: _*))
      1L
    } else n
  }

  /** `delete` command, one spec: {q, limit}. limit 1 deletes only the
    * first match (deleteOne); limit 0 deletes all (deleteMany). */
  def deleteCmd(spark: SparkSession, table: MutableTable, qJson: String,
      limitOne: Boolean = false): Long = {
    val where0 = filter(M.readTree(qJson))
    if (limitOne) table.deleteOne(where0) else table.delete(where0)
  }
}
