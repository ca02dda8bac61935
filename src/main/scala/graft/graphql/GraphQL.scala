package graft.graphql

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphQL front-end — the Spark re-expression of the reference's graphql/
  * module (reference graphql/src/main/java/com/arcadedb/graphql/
  * GraphQLQueryEngine.java; schema directives per
  * graphql/src/test/java/com/arcadedb/graphql/AbstractGraphQLTest.java:95 —
  * `type Query { bookByName(name: String): Book }` entry points and
  * `@relationship(type: "...", direction: IN|OUT)` traversal fields).
  *
  * A query resolves to ONE DataFrame plan: the entry field is a label scan
  * filtered by its arguments, scalar selections are column projections, and
  * each @relationship selection is an edge join whose target rows are
  * collected per parent as a sorted array of structs (the nested JSON-ish
  * shape GraphQL returns), so nesting is a groupBy-collect_list — shuffle
  * cost proportional to the selected subtree, never a driver-side loop.
  */
object GraphQL {

  // ---------- schema model ----------

  final case class RelField(name: String, targetType: String, edgeLabel: String, dirOut: Boolean)
  final case class TypeDef(name: String, scalars: List[String], rels: List[RelField])
  final case class EntryDef(name: String, argName: String, targetType: String, isList: Boolean)
  final case class Schema(entries: Map[String, EntryDef], types: Map[String, TypeDef]) {
    /** vertex label for a GraphQL type (reference maps type name = DB type name) */
    def label(t: String): String = t.toLowerCase
  }

  private val EntryRe =
    """(\w+)\s*\(\s*(\w+)\s*:\s*\w+\s*\)\s*:\s*(\[?)(\w+)\]?""".r
  private val RelRe =
    """(\w+)\s*:\s*\[?(\w+)\]?\s+@relationship\s*\(\s*type\s*:\s*"([^"]+)"\s*,\s*direction\s*:\s*(IN|OUT)\s*\)""".r
  private val ScalarRe = """(\w+)\s*:\s*(\w+)\s*$""".r

  /** Parse `type X { ... }` blocks (the reference registers these via its
    * GraphQL schema DDL; same surface, hand-parsed). */
  def parseSchema(text: String): Schema = {
    val blocks = """type\s+(\w+)\s*\{([^}]*)\}""".r.findAllMatchIn(text).toList
    var entries = Map.empty[String, EntryDef]
    var types = Map.empty[String, TypeDef]
    for (b <- blocks) {
      val name = b.group(1); val body = b.group(2)
      val lines = body.split("\n").map(_.trim).filter(_.nonEmpty).toList
      if (name == "Query") {
        for (l <- lines) l match {
          case EntryRe(f, arg, br, t) => entries += f -> EntryDef(f, arg, t, br == "[")
          case _ => throw new IllegalArgumentException(s"malformed Query field: $l")
        }
      } else {
        var scalars = List.empty[String]; var rels = List.empty[RelField]
        for (l <- lines) l match {
          case RelRe(f, t, label, dir) => rels :+= RelField(f, t, label, dir == "OUT")
          case ScalarRe(f, _) => scalars :+= f
          case _ => throw new IllegalArgumentException(s"malformed field in type $name: $l")
        }
        types += name -> TypeDef(name, scalars, rels)
      }
    }
    Schema(entries, types)
  }

  // ---------- query model ----------

  private final case class Sel(field: String, sub: List[Sel])

  /** Parse `{ entry(arg: v) { a b rel { c } } }`. */
  private def parseQuery(text: String): (String, String, List[Sel]) = {
    val t = text.trim
    require(t.startsWith("{") && t.endsWith("}"), "query must be a { ... } document")
    val body = t.substring(1, t.length - 1).trim
    val m = """^(\w+)\s*\(\s*(\w+)\s*:\s*("?[^")]*"?)\s*\)\s*""".r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalArgumentException(s"malformed entry call: $body"))
    val rest = body.substring(m.matched.length).trim
    val sels = if (rest.isEmpty) Nil else {
      require(rest.startsWith("{") && rest.endsWith("}"), s"malformed selection set: $rest")
      parseSels(rest.substring(1, rest.length - 1))
    }
    (m.group(1), m.group(3), sels)
  }

  private def parseSels(body: String): List[Sel] = {
    val out = scala.collection.mutable.ListBuffer[Sel]()
    var i = 0
    val s = body
    while (i < s.length) {
      while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val name = s.substring(start, i)
        require(name.nonEmpty, s"malformed selection at: ${s.substring(start)}")
        while (i < s.length && s(i).isWhitespace) i += 1
        if (i < s.length && s(i) == '{') {
          var depth = 1; val open = i; i += 1
          while (i < s.length && depth > 0) {
            if (s(i) == '{') depth += 1 else if (s(i) == '}') depth -= 1
            i += 1
          }
          out += Sel(name, parseSels(s.substring(open + 1, i - 1)))
        } else out += Sel(name, Nil)
      }
    }
    out.toList
  }

  // ---------- resolution ----------

  /** Resolve one type's selection into columns over `rows` (a DataFrame of
    * that type's vertices, `id` column included). Relationship selections
    * recurse: expand the edge, resolve the target subtree, collect per
    * parent id as a sorted array of structs. */
  private def resolve(g: PropertyGraph, schema: Schema, t: TypeDef,
      rows: DataFrame, sels: List[Sel], prune: Boolean): DataFrame = {
    val effective = if (sels.isEmpty) t.scalars.map(Sel(_, Nil)) else sels
    var cur = rows
    // r12 (guide §3.2): this level's id set, pinned once, for pushing into
    // the relationship expansions below. Materialized (tiny — the entry
    // filter's survivors and their descendants) so every semi-join build
    // reads one small RDD instead of re-planning the parent subtree per
    // reference (the unpinned form duplicated the tree: 14 → 56 Exchanges).
    lazy val levelIds = graft.Materialize.once(rows.select(col("id")).distinct())
    val outCols = scala.collection.mutable.ListBuffer[String]("id")
    for (sel <- effective) {
      if (t.scalars.contains(sel.field)) outCols += sel.field
      else {
        val rel = t.rels.find(_.name == sel.field).getOrElse(
          throw new IllegalArgumentException(s"unknown field ${sel.field} on type ${t.name}"))
        val target = schema.types(rel.targetType)
        val (near, far) = if (rel.dirOut) ("src", "dst") else ("dst", "src")
        // r12 (guide §3.2): for a SINGLE-OBJECT entry point, resolve
        // TOP-DOWN — restrict each level's edge expansion to the parents
        // that survived the entry filter, and the target vertices to the
        // reachable ids, via semi-joins against the pinned id set. A point
        // lookup (customerByKey) otherwise resolves EVERY order's full
        // parts array before the root join throws all but one away; the
        // semi-join chain keeps each level's shuffle proportional to the
        // selected subtree (the pinned one-root set broadcasts, pruning
        // the child scans). Result-identical: the parent join below is on
        // __pid ∈ cur.id and `nested` inner-joins __tid, so rows outside
        // the semi-joined sets never reach the output. LIST entries keep
        // the bottom-up shape: their selectivity is unknown without stats,
        // and the measured sf0.1 A/B had the semi-join overhead losing on
        // the weakly-selective ordersByName (1.5 → 1.9 s) while the point
        // lookup was flat locally and subtree-proportional at scale.
        val e0 = g.edges.filter(col("label") === rel.edgeLabel)
          .select(col(near).as("__pid"), col(far).as("__tid"))
        val e = if (prune)
          e0.join(levelIds.withColumnRenamed("id", "__pid"), Seq("__pid"), "left_semi")
        else e0
        val targetRows0 = g.vertices.filter(col("label") === schema.label(rel.targetType))
        val targetRows = if (prune)
          targetRows0.join(e.select(col("__tid").as("id")), Seq("id"), "left_semi")
        else targetRows0
        val sub = resolve(g, schema, target, targetRows, sel.sub, prune)
        val subFields = sub.columns.filter(_ != "id")
        val nested = e.join(sub.withColumnRenamed("id", "__tid2"), col("__tid") === col("__tid2"))
          .groupBy(col("__pid"))
          .agg(sort_array(collect_list(struct(subFields.map(col): _*))).as(sel.field))
        cur = cur.join(nested, cur("id") === nested("__pid"), "left")
          .drop("__pid")
          // GraphQL returns [] (not null) for a match-less list field
          .withColumn(sel.field, coalesce(col(sel.field), array().cast(
            org.apache.spark.sql.types.ArrayType(
              nested.schema(sel.field).dataType
                .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType))))
        outCols += sel.field
      }
    }
    cur.select(outCols.distinct.map(col).toSeq: _*)
  }

  /** Execute a GraphQL query document against the property graph. */
  def query(g: PropertyGraph, schemaText: String, queryText: String): DataFrame = {
    val schema = parseSchema(schemaText)
    val (entryName, rawArg, sels) = parseQuery(queryText)
    val entry = schema.entries.getOrElse(entryName,
      throw new IllegalArgumentException(s"unknown Query field: $entryName"))
    val t = schema.types(entry.targetType)
    val argVal: Column =
      if (rawArg.startsWith("\"")) lit(rawArg.stripPrefix("\"").stripSuffix("\""))
      else lit(rawArg.toLong)
    val roots = g.vertices.filter(col("label") === schema.label(entry.targetType))
      .filter(col(entry.argName) === argVal)
    resolve(g, schema, t, roots, sels, prune = !entry.isList).drop("id")
  }
}
