package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Import / export formats (SURVEY.md §2.1 importer/exporter rows —
  * reference integration/.../importer/format/CSVImporterFormat.java,
  * JSONImporterFormat.java, JsonlImporterFormat.java, RDFImporterFormat
  * .java, GloVeImporterFormat.java; exporter JsonlExporterFormat.java;
  * Cypher LOAD CSV cy/steps/LoadCSVStep.java:61).
  *
  * Spark-first: CSV/JSON(L) are `spark.read`/`spark.write` — distributed,
  * schema-on-read, pushdown-capable. The line-oriented research formats
  * (N-Triples RDF, GloVe) are one `split`/regex projection over
  * `spark.read.text`, which scales as a plain text scan; no driver-side
  * parsing anywhere.
  */
object Importers {

  // ---- CSV (CSVImporterFormat / LOAD CSV) ----
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  // ---- JSONL (JsonlImporterFormat / JsonlExporterFormat) ----
  def readJsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** N-Triples RDF: `<subject> <predicate> "literal" .` or
    * `<s> <p> <o> .` per line (RDFImporterFormat.java). Returns
    * (subject, predicate, obj); literals keep their unquoted lexical
    * form, IRIs their bracket-stripped form. */
  def readNTriples(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^<([^>]*)>\\s+<[^>]*>\\s+.*$", 1).as("subject"),
        regexp_extract(col("value"), "^<[^>]*>\\s+<([^>]*)>\\s+.*$", 1).as("predicate"),
        // object: IRI or quoted literal
        when(regexp_extract(col("value"), "^<[^>]*>\\s+<[^>]*>\\s+<([^>]*)>\\s*\\.\\s*$", 1) =!= "",
          regexp_extract(col("value"), "^<[^>]*>\\s+<[^>]*>\\s+<([^>]*)>\\s*\\.\\s*$", 1))
          .otherwise(regexp_extract(col("value"), "^<[^>]*>\\s+<[^>]*>\\s+\"([^\"]*)\"\\s*\\.\\s*$", 1))
          .as("obj"))

  /** InfluxDB line protocol: `measurement,tag1=v1,… field1=1.5,… tsNanos`
    * (engine/timeseries/LineProtocolParser.java — the reference's TS
    * ingestion wire format). Tags/fields surface as map columns; the
    * timestamp converts ns → µs TimestampType. One regex projection over
    * a distributed text scan. */
  def readLineProtocol(spark: SparkSession, path: String): DataFrame = {
    def kvMap(c: org.apache.spark.sql.Column) =
      map_from_entries(transform(split(c, ","),
        kv => struct(split(kv, "=").getItem(0), split(kv, "=").getItem(1))))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^([^, ]+)", 1).as("measurement"),
        regexp_extract(col("value"), "^[^, ]+,([^ ]*) ", 1).as("rawTags"),
        regexp_extract(col("value"), "^[^ ]+ ([^ ]+) ", 1).as("rawFields"),
        regexp_extract(col("value"), " ([0-9]+)\\s*$", 1).cast("long").as("ts_nanos"))
      .select(col("measurement"),
        kvMap(col("rawTags")).as("tags"),
        kvMap(col("rawFields")).as("fields"),
        timestamp_micros(expr("ts_nanos div 1000")).as("ts"))
  }

  /** GloVe/word2vec text: `token v1 v2 … vD` per line
    * (GloVeImporterFormat.java). Returns (token, vector). */
  def readGlove(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(split(col("value"), " ").as("f"))
      .select(element_at(col("f"), 1).as("token"),
        expr("transform(slice(f, 2, size(f) - 1), x -> cast(x AS double))").as("vector"))

  /** Word2Vec text (Word2VecImporterFormat.java): like GloVe but with a
    * `vocab_size dim` header line — dropped by shape (2 tokens), so the
    * scan stays a distributed text read with no "first line" coupling. */
  def readWord2Vec(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(split(col("value"), " ").as("f"))
      .filter(size(col("f")) > 2) // header = exactly (count, dim)
      .select(element_at(col("f"), 1).as("token"),
        expr("transform(slice(f, 2, size(f) - 1), x -> cast(x AS double))").as("vector"))

  /** OrientDB database export (OrientDBImporterFormat.java): one JSON
    * document with a `records` array of `{"@type":"d","@class":…,…}`
    * objects. `multiLine` JSON read → explode records → filter by class.
    * Returns the records of `className` with their property columns. */
  def readOrientDbExport(spark: SparkSession, path: String, className: String): DataFrame = {
    val recs = spark.read.option("multiLine", "true").json(path)
      .select(explode(col("records")).as("r"))
      .filter(col("r.@class") === className)
    recs.select(col("r.*")).drop("@type", "@class")
  }

  // ---- XML (XMLImporterFormat.java) — Spark 4's native XML source:
  // distributed row-tag splitting, schema-on-read, pushdown-capable ----
  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").format("xml").option("rowTag", rowTag).save(path)

  /** Neo4j JSONL dump (the `neo4j-admin`/apoc JSON export the reference
    * imports — Neo4jImporter.java:222): one object per line with
    * type=node|relationship, `labels`/`label`, `properties`, and
    * relationship `start`/`end` endpoint objects. Returns (nodes, rels):
    * nodes(id, labels, properties…), rels(label, src, dst, properties…).
    * One schema-on-read JSON scan, split by the discriminator — the same
    * two-pass shape as the reference (schema sync, then records). */
  def readNeo4j(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.json(path)
    val nodes = raw.filter(col("type") === "node")
      .select(col("id").cast("string").as("id"), col("labels"), col("properties"))
    val rels = raw.filter(col("type") === "relationship")
      .select(col("label"),
        col("start.id").cast("string").as("src"),
        col("end.id").cast("string").as("dst"),
        col("properties"))
    (nodes, rels)
  }
}
