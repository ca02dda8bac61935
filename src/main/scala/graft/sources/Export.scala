package graft.sources

import graft.schema.TypeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Database export (reference `query/sql/parser/ExportDatabaseStatement
  * .java` executing `integration/exporter/Exporter.java` with its format
  * registry — `exporter/format/JsonlExporterFormat.java` is the default —
  * and `exporter/ExporterSettings.java:36-47` includeTypes/excludeTypes).
  *
  * The reference streams every record of every type through a single-node
  * gzip JSONL writer on the server filesystem. A distributed engine
  * exports THROUGH the cluster: each type is one distributed write job
  * into `<url>/<type>/` — jsonl (the reference's default), csv, or
  * parquet — so a 100-TB export is N parallel column-pruned scans, not a
  * driver funnel. Returns one row per exported type (type, records,
  * toUrl), mirroring the reference's ResultInternal summary rows.
  */
object Export {

  /** Export every concrete catalog type (subject to include/exclude) to
    * `url/<type>` in `format` ∈ jsonl | csv | parquet. */
  def exportDatabase(spark: SparkSession, dir: String, cat: TypeCatalog, url: String,
      format: String = "jsonl",
      includeTypes: Set[String] = Set.empty,
      excludeTypes: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    require(includeTypes.isEmpty || excludeTypes.isEmpty,
      "includeTypes and excludeTypes are mutually exclusive")
    val names = cat.typeNames
      .filter(n => cat(n).path.isDefined)
      .filter(n => includeTypes.isEmpty || includeTypes(n))
      .filterNot(excludeTypes)
      .sorted
    val rows = names.map { name =>
      // physical record surface: drop the scan decorations (`@type`
      // discriminator, `_props` dynamic map re-materializes on import)
      val df = cat.scan(spark, dir, name).drop("@type", "_props")
      val target = s"$url/$name"
      format match {
        case "jsonl"   => Importers.writeJsonl(df, target)
        case "csv"     => Importers.writeCsv(df, target)
        case "parquet" => df.write.mode("overwrite").parquet(target)
        case f => throw new IllegalArgumentException(s"unknown export format: $f")
      }
      (name, spark.read.format(if (format == "jsonl") "json" else format)
        .option("header", "true").load(target).count(), target)
    }
    rows.toDF("type", "records", "toUrl")
  }
}
