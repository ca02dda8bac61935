package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared as a [[Q]] in
  * one of the operator modules; this object flattens them into the
  * `queries` / `oracleSql` maps the driver's verify + bench harness runs.
  */
object SparkEntry {

  /** All declared operator queries, in module order. */
  val allQueries: Seq[Q] =
    Relational.all ++ TimeSeriesOps.all ++ GraphOps.all ++ GraphAlgoOps.all ++ GeoOps.all ++
      TextPipeline.all ++ VectorOps.all ++ VectorRetrieval.all ++
      Multimodal.all ++ FullText.all ++ StreamingOps.all ++ DmlOps.all ++
      SchemaOps.all ++ MiscOps.all ++ ImportOps.all ++ SqlOps.all ++ CypherOps.all ++
      CypherWriteOps.all ++ PromQLOps.all ++ SkewJoin.all ++ SamplingOps.all ++
      AsOfJoin.all ++ GremlinOps.all ++ MongoOps.all ++ KvOps.all ++ GraphQLOps.all ++
      SequencePack.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
