package graft.sql

import graft.schema.{TriggerDef, TypeCatalog, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Statement surface for materialized views, continuous aggregates and
  * triggers (reference grammar SQLParser.g4 createMaterializedViewBody /
  * createContinuousAggregateBody / createTriggerBody; runtime
  * schema/MaterializedViewImpl.java, schema/ContinuousAggregate.java +
  * ContinuousAggregateRefresher.java:54-96, schema/trigger/TriggerImpl
  * .java). The underlying machinery predates this front-end
  * (streaming/Incremental.scala, sources/MutableTable.scala triggers);
  * this file makes it reachable from SQL text.
  *
  * Semantics:
  *  - CREATE MATERIALIZED VIEW n AS SELECT … [REFRESH MANUAL|INCREMENTAL|
  *    EVERY k SECOND|MINUTE|HOUR]: builds now, registers `n` as a
  *    queryable type over the backing parquet. REFRESH MATERIALIZED VIEW
  *    recomputes the definition in full (the reference's MANUAL path; its
  *    INCREMENTAL/PERIODIC modes hang change listeners / a timer on the
  *    same recompute — the group-incremental variant lives in
  *    [[graft.streaming.Incremental.MaterializedView]]).
  *  - CREATE CONTINUOUS AGGREGATE n AS SELECT <bucket>, <aggs> FROM t
  *    GROUP BY …: the bucket column is the first timestamp-typed output;
  *    the source timestamp column is recovered from the bucket
  *    projection's AST. REFRESH is the reference's delete-first protocol:
  *    buckets strictly below the watermark are frozen history, buckets at
  *    or past it are recomputed from source rows with ts >= watermark
  *    (late rows older than the watermark stay invisible — exactly
  *    ContinuousAggregateRefresher's contract), then the watermark
  *    advances to the max bucket.
  *  - CREATE TRIGGER n BEFORE|AFTER CREATE|UPDATE|DELETE ON [TYPE] t
  *    EXECUTE SQL '<stmt>': registers on the catalog; the DML path
  *    attaches it to the type's writable storage so the action statement
  *    runs when the event fires.
  */
object ViewDdl {

  import Ast._

  /** Parse + execute the CREATE/DROP/REFRESH statement at `p` (first
    * keyword not yet consumed). Returns a one-row status frame. */
  def statement(spark: SparkSession, dir: String, cat: TypeCatalog,
      fns: Map[String, (Seq[String], Expr)], p: Parser.P): DataFrame = {
    import spark.implicits._
    def status(name: String, kind: String, detail: String, st: String): DataFrame =
      Seq((name, kind, detail, st)).toDF("name", "kind", "detail", "status")

    def viewKind(): String =
      if (p.kw("MATERIALIZED")) { p.expectKw("VIEW"); "MATVIEW" }
      else if (p.kw("CONTINUOUS")) { p.expectKw("AGGREGATE"); "CAGG" }
      else if (p.kw("TRIGGER")) "TRIGGER"
      else throw Parser.ParseException(
        "expected MATERIALIZED VIEW / CONTINUOUS AGGREGATE / TRIGGER")

    if (p.kw("CREATE")) viewKind() match {
      case "TRIGGER" =>
        val name = Parser.ident(p)
        val timing = if (p.kw("BEFORE")) "BEFORE"
          else { p.expectKw("AFTER"); "AFTER" }
        val event = Parser.ident(p).toUpperCase
        require(Seq("CREATE", "UPDATE", "DELETE").contains(event),
          s"trigger event must be CREATE/UPDATE/DELETE, got $event")
        p.expectKw("ON")
        p.kw("TYPE") // optional noise word
        val t = Parser.ident(p)
        p.expectKw("EXECUTE")
        p.expectKw("SQL")
        val code = p.next() match {
          case Parser.TStr(s) => s
          case tok => throw Parser.ParseException(s"expected SQL string, found $tok")
        }
        cat.registerTrigger(TriggerDef(name, t, timing, event, code))
        status(name, "TRIGGER", s"$timing $event ON $t", "CREATED")

      case kind =>
        val name = Parser.ident(p)
        p.expectKw("AS")
        val sel = Parser.parseSelect(p)
        val mode =
          if (p.kw("REFRESH")) {
            if (p.kw("MANUAL")) "MANUAL"
            else if (p.kw("INCREMENTAL")) "INCREMENTAL"
            else { p.expectKw("EVERY")
              val n = p.next() match {
                case Parser.TNum(s) => s
                case tok => throw Parser.ParseException(s"expected interval, found $tok")
              }
              val unit = Parser.ident(p).toUpperCase
              require(Seq("SECOND", "MINUTE", "HOUR").contains(unit), s"bad unit $unit")
              s"EVERY $n $unit"
            }
          } else "MANUAL"
        val backing = s"/tmp/graft_views/${name}_${System.nanoTime()}"
        val built = Translator.compile(spark, dir, cat, sel, fns)
        built.localCheckpoint(eager = true).write.mode("overwrite").parquet(backing)
        val v = if (kind == "CAGG") {
          val bucket = built.schema.fields.find(_.dataType == TimestampType)
            .getOrElse(throw new IllegalArgumentException(
              "CONTINUOUS AGGREGATE needs a timestamp-typed bucket projection")).name
          val tsCol = sourceTsCol(spark, dir, cat, sel, bucket)
          ViewDef(name, kind, mode, sel, backing, Some(bucket), Some(tsCol))
        } else ViewDef(name, kind, mode, sel, backing)
        cat.registerView(v)
        cat.createType(name, "DOCUMENT", path = Some(_ => backing))
        v.bucketCol.foreach(b => advanceWatermark(spark, cat, name, backing, b))
        status(name, kind, mode, "CREATED")
    }
    else if (p.kw("DROP")) {
      val kind = viewKind()
      val name = Parser.ident(p)
      if (kind == "TRIGGER") cat.dropTrigger(name)
      else { cat.dropView(name); cat.dropType(name) }
      status(name, kind, "", "DROPPED")
    }
    else if (p.kw("REFRESH")) {
      val kind = viewKind()
      require(kind != "TRIGGER", "cannot REFRESH a trigger")
      val name = Parser.ident(p)
      val v = cat.viewByName(name)
      val sel = v.select.asInstanceOf[Select]
      val next: DataFrame = (v.kind, cat.viewWatermark(name)) match {
        case ("CAGG", Some(w)) =>
          // delete-first: frozen history below the watermark; buckets at or
          // past it recomputed from source rows with ts >= watermark
          val frozen = spark.read.parquet(v.backingDir)
            .filter(col(v.bucketCol.get) < lit(w))
          val bound = Bin(">=", Ident(v.tsCol.get), Resolved(w))
          val selW = sel.copy(where =
            Some(sel.where.fold[Expr](bound)(Bin("AND", _, bound))))
          frozen.unionByName(Translator.compile(spark, dir, cat, selW, fns))
        case _ => Translator.compile(spark, dir, cat, sel, fns)
      }
      next.localCheckpoint(eager = true).write.mode("overwrite").parquet(v.backingDir)
      v.bucketCol.foreach(b => advanceWatermark(spark, cat, name, v.backingDir, b))
      status(name, kind, v.mode, "REFRESHED")
    }
    else throw Parser.ParseException("expected CREATE/DROP/REFRESH")
  }

  private def advanceWatermark(spark: SparkSession, cat: TypeCatalog,
      name: String, backing: String, bucketCol: String): Unit = {
    val mx = spark.read.parquet(backing).agg(max(col(bucketCol))).collect()(0)
    if (!mx.isNullAt(0)) cat.setViewWatermark(name, mx.getTimestamp(0))
  }

  /** The source timestamp column the bucket is derived from: the first
    * identifier inside the bucket projection's expression that names a
    * source column (the reference's analyzer recovers timestampColumn
    * from the aggregate query the same way). */
  private def sourceTsCol(spark: SparkSession, dir: String, cat: TypeCatalog,
      sel: Select, bucket: String): String = {
    val srcCols = cat.scan(spark, dir, sel.from).columns.toSet
    val proj = sel.projections.find(pr =>
      pr.alias.contains(bucket) || exprNameOf(pr.expr) == bucket)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot locate the bucket projection $bucket"))
    def idents(e: Expr): Seq[String] = e match {
      case Ident(n)          => Seq(n)
      case FnCall(_, as, _)  => as.flatMap(idents)
      case MethodCall(t, _, as) => idents(t) ++ as.flatMap(idents)
      case Bin(_, l, r)      => idents(l) ++ idents(r)
      case PropAccess(t, _)  => idents(t)
      case _                 => Seq.empty
    }
    idents(proj.expr).find(srcCols.contains).getOrElse(
      throw new IllegalArgumentException(
        s"bucket projection $bucket references no source column"))
  }

  private def exprNameOf(e: Expr): String = e match {
    case Ident(n) => n
    case _        => ""
  }
}
