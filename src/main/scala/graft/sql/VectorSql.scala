package graft.sql

import graft.functions.VectorFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `vector.*` SQL-callable function family (reference
  * function/sql/vector/SQLFunctionVector*.java — ~49 registered names) as
  * Column expressions. Every function here is per-row and codegen-friendly
  * (higher-order array functions / arithmetic — no UDFs), so they inline
  * into whole-stage codegen like any projection at 100 TB. The
  * query-shaped family members (neighbors, rerank, recommend, discover,
  * mmr, fuse-over-resultsets) are whole-operator semantics and live in
  * [[graft.operators.VectorRetrieval]] / [[graft.operators.VectorOps]].
  *
  * Dotted names arrive from the parser as `MethodCall(Ident("vector"), m,
  * args)` — [[Translator]] routes that namespace here.
  */
object VectorSql {

  /** Population variance (SQLFunctionVectorVariance: [1..5] → 2.0). */
  private def popVariance(v: Column): Column = {
    val n = size(v).cast("double")
    val mean = aggregate(v, lit(0.0), (a, x) => a + x) / n
    aggregate(v, lit(0.0), (a, x) => a + (x - mean) * (x - mean)) / n
  }

  /** `vector.neighbors('Type[prop]', key | [keys], k)` — the reference's
    * indexed-function scan (SQLFunctionVectorNeighbors.java + exec/
    * FetchFromIndexedFunctionStep.java: the declared index type drives
    * the access path). A declared LSM_VECTOR/HNSW index on the column
    * picks the partitioned-HNSW tier; otherwise IVF is the fallback.
    * Whole-operator semantics, so [[Translator.compile]] routes a
    * `SELECT vector.neighbors(…)` here instead of compiling a Column. */
  def neighbors(spark: org.apache.spark.sql.SparkSession, dir: String,
      cat: graft.schema.TypeCatalog, args: Seq[Ast.Expr]): org.apache.spark.sql.DataFrame = {
    val spec = args.head match {
      case Ast.StrLit(s) => s
      case o => throw Translator.TranslateException(s"vector.neighbors: expected 'Type[prop]', got $o")
    }
    val m = "^([^\\[]+)\\[([^\\]]+)\\]$".r
    val (typeName, vcol) = spec match {
      case m(t, c) => (t.trim, c.trim)
      case _ => throw Translator.TranslateException(s"vector.neighbors: bad index spec $spec")
    }
    val k = args(2) match {
      case Ast.NumLit(v, true) => v.toInt
      case o => throw Translator.TranslateException(s"vector.neighbors: expected k, got $o")
    }
    val corpus0 = cat.scan(spark, dir, typeName)
    val idCol =
      if (corpus0.columns.contains("vec_id")) "vec_id"
      else corpus0.schema.fields.find(f =>
        f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType).map(_.name)
        .getOrElse(throw Translator.TranslateException(
          s"vector.neighbors: $typeName has no integral id column"))
    val corpus = corpus0.select(col(idCol).cast("long").as("vec_id"), col(vcol).as("embedding"))
    val ids: Seq[Long] = args(1) match {
      case Ast.NumLit(v, true) => Seq(v.toLong)
      case Ast.ArrayLit(es) => es.map {
        case Ast.NumLit(v, true) => v.toLong
        case o => throw Translator.TranslateException(s"vector.neighbors: bad key $o")
      }
      case o => throw Translator.TranslateException(s"vector.neighbors: bad key arg $o")
    }
    val queries = corpus.filter(col("vec_id").isin(ids: _*))
    val useHnsw = cat.indexesOf(typeName)
      .exists(ix => ix.cols == Seq(vcol) && ix.kindOrDefault == "HNSW")
    val res =
      if (useHnsw) graft.operators.VectorOps.annHnsw(corpus, queries, k)
      else graft.operators.VectorOps.annIvf(corpus, queries, k,
        nClusters = 16, nprobe = 6, iters = 3)
    res.withColumn("tier", lit(if (useHnsw) "HNSW" else "IVF"))
  }

  def fn(name: String, cols: Seq[Column], raw: Seq[Ast.Expr]): Column = {
    def v(i: Int): Column = asDouble(cols(i))
    def modeStr(i: Int): String = raw(i) match {
      case Ast.StrLit(s) => s.toUpperCase
      case o => throw Translator.TranslateException(s"vector.$name: expected mode string, got $o")
    }
    name.toLowerCase match {
      // ---- geometry / similarity ----
      case "dotproduct"       => vecDot(v(0), v(1))
      case "cosinesimilarity" => vecCosine(v(0), v(1))
      case "l1distance"       => l1Distance(v(0), v(1))
      case "l2distance"       => l2Distance(v(0), v(1))
      case "l1norm"           => vecNormL1(v(0))
      case "linfnorm"         => vecNormLInf(v(0))
      case "magnitude"        => vecNormL2(v(0))
      case "dimension"        => vecDimension(cols(0))
      // ---- arithmetic ----
      case "add"      => vecAdd(v(0), v(1))
      case "subtract" => vecSubtract(v(0), v(1))
      case "multiply" => zip_with(v(0), v(1), (x, y) => x * y)
      case "scale"    => vecScale(v(0), cols(1))
      case "normalize" => vecNormalize(v(0))
      case "isnormalized" =>
        val tol = if (cols.length > 1) cols(1) else lit(1e-6)
        abs(vecNormL2(v(0)) - 1.0) <= tol
      // ---- hygiene ----
      case "clip"    => clip(v(0), cols(1), cols(2))
      case "hasnan"  => hasNaN(v(0))
      case "hasinf"  => exists(v(0), x => abs(x) === lit(Double.PositiveInfinity))
      case "hasnull" => hasNull(cols(0))
      // ---- element statistics (scalar over ONE vector) ----
      case "min" => array_min(v(0))
      case "max" => array_max(v(0))
      case "sum" => aggregate(v(0), lit(0.0), (a, x) => a + x)
      case "avg" => aggregate(v(0), lit(0.0), (a, x) => a + x) / size(cols(0))
      case "variance" => popVariance(v(0))
      case "stddev"   => sqrt(popVariance(v(0)))
      case "sparsity" =>
        val thr = if (cols.length > 1) cols(1) else lit(1e-6)
        size(filter(v(0), x => abs(x) < thr)).cast("double") / size(cols(0))
      // ---- quantization (QuantizeInt8 → {quantized, min, max}) ----
      case "quantizeint8" =>
        val mn = array_min(v(0)); val mx = array_max(v(0))
        val q = when(mn === mx, transform(v(0), _ => lit(0)))
          .otherwise(transform(v(0), x =>
            floor((x - mn) / (mx - mn) * 255.0 + 0.5).cast("int") - 128))
        struct(q.as("quantized"), mn.as("min"), mx.as("max"))
      case "dequantizeint8" =>
        val s = cols(0)
        val mn = s.getField("min"); val mx = s.getField("max")
        transform(s.getField("quantized"), c => mn + (c + 128) / 255.0 * (mx - mn))
      // ---- retrieval scoring ----
      case "rrfscore" =>
        // sum over ranks of 1/(k + rank); default k = 60
        val k = if (cols.length > 1) cols(1).cast("double") else lit(60.0)
        aggregate(v(0), lit(0.0), (a, r) => a + lit(1.0) / (k + r))
      case "hybridscore" =>
        cols(2) * cols(0) + (lit(1.0) - cols(2)) * cols(1)
      case "multiscore" => modeStr(1) match {
        case "MAX" => array_max(v(0))
        case "MIN" => array_min(v(0))
        case "SUM" => aggregate(v(0), lit(0.0), (a, x) => a + x)
        case "AVG" => aggregate(v(0), lit(0.0), (a, x) => a + x) / size(cols(0))
        case m => throw Translator.TranslateException(s"vector.multiScore: unknown mode $m")
      }
      case "normalizescores" =>
        val mn = array_min(v(0)); val mx = array_max(v(0))
        when(mn === mx, transform(v(0), _ => lit(0.5)))
          .otherwise(transform(v(0), x => (x - mn) / (mx - mn)))
      case "scoretransform" => modeStr(1) match {
        case "SIGMOID" => lit(1.0) / (lit(1.0) + exp(-cols(0)))
        case "LINEAR"  => cols(0).cast("double")
        case "LOG"     => log(lit(1.0) + cols(0))
        case "SQRT"    => sqrt(cols(0))
        case m => throw Translator.TranslateException(s"vector.scoreTransform: unknown mode $m")
      }
      case "tostring" => concat(lit("["),
        array_join(transform(v(0), _.cast("string")), ","), lit("]"))
      case other => throw Translator.TranslateException(
        s"unknown vector function vector.$other (query-shaped members live in " +
          "the vector retrieval operators)")
    }
  }
}
