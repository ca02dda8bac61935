package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in distributed
  * batches.
  *
  * The decode step itself is STUBBED (no codec libraries in this
  * container): `fakeDecode` produces a deterministic feature vector from
  * the bytes. Everything around it — binary column handling, schema,
  * partition-parallel batch processing via mapPartitions, feature schema —
  * is real and is exactly where a JNI/FFI decoder would slot in at scale.
  * (Python-side the same seam is `mapInPandas`/`mapInArrow`; in this
  * Scala-first library the seam is a typed mapPartitions.)
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decoder: a real implementation would parse the codec header and
    * decode frames; this derives deterministic pseudo-features from the
    * raw bytes so the distributed plumbing is testable end-to-end. */
  def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    var h = 1469598103934665603L
    var i = 0
    while (i < n) { h ^= bytes(i) & 0xffL; h *= 1099511628211L; i += 1 }
    val feat = Array.tabulate(8)(k => ((h >>> (k * 8)) & 0xffL).toDouble / 255.0)
    Row(id, n, 16 + (math.abs(h) % 16).toInt, 16 + (math.abs(h >> 8) % 16).toInt, feat.toSeq)
  }

  /** Batch "decode": one partition = one batch of binary payloads. */
  def decodeFeatures(binaryDocs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    binaryDocs.select(col("doc_id"), col("payload"))
      .mapPartitions(_.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1))))(enc)
  }

  /** Documents-as-binary view: text bytes standing in for media payloads. */
  def binaryView(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("lang"))

  val all: Seq[Q] = Seq(

    // ---- binary column metadata: byte length + content digest ----
    Q("q_multimodal_meta",
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS digest, source
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
      binaryView(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("digest"), col("source"))
        .orderBy("doc_id")
    },

    // ---- distributed batch decode through the stub seam (no oracle:
    //      the stub features are library-defined) ----
    Q.noOracle("q_multimodal_decode") { (s, d) =>
      decodeFeatures(binaryView(s, d).filter(col("doc_id") < 100))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          round(element_at(col("feature"), 1), 6).as("f0"))
        .orderBy("doc_id")
    }
  )
}
