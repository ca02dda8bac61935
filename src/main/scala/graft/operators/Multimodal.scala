package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, encoded/decoded in distributed partition batches.
  *
  * The codec seam is REAL: payloads are genuine PNG files produced by
  * `javax.imageio` inside `mapPartitions` (the JVM's standard image
  * codec — no external dependency), and the decode step parses those
  * bytes back through `ImageIO.read`, extracting dimensions and per-
  * channel means. PNG is lossless, so the decoded features are exactly
  * derivable from the deterministic generator — which is what the DuckDB
  * oracle computes analytically, closing the loop on the whole
  * encode → binary column → decode → feature pipeline.
  *
  * Scale shape: one partition = one batch of payloads; encode and decode
  * are narrow per-row transforms with no shuffle (the Python-side analog
  * is `mapInArrow`/`mapInPandas`; in this Scala-first library the seam is
  * a typed mapPartitions). A real corpus would read the binary column
  * from parquet exactly as this one does.
  */
object Multimodal {

  val imageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Deterministic test image: size and every pixel derive from the id
    * (the DuckDB oracle recomputes the same channel sums analytically). */
  private def renderPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 17).toInt
    val h = 16 + (id % 13).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 7 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Distributed PNG encode: ids → real PNG binary payloads. */
  def encodeImages(ids: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageSchema)
    ids.select(col("doc_id"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, renderPng(id))
      })(enc)
  }

  /** Distributed PNG decode: parse the payload bytes with the JVM codec,
    * emit dimensions + exact per-channel means (integer sums ÷ pixels). */
  def decodeImages(binaryDocs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    binaryDocs.select(col("doc_id"), col("payload"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        Row(id, w, h, sr / n, sg / n, sb / n)
      })(enc)
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

    // ---- REAL codec round-trip: distributed PNG encode → binary column
    //      → ImageIO decode → features; oracle recomputes the lossless
    //      channel means analytically from the pixel generator ----
    Q("q_multimodal_decode",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |px AS (
        |  SELECT doc_id, x.x AS x, y.y AS y
        |  FROM ids,
        |    UNNEST(generate_series(0, 16 + doc_id % 17 - 1)) AS x(x),
        |    UNNEST(generate_series(0, 16 + doc_id % 13 - 1)) AS y(y))
        |SELECT doc_id,
        |  CAST(16 + doc_id % 17 AS INTEGER) AS width,
        |  CAST(16 + doc_id % 13 AS INTEGER) AS height,
        |  round(sum((doc_id * 31 + x * 7 + y * 13) % 256)::DOUBLE / count(*), 6) AS mean_r,
        |  round(sum((doc_id * 17 + x * 11 + y * 3) % 256)::DOUBLE / count(*), 6) AS mean_g,
        |  round(sum((doc_id * 7 + x * 5 + y * 19) % 256)::DOUBLE / count(*), 6) AS mean_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ids = Tables.documents(s, d).filter(col("doc_id") < 60).select("doc_id")
      decodeImages(encodeImages(ids))
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id")
    }
  )
}
