package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted per partition.
  *
  * Image payloads in formats the JDK ships codecs for (PNG/BMP/GIF/JPEG
  * via `javax.imageio`, public JDK API — no new deps) are REALLY decoded:
  * [[decodeImage]] reads pixel dimensions and computes an 8-bin grayscale
  * histogram feature from sampled pixels. Payloads that are not a
  * readable image (and audio/video, for which this container ships no
  * codec) fall back to [[stubDecode]], which derives deterministic
  * pseudo-metadata from the payload bytes. The plumbing — schema
  * contract, binary column handling, partition-batched execution (the
  * Scala analogue of `mapInPandas` batch shape) — is identical either
  * way.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val decodedSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** STUB decode (fallback for non-image payloads): deterministic
    * pseudo-decode from payload bytes, chosen to be SQL-reproducible
    * (oracle-checkable): width/height from byte length, frames from
    * media_id, features from byte prefix. */
  def stubDecode(mediaId: Long, payload: Array[Byte]): (Long, Int, Int, Int, Array[Float]) = {
    val n = if (payload == null) 0L else payload.length.toLong
    val width = (n % 640L).toInt
    val height = (n % 480L).toInt
    val frames = (mediaId % 30L).toInt + 1
    val feat = new Array[Float](8)
    var i = 0
    while (i < 8) {
      feat(i) = if (n == 0) 0f
        else (payload(((i * 7) % n).toInt) & 0xFF) / 255.0f
      i += 1
    }
    (n, width, height, frames, feat)
  }

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG): pixel
    * dimensions + an 8-bin grayscale histogram over a bounded pixel
    * sample (at most ~4096 samples regardless of image size, so decode
    * cost per row is capped). Returns None when the payload is not a
    * readable image — callers fall back to [[stubDecode]]. */
  def decodeImage(payload: Array[Byte]): Option[(Long, Int, Int, Int, Array[Float])] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Float](8)
        val stepX = math.max(1, w / 64); val stepY = math.max(1, h / 64)
        var n = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = (((rgb >> 16) & 0xFF) * 299 +
              ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
            hist((gray * 8) / 256) += 1f
            n += 1; x += stepX
          }
          y += stepY
        }
        var i = 0
        while (i < 8) { hist(i) /= n.toFloat; i += 1 }
        Some((payload.length.toLong, w, h, 1, hist))
      }
    } catch { case _: Exception => None }
  }

  /** Partition-batched decode: iterates each partition in fixed-size
    * batches (mirroring Arrow-batch shape of mapInPandas), emitting the
    * decoded schema. Batch size bounds peak memory per task regardless of
    * payload sizes. Real ImageIO decode where the payload is a readable
    * image, deterministic stub otherwise. */
  def decode(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      // in-memory ImageIO (no temp-file cache) — per-JVM, idempotent
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val payload = row.getAs[Array[Byte]](payloadIdx)
          val (n, w, h, f, feat) =
            decodeImage(payload).getOrElse(stubDecode(id, payload))
          Row.fromSeq(row.toSeq ++ Seq(n, w, h, f, feat))
        }
      }
    }(Encoders.row(StructType(media.schema.fields ++ decodedSchema.fields.drop(3))))
  }

  /** Synthesize a media table from documents (payload = utf-8 bytes of the
    * text) — the test/bench input until real binary assets exist. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      lit("image/stub").as("media_type"),
      encode(col("text"), "utf-8").as("payload"))
}
