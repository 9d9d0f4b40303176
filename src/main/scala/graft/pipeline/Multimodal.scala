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

  /** Aspect-preserving resize to fit within (maxW, maxH), never upscaling:
    * scale = min(maxW/w, maxH/h, 1), out dims = floor(dim * scale)
    * (min 1 when the input dim is positive; 0-dim stubs pass through).
    *
    * Readable images are REALLY resized (AWT bilinear redraw, PNG
    * re-encode); other payloads keep their bytes and only the metadata
    * transform applies — which keeps the stub path closed-form
    * (oracle-checkable). Input must be [[decode]] output (needs
    * width/height). Pure per-row map: no shuffle, scan-side at any scale. */
  def resize(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val payloadIdx = decoded.schema.fieldIndex("payload")
    val wIdx = decoded.schema.fieldIndex("width")
    val hIdx = decoded.schema.fieldIndex("height")
    val outSchema = StructType(decoded.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = false),
      StructField("out_height", IntegerType, nullable = false),
      StructField("out_payload", BinaryType, nullable = true)))
    decoded.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val w = row.getInt(wIdx); val h = row.getInt(hIdx)
        val scale =
          if (w <= 0 || h <= 0) 0.0
          else math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val outW = if (w <= 0) 0 else math.max(1, math.floor(w * scale).toInt)
        val outH = if (h <= 0) 0 else math.max(1, math.floor(h * scale).toInt)
        val outPayload = resizeImage(payload, outW, outH).getOrElse(payload)
        Row.fromSeq(row.toSeq ++ Seq(outW, outH, outPayload))
      }
    }(Encoders.row(outSchema))
  }

  /** Real image resize: decode, bilinear-redraw at (w, h), re-encode PNG.
    * None when the payload is not a readable image — callers keep the
    * original bytes (stub path). */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (payload == null || payload.length == 0 || w <= 0 || h <= 0)
      return scala.None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) scala.None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => scala.None }
  }

  /** Frame sampling: one output row per sampled frame index
    * (0, stride, 2·stride, … < n_frames), with the frame payload cut as
    * an equal byte slice of the source payload (slice k = n_bytes /
    * n_frames — the deterministic stand-in for a real video splitter;
    * a codec would plug in at the slice step). Generator-shaped
    * (flatMap): distributed, no shuffle; output rows per doc are bounded
    * by n_frames / stride. Input must be [[decode]] output. */
  def sampleFrames(decoded: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val idIdx = decoded.schema.fieldIndex("media_id")
    val payloadIdx = decoded.schema.fieldIndex("payload")
    val framesIdx = decoded.schema.fieldIndex("n_frames")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_payload", BinaryType, nullable = true)))
    decoded.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val frames = row.getInt(framesIdx)
        val n = if (payload == null) 0 else payload.length
        val k = if (frames > 0) n / frames else 0
        (0 until frames by stride).iterator.map { f =>
          val slice =
            if (payload == null || k == 0) Array.empty[Byte]
            else java.util.Arrays.copyOfRange(payload, f * k, f * k + k)
          Row(id, f, slice)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Synthesize a media table from documents (payload = utf-8 bytes of the
    * text) — the test/bench input until real binary assets exist. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      lit("image/stub").as("media_type"),
      encode(col("text"), "utf-8").as("payload"))
}
