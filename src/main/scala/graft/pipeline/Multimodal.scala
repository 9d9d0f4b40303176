package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step itself is a STUB (this container ships no image/audio
  * codecs): [[stubDecode]] derives deterministic pseudo-metadata and a
  * pseudo-feature vector from the payload bytes. Everything around it —
  * the schema contract, binary column handling, partition-batched
  * execution (the Scala analogue of `mapInPandas` batch shape), and the
  * downstream partitioning — is real and tested; swapping the stub body
  * for an actual codec changes no plumbing.
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

  /** STUB decode: deterministic pseudo-decode from payload bytes.
    * Real implementation would decode image/audio here; the derived values
    * are chosen to be SQL-reproducible (oracle-checkable): width/height
    * from byte length, frames from media_id, features from byte prefix. */
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

  /** Partition-batched decode: iterates each partition in fixed-size
    * batches (mirroring Arrow-batch shape of mapInPandas), emitting the
    * decoded schema. Batch size bounds peak memory per task regardless of
    * payload sizes. */
  def decode(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (n, w, h, f, feat) = stubDecode(
            row.getLong(idIdx), row.getAs[Array[Byte]](payloadIdx))
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
