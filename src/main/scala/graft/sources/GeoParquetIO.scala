package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Bbox
import graft.geo.{GeoFunctions => G, GeoIO}

/** GeoParquet source/sink (S5/S7, api/main.py:455-480, 517-533, 853-899).
  *
  * Sink: Spark's parquet writer has no per-file custom-footer hook (SURVEY
  * §7), so the response-sized single-file path uses parquet-hadoop's
  * Example API with `withExtraMetaData` to stamp the `geo` key; the
  * geometry column is ordered first (api/main.py:453-455). Multi-file
  * distributed exports write with Spark then use [[geoMetadataJson]] per
  * the same contract.
  *
  * Source: reads the `geo` footer key to find the primary geometry column
  * and encoding; normalizes WKT-encoded geometry columns to WKB.
  */
object GeoParquetIO {
  private val mapper = new ObjectMapper()

  def geoMetadataJson(geomCol: String, geometryTypes: Seq[String],
      bbox: Option[Bbox]): String = {
    val root = mapper.createObjectNode()
    root.put("version", "1.1.0")
    root.put("primary_column", geomCol)
    val cols = mapper.createObjectNode()
    val colMeta = mapper.createObjectNode()
    colMeta.put("encoding", "WKB")
    val types = mapper.createArrayNode()
    geometryTypes.foreach(types.add)
    colMeta.set[ObjectNode]("geometry_types", types)
    bbox.foreach { b =>
      val arr = mapper.createArrayNode()
      arr.add(b.xmin); arr.add(b.ymin); arr.add(b.xmax); arr.add(b.ymax)
      colMeta.set[ObjectNode]("bbox", arr)
    }
    cols.set[ObjectNode](geomCol, colMeta)
    root.set[ObjectNode]("columns", cols)
    mapper.writeValueAsString(root)
  }

  private def parquetType(f: StructField): PrimitiveType = {
    val b = f.dataType match {
      case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
      case StringType => Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType())
      case IntegerType => Types.optional(PrimitiveTypeName.INT32)
      case LongType => Types.optional(PrimitiveTypeName.INT64)
      case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
      case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
      case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
      case _: TimestampType => Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
    b.named(f.name)
  }

  /** Write a response-sized page as one GeoParquet file, geometry column
    * first, `geo` footer metadata set. */
  def writePage(rows: Seq[Row], schema: StructType, geomCol: String,
      outPath: String, geometryTypes: Seq[String] = Seq("Point"),
      bbox: Option[Bbox] = None): Unit =
    writePageWithMeta(rows.iterator, schema, geomCol, outPath,
      geoMetadataJson(geomCol, geometryTypes, bbox))

  /** Page write for a possibly non-spatial result (the HTTP features
    * route with `skipGeometry`): with a geometry column it is a full
    * GeoParquet page; without one it is plain parquet, no `geo` footer. */
  def writePageOpt(rows: Seq[Row], schema: StructType,
      geomCol: Option[String], outPath: String,
      geometryTypes: Seq[String] = Seq("Point"),
      bbox: Option[Bbox] = None): Unit = geomCol match {
    case Some(g) => writePage(rows, schema, g, outPath, geometryTypes, bbox)
    case None => writePageWithMeta(rows.iterator, schema, "", outPath, null)
  }

  /** Distributed GeoParquet export: every partition writes its own
    * `part-NNNNN.parquet` with the `geo` footer — the multi-file path for
    * large extracts (Spark's own writer exposes no footer hook, so each
    * task runs the page writer; no driver collect, no shuffle). */
  def writeDistributed(df: DataFrame, geomCol: String, outDir: String,
      geometryTypes: Seq[String] = Seq("Point")): Unit = {
    val schema = df.schema
    val meta = geoMetadataJson(geomCol, geometryTypes, None)
    new java.io.File(outDir).mkdirs()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        writePageWithMeta(it, schema, geomCol, f"$outDir/part-$pid%05d.parquet", meta)
      }
    }
  }

  private[sources] def writePageWithMeta(rows: Iterator[Row], schema: StructType,
      geomCol: String, outPath: String, metaJson: String): Unit = {
    val reordered = StructType(
      schema.fields.filter(_.name == geomCol) ++
        schema.fields.filterNot(_.name == geomCol))
    val msg: MessageType = new MessageType("spark_schema",
      (reordered.fields.map(parquetType).toList: List[org.apache.parquet.schema.Type]).asJava)
    val factory = new SimpleGroupFactory(msg)
    val extra: Map[String, String] =
      if (metaJson == null) Map.empty else Map("geo" -> metaJson)
    val writer = ExampleParquetWriter.builder(new Path(outPath))
      .withConf(new Configuration())
      .withType(msg)
      .withExtraMetaData(extra.asJava)
      .build()
    try {
      val srcIdx = reordered.fields.map(f => schema.fieldIndex(f.name))
      rows.foreach { row =>
        val g = factory.newGroup()
        reordered.fields.zipWithIndex.foreach { case (f, i) =>
          val v = row.get(srcIdx(i))
          if (v != null) f.dataType match {
            case BinaryType => g.add(f.name, Binary.fromConstantByteArray(
              v.asInstanceOf[Array[Byte]]))
            case StringType => g.add(f.name, v.toString)
            case IntegerType => g.add(f.name, v.asInstanceOf[Int])
            case LongType => g.add(f.name, v.asInstanceOf[Long])
            case FloatType => g.add(f.name, v.asInstanceOf[Float])
            case DoubleType => g.add(f.name, v.asInstanceOf[Double])
            case BooleanType => g.add(f.name, v.asInstanceOf[Boolean])
            case _: TimestampType =>
              g.add(f.name, v.asInstanceOf[java.sql.Timestamp].getTime * 1000L)
            case _ => ()
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  /** Read the `geo` footer key of a parquet file (None if absent). */
  def readGeoMetadata(path: String): Option[(String, String)] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), new Configuration()))
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      Option(kv.get("geo")).map { json =>
        val node = mapper.readTree(json)
        val primary = node.get("primary_column").asText()
        val enc = node.path("columns").path(primary).path("encoding")
          .asText("WKB")
        (primary, enc)
      }
    } finally reader.close()
  }

  /** S5: load a GeoParquet file; geometry detected from footer metadata
    * (name-heuristic fallback), WKT encoding normalized to WKB. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val meta = readGeoMetadata(firstFile(path))
    meta match {
      case Some((col0, enc)) if df.columns.contains(col0) =>
        if (enc.equalsIgnoreCase("WKT"))
          df.withColumn(col0, G.st_geomfromtext(col(col0).cast("string")))
        else df
      case _ => df
    }
  }

  private def firstFile(path: String): String = {
    val f = new java.io.File(path)
    if (f.isFile) path
    else f.listFiles().filter(_.getName.endsWith(".parquet")).head.getPath
  }
}
