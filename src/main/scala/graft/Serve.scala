package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.{FeatureServer, ServiceMetadata}
import graft.engine._
import graft.serializers.{ArrowIpc, EsriPbf, JsonSerializers}
import graft.sources.GeoParquetIO

/** End-to-end serving demo: the full request cycle every API surface runs —
  * Esri query params -> QueryParams -> QueryEngine -> serializer — printed
  * for one request against synthesized points. `runMain graft.Serve [sfDir]`.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // serving policy (SURVEY §4): FAIR scheduling so RequestGate's pool
      // tags share executor slots across request classes
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.geo.GeoRegistry.install(spark)

    if (args.contains("stream")) { runStream(spark, sfDir); spark.stop(); return }
    if (args.contains("bucket")) {
      // co-located join demo: both sides bucketed by the join key -> the
      // executed plan has no shuffle Exchange on either side
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      joins.Layout.bucketize(Tables.orders(spark, sfDir), "demo_o", "o_orderkey", 8)
      joins.Layout.bucketize(Tables.lineitem(spark, sfDir), "demo_l", "l_orderkey", 8)
      val j = spark.table("demo_l").join(spark.table("demo_o"),
        col("l_orderkey") === col("o_orderkey"))
      println(s"== bucketed join: exchangeInPlan=${
        j.queryExecution.executedPlan.toString.contains("Exchange")} rows=${j.count()}")
      spark.sql("DROP TABLE demo_o"); spark.sql("DROP TABLE demo_l")
      spark.stop(); return
    }
    if (args.contains("dist")) {
      val dir = java.nio.file.Files.createTempDirectory("geopq_dist").toString
      sources.GeoParquetIO.writeDistributed(
        operators.GeoSynth.points(spark, sfDir).repartition(4), "geom", dir)
      println(s"== distributed GeoParquet: $dir -> ${new java.io.File(dir).list().sorted.mkString(", ")}")
      spark.stop(); return
    }

    val df = operators.GeoSynth.points(spark, sfDir)
    val schema = SchemaService.describe(df, "demo.points")
    println(s"== schema: geom=${schema.geometryColumn} type=${schema.geometryType}" +
      s" id=${schema.idField} maxRecords=${schema.maxRecordCount}")
    println(s"== layer metadata: ${ServiceMetadata.layerJson(schema, 0).take(200)}...")

    // the request: bbox + where + order + page, as an ArcGIS client sends it
    val params = FeatureServer.translateQuery(Map(
      "geometry" -> "-120,25,-110,50",
      "where" -> "c_nationkey < 5",
      "outFields" -> "c_custkey,c_nationkey,lat",
      "orderByFields" -> "lat DESC",
      "resultRecordCount" -> "5",
      "f" -> "pbf"), schema)
    // all request execution passes the admission gate (bounded concurrent
    // queries + request-class pool, mirroring the reference's bounded
    // connection pool)
    val gate = new api.RequestGate(maxConcurrent = 4)
    val result = gate.run(spark, "interactive") {
      QueryEngine.query(df, schema, params)
    }
    val rows = result.df.collect().toSeq
    val outSchema = result.df.schema
    // serializers must report the OUTPUT spatial reference (outSR applied)
    val servedSchema = schema.copy(srid = result.srid)
    println(s"== rows=${rows.size} totalCount=${result.count}" +
      s" exceeded=${result.exceededTransferLimit} srid=${result.srid}")

    val geojson = JsonSerializers.geoJsonFeatureCollection(
      rows, outSchema, servedSchema, result.count)
    println(s"== GeoJSON (${geojson.length}B): ${geojson.take(300)}")
    val esri = JsonSerializers.esriFeatureSet(rows, outSchema, servedSchema,
      result.exceededTransferLimit)
    println(s"== EsriJSON (${esri.length}B): ${esri.take(300)}")
    val pbf = EsriPbf.serialize(rows, outSchema, servedSchema,
      result.exceededTransferLimit)
    api.FeatureCaps.checkResponseSize(pbf.length) // O5 response byte cap
    println(s"== PBF: ${pbf.length} bytes")
    val arrow = ArrowIpc.serialize(rows, outSchema)
    println(s"== ArrowIPC: ${arrow.length} bytes")

    // mode=aggregate at low zoom (the webmap's LOD request shape)
    val res = api.Lod.aggregationResolution(5).getOrElse(api.Lod.DefaultResolution)
    val lod = api.Lod.aggregate(df, col("geom"), res).limit(3).collect()
    println(s"== LOD aggregate (zoom 5, res $res): " + lod.map(r =>
      s"${r.getLong(1)} pts").mkString(", "))

    val html = graft.serializers.HtmlRenderer.resultTable(
      rows, outSchema, schema, result.count)
    println(s"== HTML (${html.length}B): ${html.replaceAll("\\s+", " ").take(240)}")

    val out = java.nio.file.Files.createTempDirectory("serve").toString
    GeoParquetIO.writePage(rows, outSchema, "geom", s"$out/page.parquet",
      geometryTypes = Seq("Point"))
    println(s"== GeoParquet page: $out/page.parquet " +
      s"(geo=${GeoParquetIO.readGeoMetadata(s"$out/page.parquet")})")

    // count-only + ids-only short forms
    val countRes = QueryEngine.query(df, schema, params.copy(countOnly = true))
    println(s"== countOnly=${countRes.count.get} " +
      s"pbf=${EsriPbf.serializeCount(countRes.count.get).length}B " +
      s"json=${JsonSerializers.esriCount(countRes.count.get)}")
    spark.stop()
  }

  /** `runMain graft.Serve <sfDir> stream`: drive the event stream — stage
    * the events table as a file stream, run the watermarked tumbling-window
    * aggregation to a memory sink, print progress + sample rows. */
  private def runStream(spark: SparkSession, sfDir: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.events(spark, sfDir).coalesce(2).write.mode("overwrite").parquet(dir)
    val q = streaming.EventStream.windowedCounts(
      streaming.EventStream.source(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("live")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(60000)
    val out = spark.table("live")
    println(s"== stream closed windows: ${out.count()}")
    out.orderBy(col("win_start"), col("event_type")).show(5, truncate = false)
    println(s"== lastProgress: ${Option(q.lastProgress).map(_.numInputRows)}")
  }
}
