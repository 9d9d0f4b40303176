package graft

import java.net.{HttpURLConnection, URL, URLEncoder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, element_at, max, min}

import graft.api.{FeatureCaps, FeatureServer, GraftHttpServer, Lod, OgcProvider}
import graft.engine.{QueryEngine, SchemaService}
import graft.geo.{GeoFunctions => G}
import graft.serializers.JsonSerializers
import graft.sources.{GeoParquetIO, ParquetCatalog}

/** HTTP soak main (round-10 verdict directive #4, carried from round 9):
  * drive the engine / features / bbox gate shapes through the BOUND
  * SOCKET at `maxConcurrent = 4`, against a catalog built from
  * `SPARK_GRAFT_SF_DIR`-scale data, and time the identical in-process
  * composition alongside — the soak's claim is that the HTTP layer adds
  * routing + serialization + socket, nothing else, so the wire totals
  * must sit within ~1.2x of the in-process totals with zero 500s.
  *
  * Probes (min-of-2 each, warm path — the bench protocol):
  *  - `esri_page`    Esri query: bbox ∧ WHERE ∧ order ∧ page ∧ projection
  *                   (engine_page's shape) → f=json FeatureSet
  *  - `esri_count`   returnCountOnly short form (engine_count's shape)
  *  - `esri_pbf`     same page as `esri_page`, PBF serializer
  *  - `ogc_parquet`  OGC items default GeoParquet page, limit=10000 —
  *                   "one parquet-response page" at soak scale
  *  - `ogc_aggregate` mode=aggregate zoom=6 — "one aggregate-mode page"
  *  - `bbox_table` / `bbox_ns`  extent fold routes
  *
  * Then the CONCURRENT leg: `threads` (default 8, i.e. 2x the gate)
  * client threads each run the full probe set against the live port;
  * every response must be 200 (the gate queues, never errors).
  *
  * Round-12 additions (round-11 verdict #6/#7):
  *  - `upload`  one multipart round-trip over the wire — a served
  *              parquet page POSTs into a new table (200), re-POSTs
  *              without append (409), appends (200), and the doubled
  *              table serves back — the S6 write path under the same
  *              soak harness as the read paths
  *  - `events`  an SSE subscriber connected BEFORE the concurrent leg
  *              receives a `layer_ready` diff pushed MID-SOAK (the
  *              catalog change lands while all `threads` clients are
  *              hammering the gate)
  *  - `keyset`  the documented 100 TB pagination path over the wire:
  *              a full keyset walk (`__oid > last` + ORDER BY __oid,
  *              the Esri route) across a WHERE-bounded slice, asserting
  *              page disjointness + completeness against
  *              returnCountOnly, with per-page seconds recorded — flat
  *              in page index where OFFSET paging would grow linearly
  *
  * Output is one JSON artifact (arg 2, default `soak_http.json`):
  * per-probe http/in-process seconds + ratio, totals, the concurrent
  * wall/error counts, the upload/events/keyset sections, and
  * `validated` = (total ratio <= 1.2 && zero errors && all sections ok).
  *
  * Usage: `runMain graft.HttpSoak [sfDir] [outJson] [threads]`
  */
object HttpSoak {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val outPath = args.lift(1).getOrElse("soak_http.json")
    val threads = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.geo.GeoRegistry.install(spark)

    val root = java.nio.file.Files.createTempDirectory("httpsoak").toString
    val cat = new ParquetCatalog(spark, root)
    cat.createOrReplace("geo", "points", operators.GeoSynth.points(spark, sfDir))
    val srv = new GraftHttpServer(spark, cat, maxConcurrent = 4, port = 0,
      pollIntervalMillis = 3600000L)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"

    // the catalog copy both legs read (same files, same snapshot cache)
    val df = cat.load("geo", "points")
    val schema = SchemaService.describe(df, "geo.points")

    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    // GET returning the full body (upload round-trip + keyset walk need
    // bytes, not just a count), optional POST with a content type
    def httpBytes(path: String,
        post: Option[(Array[Byte], String)] = None): (Int, Array[Byte]) = {
      val conn = new URL(base + path).openConnection()
        .asInstanceOf[HttpURLConnection]
      post.foreach { case (body, ct) =>
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", ct)
        conn.setFixedLengthStreamingMode(body.length)
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
      }
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = if (is == null) Array.emptyByteArray
      else
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          var r = is.read(buf)
          while (r >= 0) { bos.write(buf, 0, r); r = is.read(buf) }
          bos.toByteArray
        } finally is.close()
      (code, body)
    }
    def http(path: String): (Int, Long) = {
      val conn = new URL(base + path).openConnection()
        .asInstanceOf[HttpURLConnection]
      val code = conn.getResponseCode
      // getErrorStream is null for bodyless error responses — reading it
      // blindly would NPE and mask the status the caller's require() is
      // about to report
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val n = if (is == null) 0L
      else
        try {
          var total = 0L
          val buf = new Array[Byte](64 * 1024)
          var r = is.read(buf)
          while (r >= 0) { total += r; r = is.read(buf) }
          total
        } finally is.close()
      (code, n)
    }

    // ---- probe definitions ---------------------------------------------
    val whereClause = "c_nationkey IN (1, 2, 3, 4, 5)"
    val esriQs = "geometry=-110,30,-80,45&where=" + enc(whereClause) +
      "&outFields=c_custkey,c_nationkey,lat&returnGeometry=false" +
      "&orderByFields=" + enc("lat DESC") + "&resultOffset=10" +
      "&resultRecordCount=50"
    val esriParams = Map(
      "geometry" -> "-110,30,-80,45", "where" -> whereClause,
      "outFields" -> "c_custkey,c_nationkey,lat",
      "returnGeometry" -> "false", "orderByFields" -> "lat DESC",
      "resultOffset" -> "10", "resultRecordCount" -> "50")

    def esriInproc(serialize: Boolean, pbf: Boolean = false): Unit = {
      val qp = FeatureServer.translateQuery(esriParams, schema)
      val r = QueryEngine.query(df, schema, qp)
      val rows = r.df.collect().toSeq
      val served = schema.copy(srid = r.srid)
      if (pbf)
        graft.serializers.EsriPbf.serialize(rows, r.df.schema, served,
          r.exceededTransferLimit)
      else if (serialize)
        JsonSerializers.esriFeatureSet(rows, r.df.schema, served,
          r.exceededTransferLimit)
      ()
    }

    def parquetPageBytes(rows: Seq[org.apache.spark.sql.Row],
        rowSchema: org.apache.spark.sql.types.StructType,
        geomCol: Option[String], geomType: Option[String]): Int = {
      val tmp = java.nio.file.Files.createTempFile("soak-page", ".parquet")
      java.nio.file.Files.delete(tmp)
      try {
        GeoParquetIO.writePageOpt(rows, rowSchema, geomCol, tmp.toString,
          geometryTypes = geomType.toSeq)
        val bytes = java.nio.file.Files.readAllBytes(tmp)
        FeatureCaps.checkResponseSize(bytes.length)
        bytes.length
      } finally {
        java.nio.file.Files.deleteIfExists(tmp)
        java.nio.file.Files.deleteIfExists(
          tmp.resolveSibling("." + tmp.getFileName + ".crc"))
        ()
      }
    }

    val probes: Seq[(String, String, () => Unit)] = Seq(
      ("esri_page", s"/rest/services/geo/FeatureServer/0/query?$esriQs&f=json",
        () => esriInproc(serialize = true)),
      ("esri_count",
        s"/rest/services/geo/FeatureServer/0/query?$esriQs&returnCountOnly=true",
        () => {
          val qp = FeatureServer.translateQuery(esriParams, schema)
          QueryEngine.query(df, schema, qp.copy(countOnly = true)).count.get
          ()
        }),
      ("esri_pbf", s"/rest/services/geo/FeatureServer/0/query?$esriQs&f=pbf",
        () => esriInproc(serialize = true, pbf = true)),
      ("ogc_parquet", "/api/features/geo/points?limit=10000",
        () => {
          val qp = OgcProvider.translateItems(offset = 0,
            limit = FeatureCaps.ogcLimit(Some(10000)), bbox = None,
            propertyFilters = Seq.empty, skipGeometry = false, hits = false)
          val r = QueryEngine.query(df, schema, qp)
          val rows = r.df.collect().toSeq
          parquetPageBytes(rows, r.df.schema,
            schema.geometryColumn.filter(r.df.schema.fieldNames.contains),
            schema.geometryType)
          ()
        }),
      ("ogc_aggregate", "/api/features/geo/points?mode=aggregate&zoom=6",
        () => {
          val res = Lod.aggregationResolution(6).getOrElse(Lod.DefaultResolution)
          val agg = Lod.aggregate(
            QueryEngine.filtered(df, schema, graft.engine.QueryParams()),
            col(schema.geometryColumn.get), res)
            .limit(FeatureCaps.ogcLimit(None))
          val rows = agg.collect().toSeq
          parquetPageBytes(rows, agg.schema, Some("geometry"), Some("Point"))
          ()
        }),
      ("bbox_table", "/api/bbox/geo/points",
        () => {
          df.select(G.st_envelope_bounds(col(schema.geometryColumn.get))
            .as("__b"))
            .agg(min(element_at(col("__b"), 1)).as("xmin"),
              min(element_at(col("__b"), 2)).as("ymin"),
              max(element_at(col("__b"), 3)).as("xmax"),
              max(element_at(col("__b"), 4)).as("ymax"))
            .head()
          ()
        }),
      ("bbox_ns", "/api/bbox/geo",
        () => {
          df.select(G.st_envelope_bounds(col(schema.geometryColumn.get))
            .as("__b"))
            .agg(min(element_at(col("__b"), 1)).as("xmin"),
              min(element_at(col("__b"), 2)).as("ymin"),
              max(element_at(col("__b"), 3)).as("xmax"),
              max(element_at(col("__b"), 4)).as("ymax"))
            .head()
          ()
        }))

    // warm both paths once (JIT, codegen, snapshot cache, socket setup)
    probes.foreach { case (_, path, inproc) =>
      val (code, _) = http(path)
      require(code == 200, s"warmup $path -> $code")
      inproc()
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // ---- sequential timed leg (min-of-3, warm path) --------------------
    // min-of-3, not 2: the fast probes run ~100-200 ms, where one GC or
    // scheduler hiccup on either leg swings a per-probe ratio by ±50%
    val results = probes.map { case (name, path, inproc) =>
      val httpSec = (1 to 3).map(_ => timed {
        val (code, _) = http(path)
        require(code == 200, s"$name -> $code")
      }).min
      val inSec = (1 to 3).map(_ => timed(inproc())).min
      (name, httpSec, inSec)
    }

    // ---- upload round-trip: write -> 409 -> append -> serve ------------
    // (round-11 verdict #6) the S6 write path over the same bound socket:
    // a served parquet page is the upload payload, so the bytes exercised
    // are exactly what the read probes produce.
    val uploadT0 = System.nanoTime()
    val (pageCode, pageBytes) = httpBytes("/api/features/geo/points?limit=5")
    val boundary = "XgraftSoakBoundaryX"
    val mpCt = s"multipart/form-data; boundary=$boundary"
    def multipart(filename: String, bytes: Array[Byte]): Array[Byte] =
      (s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="files"; filename="$filename"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8") ++
        bytes ++ s"\r\n--$boundary--\r\n".getBytes("UTF-8")
    val up = "/api/upload?namespace=soakup&table_name=u1"
    val (c1, _) = httpBytes(up, Some((multipart("page.parquet", pageBytes), mpCt)))
    val (c409, _) = httpBytes(up, Some((multipart("page.parquet", pageBytes), mpCt)))
    val (c2, _) = httpBytes(up + "&append=true",
      Some((multipart("page.parquet", pageBytes), mpCt)))
    val (cServe, served) = httpBytes("/api/features/soakup/u1?f=geojson&limit=100")
    val servedFeatures =
      "\"type\":\"Feature\"".r.findAllMatchIn(new String(served, "UTF-8")).size
    val uploadSec = (System.nanoTime() - uploadT0) / 1e9
    val uploadOk = pageCode == 200 && c1 == 200 && c409 == 409 &&
      c2 == 200 && cServe == 200 && servedFeatures == 10

    // ---- SSE subscriber: connect BEFORE the concurrent leg -------------
    // (round-11 verdict #6) the push channel under load: the catalog diff
    // lands while `threads` clients hammer the gate; the subscriber must
    // still receive the live `layer_ready` event.
    srv.controlPlane.poll() // prime: register everything created above
    val sseGen = srv.controlPlane.configGeneration
    val sseLines = new java.util.concurrent.LinkedBlockingQueue[String]()
    val sseConn = new URL(base + s"/api/events?since=$sseGen&timeoutMs=60000")
      .openConnection().asInstanceOf[HttpURLConnection]
    val sseCode = sseConn.getResponseCode
    val sseReader = new Thread(() => {
      try {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          sseConn.getInputStream, "UTF-8"))
        Iterator.continually(r.readLine()).takeWhile(_ != null)
          .foreach(sseLines.put)
      } catch { case _: java.io.IOException => () }
    })
    sseReader.setDaemon(true)
    sseReader.start()

    // ---- concurrent leg: threads x all probes, gate queues at 4 --------
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val codes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tasks = (1 to threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = probes.foreach { case (_, path, _) =>
          try {
            val (code, _) = http(path)
            codes.add(code)
            if (code >= 500) { errors.incrementAndGet(); () }
          } catch { case _: Throwable => errors.incrementAndGet(); () }
        }
      })
    }
    // the push diff lands MID-SOAK, while the pool is at full depth
    cat.createOrReplace("geo", "pushed", df.limit(3))
    srv.controlPlane.poll()
    tasks.foreach(_.get())
    pool.shutdown()
    val concurrentWall = (System.nanoTime() - t0) / 1e9
    val non200 = {
      import scala.jdk.CollectionConverters._
      codes.asScala.count(_ != 200)
    }

    // harvest the SSE event (sent while the soak ran; bounded wait)
    var sseEventId = -1L
    var sseSawLayerReady = false
    var sseData = ""
    locally {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var ev = ""
      var done = false
      while (!done && System.nanoTime() < deadline) {
        val line = sseLines.poll(1, java.util.concurrent.TimeUnit.SECONDS)
        if (line != null) {
          if (line.startsWith("id: "))
            sseEventId = line.stripPrefix("id: ").toLong
          else if (line.startsWith("event: ")) ev = line.stripPrefix("event: ")
          else if (line.startsWith("data: ")) sseData = line.stripPrefix("data: ")
          else if (line.isEmpty && ev == "layer_ready") {
            sseSawLayerReady = true; done = true
          }
        }
      }
    }
    sseConn.disconnect()
    val sseOk = sseCode == 200 && sseSawLayerReady &&
      sseEventId == sseGen + 1 && sseData.contains("pushed")

    // ---- keyset-paged walk over the wire (round-11 verdict #7) ---------
    // `(WHERE slice) AND __oid > last` + ORDER BY __oid through the Esri
    // route: each page is a pushable range scan + TakeOrdered, so page
    // latency stays flat in page index (OFFSET's grows — it re-sorts and
    // discards the prefix every page). Disjointness falls out of strictly
    // increasing __oid across pages; completeness is checked against
    // returnCountOnly on the same WHERE slice.
    val ksWhere = "c_nationkey IN (1, 2)"
    val ksCount = {
      val (c, b) = httpBytes(
        "/rest/services/geo/FeatureServer/0/query?where=" + enc(ksWhere) +
          "&returnCountOnly=true&f=json")
      if (c != 200) -1L
      else """"count"\s*:\s*(\d+)""".r.findFirstMatchIn(new String(b, "UTF-8"))
        .map(_.group(1).toLong).getOrElse(-1L)
    }
    val OidRe = """"__oid"\s*:\s*(\d+)""".r
    val ksPageSize = 2000
    val ksPageSecs = scala.collection.mutable.ArrayBuffer[Double]()
    var ksRows = 0L
    var ksLast = -1L
    var ksMonotone = true
    var ksHttpOk = true
    var ksDone = false
    while (!ksDone && ksHttpOk && ksPageSecs.length < 1000) {
      val where = s"($ksWhere) AND __oid > $ksLast"
      val p0 = System.nanoTime()
      val (c, b) = httpBytes(
        "/rest/services/geo/FeatureServer/0/query?where=" + enc(where) +
          "&orderByFields=" + enc("__oid ASC") +
          s"&resultRecordCount=$ksPageSize&returnGeometry=false" +
          "&outFields=c_custkey&f=json")
      ksPageSecs += (System.nanoTime() - p0) / 1e9
      if (c != 200) ksHttpOk = false
      else {
        val oids = OidRe.findAllMatchIn(new String(b, "UTF-8"))
          .map(_.group(1).toLong).toSeq
        if (oids.isEmpty) ksDone = true
        else {
          // strictly increasing WITHIN the page and ACROSS pages: pages
          // are disjoint and ordered, no row seen twice
          ksMonotone &&= oids.head > ksLast &&
            oids.sliding(2).forall(w => w.length < 2 || w(0) < w(1))
          ksRows += oids.length
          ksLast = oids.last
        }
      }
    }
    val ksOk = ksHttpOk && ksMonotone && ksCount >= 0 && ksRows == ksCount
    val ksRatio =
      if (ksPageSecs.length >= 4)
        ksPageSecs.takeRight(2).min / math.max(ksPageSecs.take(2).min, 1e-9)
      else 1.0

    // ---- deep-offset keyset steering header (round-18 verdict #7) ------
    // ApiSpec asserts the header unit-level; the soak crosses the
    // deep-offset branch over the wire at scale: a page past 10x the
    // page size must carry X-Pagination-Hint, page 1 must not.
    def httpHintHeader(path: String): (Int, Option[String]) = {
      val conn = new URL(base + path).openConnection()
        .asInstanceOf[HttpURLConnection]
      val code = conn.getResponseCode
      val h = Option(conn.getHeaderField("X-Pagination-Hint"))
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (is != null) try {
        val buf = new Array[Byte](64 * 1024)
        while (is.read(buf) >= 0) ()
      } finally is.close()
      (code, h)
    }
    val hintQs = "/rest/services/geo/FeatureServer/0/query?where=" +
      enc(ksWhere) + "&orderByFields=" + enc("__oid ASC") +
      "&resultRecordCount=100&returnGeometry=false&outFields=c_custkey&f=json"
    val (hintP1C, hintP1) = httpHintHeader(hintQs)
    val (hintDeepC, hintDeep) = httpHintHeader(hintQs + "&resultOffset=2000")
    val hintOk = hintP1C == 200 && hintDeepC == 200 &&
      hintP1.isEmpty && hintDeep.exists(_.contains("keyset"))

    // ---- retrieval stack over the wire (round-16 verdict #8) -----------
    // hybrid lexical+vector fusion, MMR diversification, and the
    // filtered vector path POSTed against a docs⋈embeddings table:
    // asserts 200s, full result counts, and dense ranks at soak scale.
    val searchT0 = System.nanoTime()
    locally {
      import org.apache.spark.sql.functions.col
      cat.createOrReplace("srch", "docs",
        graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .join(graft.Tables.embeddings(spark, sfDir)
            .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id")))
    }
    val qv = (0 until 64).map(i => ((i % 7) + 1).toString).mkString(",")
    def postSearch(qs: String): (Int, String, Double) = {
      val t = System.nanoTime()
      val (c, b) = httpBytes(s"/api/search/srch/docs?$qs",
        Some((Array.emptyByteArray, "application/x-www-form-urlencoded")))
      (c, new String(b, "UTF-8"), (System.nanoTime() - t) / 1e9)
    }
    // per-mode timings (round-18 verdict #5): one aggregate number hid
    // which mode carries the first-hit cost; the filtered-ANN request is
    // issued TWICE — the cold hit may train+store a codebook (scale-
    // dependent), the warm hit must reuse the stored artifact
    // (assign-only), proven by identical ranked ids + the latency pair.
    val (shC, shB, shSec) = postSearch(
      "q=" + enc("spark merge window") + s"&vector=$qv&k=10&depth=50")
    val (smC, smB, smSec) = postSearch("q=" + enc("spark merge window") +
      s"&vector=$qv&k=10&depth=50&mmrLambda=0.7")
    val filteredQs = s"vector=$qv&k=5&where=" + enc("label = 3")
    val (sfC, sfB, sfColdSec) = postSearch(filteredQs)
    val (sfC2, sfB2, sfWarmSec) = postSearch(filteredQs)
    def nResults(b: String) = """"rank":""".r.findAllMatchIn(b).size
    def rankedIds(b: String) = """"id"\s*:\s*(\d+)""".r
      .findAllMatchIn(b).map(_.group(1)).toSeq
    val searchSec = (System.nanoTime() - searchT0) / 1e9
    val searchOk = shC == 200 && smC == 200 && sfC == 200 && sfC2 == 200 &&
      nResults(shB) == 10 && nResults(smB) == 10 && nResults(sfB) == 5 &&
      rankedIds(sfB2) == rankedIds(sfB)

    srv.stop()
    cat.dropNamespace("geo")
    cat.dropNamespace("soakup")
    cat.dropNamespace("srch")

    val httpTotal = results.map(_._2).sum
    val inTotal = results.map(_._3).sum
    val ratio = httpTotal / inTotal
    val validated = ratio <= 1.2 && errors.get() == 0 && non200 == 0 &&
      uploadOk && sseOk && ksOk && searchOk && hintOk
    def f(d: Double) = math.rint(d * 10000) / 10000
    val probeJson = results.map { case (n, h, i) =>
      s""""$n":{"http":${f(h)},"inproc":${f(i)},"ratio":${f(h / i)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"http_soak","sf":"$sfDir","max_concurrent":4,""" +
        s""""probes":$probeJson,"http_total":${f(httpTotal)},""" +
        s""""inproc_total":${f(inTotal)},"ratio":${f(ratio)},""" +
        s""""concurrent":{"threads":$threads,""" +
        s""""requests":${threads * probes.size},"wall":${f(concurrentWall)},""" +
        s""""non_200":$non200,"errors":${errors.get()}},""" +
        s""""upload":{"ok":$uploadOk,"seconds":${f(uploadSec)},""" +
        s""""statuses":[$c1,$c409,$c2],"features_served":$servedFeatures},""" +
        s""""events":{"ok":$sseOk,"event_id":$sseEventId,""" +
        s""""received_mid_soak":$sseSawLayerReady},""" +
        s""""search":{"ok":$searchOk,"seconds":${f(searchSec)},""" +
        s""""mode_seconds":{"hybrid":${f(shSec)},"mmr":${f(smSec)},""" +
        s""""filtered_cold":${f(sfColdSec)},""" +
        s""""filtered_warm":${f(sfWarmSec)}},""" +
        s""""warm_ids_equal_cold":${rankedIds(sfB2) == rankedIds(sfB)},""" +
        s""""statuses":[$shC,$smC,$sfC,$sfC2],"results":[${nResults(shB)},""" +
        s"""${nResults(smB)},${nResults(sfB)},${nResults(sfB2)}]},""" +
        s""""keyset":{"ok":$ksOk,"pages":${ksPageSecs.length},""" +
        s""""rows":$ksRows,"count":$ksCount,""" +
        s""""latency_ratio_last_first":${f(ksRatio)},""" +
        s""""page_seconds":[${ksPageSecs.map(f).mkString(",")}]},""" +
        s""""keyset_hint":{"ok":$hintOk,"statuses":[$hintP1C,$hintDeepC],""" +
        s""""hint_at_page1":${hintP1.isDefined},""" +
        s""""hint_at_depth":${hintDeep.isDefined}},""" +
        s""""validated":$validated}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      json + "\n")
    println("GRAFT_SOAK_JSON")
    println(json)
  }
}
