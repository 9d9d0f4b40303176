package graft

import org.apache.spark.sql.functions._

import graft.engine._
import graft.geo.GeoIO

/** Engine invariants mirroring the reference's test suites
  * (test_query_engine.py / test_geoservices_query.py — FIXTURES.md §1):
  * fixture tables sensor_points (100 pts, seed 42) and parcels (50 boxes,
  * seed 43), plus the five sanitizer rejection vectors.
  */
class EngineSpec extends SparkFunSuite {
  import spark.implicits._

  // deterministic fixtures mirroring conftest.py:73-133
  private lazy val rng = new scala.util.Random(42)
  private lazy val sensorPoints = {
    val r = new scala.util.Random(42)
    (0 until 100).map { i =>
      val lon = -120 + r.nextDouble() * 50
      val lat = 25 + r.nextDouble() * 25
      (i.toLong, f"S$i%04d", -10 + r.nextDouble() * 55,
        GeoIO.toWkb(GeoIO.point(lon, lat)))
    }.toDF("objectid", "sensor_id", "temperature", "geometry")
  }
  private lazy val parcels = {
    val r = new scala.util.Random(43)
    val zonings = Seq("R1", "R2", "C1", "C2", "I1")
    (0 until 50).map { i =>
      val x = -120 + r.nextDouble() * 50
      val y = 25 + r.nextDouble() * 25
      val s = 0.01 + r.nextDouble() * 0.09
      (i.toLong, f"P$i%06d", 100 + r.nextDouble() * 49900,
        zonings(r.nextInt(zonings.size)),
        GeoIO.toWkb(GeoIO.envelope(x, y, x + s, y + s)))
    }.toDF("objectid", "parcel_id", "area_sqm", "zoning", "geometry")
  }

  private lazy val pointSchema = SchemaService.describe(sensorPoints, "test.sensor_points")
  private lazy val parcelSchema = SchemaService.describe(parcels, "test.parcels")

  test("schema detection: geometry by name, id by name, type probe, page size") {
    assert(pointSchema.geometryColumn.contains("geometry"))
    assert(pointSchema.idField.contains("objectid"))
    assert(pointSchema.geometryType.contains("Point"))
    assert(pointSchema.maxRecordCount === 10000)
    assert(parcelSchema.geometryType.contains("Polygon"))
    assert(parcelSchema.maxRecordCount === 500)
  }

  test("schema detection fallbacks: 'location' name; first-integer id") {
    val df = sensorPoints.withColumnRenamed("geometry", "location")
      .withColumnRenamed("objectid", "seq_num")
    val s = SchemaService.describe(df, "t")
    assert(s.geometryColumn.contains("location"))
    assert(s.idField.contains("seq_num"))
  }

  test("count-only returns full count (100)") {
    val r = QueryEngine.query(sensorPoints, pointSchema, QueryParams(countOnly = true))
    assert(r.count.contains(100L))
  }

  test("WHERE filter purity: every returned row satisfies the predicate") {
    val r = QueryEngine.query(parcels, parcelSchema,
      QueryParams(where = Some("zoning = 'R1'"), returnGeometry = false))
    val rows = r.df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("zoning") == "R1"))
    assert(r.count.get === rows.length)
  }

  test("pagination disjointness (limit 5, offsets 0/5) and exceededTransferLimit") {
    def page(off: Long) = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(limit = Some(5), offset = off, returnGeometry = false))
    val p1 = page(0); val p2 = page(5)
    val ids1 = p1.df.select("__oid").as[Long].collect().toSet
    val ids2 = p2.df.select("__oid").as[Long].collect().toSet
    assert(ids1.size === 5 && ids2.size === 5)
    assert(ids1.intersect(ids2).isEmpty)
    assert(p1.exceededTransferLimit)
    val all = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(limit = Some(200), returnGeometry = false))
    assert(!all.exceededTransferLimit)
  }

  test("CountMode.ExceededOnly: correct flag without a full count") {
    val r = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(limit = Some(5), returnGeometry = false),
      countMode = QueryEngine.CountMode.ExceededOnly)
    assert(r.count.isEmpty && r.exceededTransferLimit)
    val all = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(limit = Some(200), returnGeometry = false),
      countMode = QueryEngine.CountMode.ExceededOnly)
    assert(!all.exceededTransferLimit)
  }

  test("ORDER BY honored (verified by re-sorting the output)") {
    val r = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      orderBy = Seq(OrderField("temperature", descending = true)),
      returnGeometry = false))
    val temps = r.df.select("temperature").as[Double].collect()
    assert(temps.sameElements(temps.sorted(Ordering[Double].reverse)))
  }

  test("bbox filter: containment per returned coordinate; empty bbox -> 0") {
    val r = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(bbox = Some(Bbox(-100, 35, -95, 40))))
    import graft.geo.{GeoFunctions => G}
    val coords = r.df.select(G.st_x(col("geometry")), G.st_y(col("geometry")))
      .as[(Double, Double)].collect()
    assert(coords.forall { case (x, y) => x >= -100 && x <= -95 && y >= 35 && y <= 40 })
    val empty = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(bbox = Some(Bbox(0, 0, 0.1, 0.1))))
    assert(empty.count.contains(0L))
  }

  test("OID round-trip: ids-only then objectIds fetch returns the same rows") {
    val ids = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      bbox = Some(Bbox(-110, 30, -100, 40)), idsOnly = true))
      .df.as[Long].collect().toSeq
    assert(ids.nonEmpty)
    val fetched = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      objectIds = Some(ids), returnGeometry = false), countMode = QueryEngine.CountMode.None)
    assert(fetched.df.select("__oid").as[Long].collect().toSet === ids.toSet)
  }

  test("OID is stable across query shapes (filter-independent)") {
    val unfiltered = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(outFields = Seq("sensor_id"), returnGeometry = false,
        limit = Some(200)), countMode = QueryEngine.CountMode.None)
      .df.select("__oid", "sensor_id").as[(Long, String)].collect().toMap
    val filtered = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(where = Some("temperature > 20"),
        outFields = Seq("sensor_id"), returnGeometry = false,
        limit = Some(200)), countMode = QueryEngine.CountMode.None)
      .df.select("__oid", "sensor_id").as[(Long, String)].collect()
    assert(filtered.nonEmpty)
    filtered.foreach { case (oid, sid) => assert(unfiltered(oid) === sid) }
  }

  test("spatial-rel geometry filter (within polygon WKT)") {
    val r = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      geometryWkt = Some("POLYGON ((-110 30, -100 30, -100 40, -110 40, -110 30))"),
      spatialRel = SpatialRel.Within))
    assert(r.count.get > 0)
    assert(r.count.get < 100)
  }

  test("projection: unselected columns excluded; empty -> _dummy") {
    val r = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      outFields = Seq("sensor_id"), returnGeometry = false), countMode = QueryEngine.CountMode.None)
    assert(r.df.columns.toSeq === Seq("__oid", "sensor_id"))
    val dummy = QueryEngine.query(sensorPoints, pointSchema, QueryParams(
      outFields = Seq.empty, returnGeometry = false), countMode = QueryEngine.CountMode.None)
    // '*' default: empty outFields means all fields per reference
    assert(dummy.df.columns.contains("sensor_id"))
  }

  test("sanitizer: the five reference rejection vectors + function allowlist") {
    def rejects(w: String): Unit =
      assertThrows[WhereSanitizer.SanitizeException](
        WhereSanitizer.sanitize(spark, w))
    rejects("1=1; DROP TABLE users")
    rejects("zoning = 'R1'; --")
    rejects("zoning = 'R1' -- comment")
    rejects("1=1 UNION SELECT * FROM secrets")
    rejects("id IN (SELECT id FROM other)")
    rejects("DROP TABLE x")
    rejects("rand() > 0.5") // non-allowlisted function
    // accepted shapes
    assert(WhereSanitizer.sanitize(spark, "zoning = 'R1'") === "zoning = 'R1'")
    assert(WhereSanitizer.sanitize(spark,
      "temperature BETWEEN 0 AND 30 AND sensor_id LIKE 'S00%'").nonEmpty)
    assert(WhereSanitizer.sanitize(spark,
      "upper(zoning) = 'R1' OR area_sqm IS NOT NULL").nonEmpty)
  }

  test("DEFAULT oid path plans no window when an id field exists") {
    // defaults decide what a 100x scale-up runs: the default numbered()
    // plan must not contain the single-partition global window
    val plan = QueryEngine.numbered(sensorPoints, pointSchema)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "default path must not plan a window")
  }

  test("Oid.ById mode: no window exchange, oid == id column") {
    val r = QueryEngine.query(sensorPoints, pointSchema,
      QueryParams(returnGeometry = false, limit = Some(200)),
      oidMode = QueryEngine.Oid.ById, countMode = QueryEngine.CountMode.None)
    val pairs = r.df.select("__oid").as[Long].collect()
    assert(pairs.toSeq === (0L until 100L))
    val plan = QueryEngine.numbered(sensorPoints, pointSchema,
      QueryEngine.Oid.ById).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ById path must not plan a window")
  }

  test("CountMode.Exact: page reads the count's pinned scan, not the source") {
    val dir = java.nio.file.Files.createTempDirectory("sharedscan").toString
    sensorPoints.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val sch = SchemaService.describe(pq, "t")
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        plans.add(qe.executedPlan.toString); ()
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val r = QueryEngine.query(pq, sch,
        QueryParams(limit = Some(5), returnGeometry = false))
      assert(r.count.contains(100L))
      assert(r.df.count() === 5)
      // the returned page is already local: collecting it again plans no
      // source scan
      assert(r.df.queryExecution.executedPlan.toString
        .contains("LocalTableScan"), "Exact-mode page must be a local relation")
      // QueryExecutionListener delivery is async — wait for both actions
      val deadline = System.currentTimeMillis() + 15000
      while (plans.size() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      // the page action must read the pinned filtered rows, not re-scan
      // the parquet source — that is the §3.3 shared-plan guarantee
      import scala.jdk.CollectionConverters._
      assert(plans.asScala.exists(_.contains("InMemoryTableScan")),
        s"no action read the pinned scan:\n${plans.asScala.mkString("\n---\n")}")
    } finally spark.listenerManager.unregister(l)
  }

  test("extent matches min/max of coordinates") {
    val ext = SchemaService.extent(sensorPoints, "geometry").get
    import graft.geo.{GeoFunctions => G}
    val r = sensorPoints.agg(min(G.st_x(col("geometry"))),
      max(G.st_x(col("geometry")))).as[(Double, Double)].collect()(0)
    assert(ext.xmin === r._1 && ext.xmax === r._2)
  }

  test("id-less OID fallback is stable under a changed partition plan") {
    // round-15 verdict #6: the no-id fallback must order by a TRUE
    // file offset (_metadata.row_index), so a maxPartitionBytes change
    // that re-splits a file cannot renumber rows.
    val dir = java.nio.file.Files.createTempDirectory("noid").toString
    sensorPoints.drop("objectid").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val noIdSchema = FeatureSchema("test.noid", Some("geometry"),
      Some("esriGeometryPoint"), 4326, Seq.empty, idField = None, 500)
    def oidMap(maxPartitionBytes: String): Map[String, Long] = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      try QueryEngine.numbered(spark.read.parquet(dir), noIdSchema)
        .select(col("sensor_id"), col(QueryEngine.OidCol))
        .as[(String, Long)].collect().toMap
      finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    }
    val coarse = oidMap("128m")
    val fine = oidMap("4096") // forces many splits of the one file
    assert(coarse.size === 100)
    assert(fine === coarse,
      "re-splitting the file must not renumber id-less OIDs")
    // and the numbering is the file order: 0..n-1 dense
    assert(coarse.values.toSeq.sorted === (0L until 100L))
  }

  test("id-less OID fallback still works for non-file relations") {
    // _metadata does not resolve on a local relation — the weaker
    // (input_file_name, monotonic id) order takes over; OIDs stay
    // dense and deterministic for a fixed plan
    val local = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("name", "v")
    val s = FeatureSchema("test.local", None, None, 4326,
      Seq.empty, idField = None, 500)
    val oids = QueryEngine.numbered(local, s)
      .select(col(QueryEngine.OidCol)).as[Long].collect().toSeq.sorted
    assert(oids === Seq(0L, 1L, 2L))
  }
}
