package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Det
import graft.joins.SpatialJoin
import graft.geo.{GeoFunctions => G}

/** Differential coverage for the geospatial surface (SURVEY.md §2.2–§2.8):
  * geometry is synthesized deterministically from TPC-H keys ([[GeoSynth]]),
  * computed through the JTS-backed ST_* expressions on the Spark side, and
  * re-derived in closed form (plain arithmetic, no spatial extension) by the
  * DuckDB oracle.
  *
  * Float discipline: per-row coordinate arithmetic is bit-identical across
  * engines; JTS point distance is `Math.hypot` while the oracle uses
  * `sqrt(dx²+dy²)`, so distances are rounded to 6 dp on output and distance
  * thresholds (0.313) are chosen off the 0.005° coordinate lattice so no
  * real distance can sit on the boundary.
  */
object GeoQueries {

  private val distSql =
    "sqrt((lon - cx) * (lon - cx) + (lat - cy) * (lat - cy))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4: extent aggregate via st_xmin/... over synthesized points.
    "geo_extent" -> ((s, d) => {
      GeoSynth.points(s, d).agg(
        min(G.st_xmin(col("geom"))).as("xmin"),
        min(G.st_ymin(col("geom"))).as("ymin"),
        max(G.st_xmax(col("geom"))).as("xmax"),
        max(G.st_ymax(col("geom"))).as("ymax"))
    }),

    // P3/P4: bbox intersect filter (boundary-inclusive, like ST_Intersects).
    "geo_bbox_filter" -> ((s, d) => {
      GeoSynth.points(s, d)
        .filter(G.st_intersects(col("geom"),
          G.st_makeenvelope(lit(-100.0), lit(35.0), lit(-95.0), lit(40.0))))
        .select(col("c_custkey"), col("lon"), col("lat"))
        .orderBy(col("c_custkey"))
    }),

    // P5: spatial-rel filter with a WKT literal and rel=within (strict).
    "geo_within_wkt" -> ((s, d) => {
      GeoSynth.points(s, d)
        .filter(G.st_within(col("geom"), G.st_geomfromtext(
          lit("POLYGON ((-110 30, -90 30, -90 45, -110 45, -110 30))"))))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    }),

    // O3: top-k by distance (TakeOrderedAndProject under the hood).
    "geo_distance_topk" -> ((s, d) => {
      val q = G.st_point(lit(-100.0), lit(35.0))
      GeoSynth.points(s, d)
        .withColumn("dist", Det.r(G.st_distance(col("geom"), q), 6))
        .select(col("c_custkey"), col("dist"))
        .orderBy(col("dist"), col("c_custkey"))
        .limit(20)
    }),

    // Geodesic top-k (st_distance_sphere, round-15 verdict #7): the
    // haversine twin of geo_distance_topk — great-circle METERS instead
    // of the cookbook's planar degree distance; full hash oracle (the
    // closed-form haversine replays in SQL op-for-op, mm rounding).
    "geo_distance_sphere" -> ((s, d) => {
      val q = G.st_point(lit(-100.0), lit(35.0))
      GeoSynth.points(s, d)
        .withColumn("dist_m", Det.r(G.st_distance_sphere(col("geom"), q), 3))
        .select(col("c_custkey"), col("dist_m"))
        .orderBy(col("dist_m"), col("c_custkey"))
        .limit(20)
    }),

    // Planar-vs-geodesic ranking divergence: the two top-20 lists rank
    // by rank — `same=false` rows are exactly where the ×111.32 km
    // planar approximation re-orders neighbours (it understates
    // east-west distance by cos(latitude), so ties at different
    // latitudes flip). Both lists replay in SQL → full hash oracle.
    "geo_distance_divergence" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = G.st_point(lit(-100.0), lit(35.0))
      val w = Window.orderBy(col("dist"), col("c_custkey"))
      def top(dist: org.apache.spark.sql.Column, as: String): DataFrame =
        GeoSynth.points(s, d)
          .withColumn("dist", dist)
          .select(col("c_custkey"), col("dist"))
          .orderBy(col("dist"), col("c_custkey")).limit(20)
          .withColumn("rank", row_number().over(w))
          .select(col("rank"), col("c_custkey").as(as))
      top(Det.r(G.st_distance(col("geom"), q), 6), "planar_id")
        .join(top(Det.r(G.st_distance_sphere(col("geom"), q), 3),
          "sphere_id"), Seq("rank"))
        .withColumn("same", col("planar_id") === col("sphere_id"))
        .orderBy(col("rank"))
    }),

    // A6: grid-binned centroid aggregation (the webmap LOD query).
    "geo_grid_agg" -> ((s, d) => {
      val res = 0.5
      GeoSynth.points(s, d)
        .groupBy(floor(col("lon") / res).cast("long").as("cell_x"),
          floor(col("lat") / res).cast("long").as("cell_y"))
        .agg(count(lit(1)).as("feature_count"))
        .withColumn("cgeom", G.st_point(
          (col("cell_x") + 0.5) * res, (col("cell_y") + 0.5) * res))
        .select(col("cell_x"), col("cell_y"), col("feature_count"),
          G.st_x(col("cgeom")).as("cx"), G.st_y(col("cgeom")).as("cy"))
        .orderBy(col("cell_x"), col("cell_y"))
    }),

    // J1: point-in-polygon join via the grid-partitioned spatial join.
    "geo_pip_join" -> ((s, d) => {
      SpatialJoin.grid(
        GeoSynth.points(s, d), col("geom"),
        GeoSynth.boxes(s, d), col("bgeom"),
        (l, r) => G.st_within(l, r), cellSize = 0.5)
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    }),

    // J1 via the OPTIMIZER RULE: the naive theta-join syntax — which
    // Spark alone would plan as a nested-loop cross join — relies on
    // SpatialJoinRule to become the grid equi-join; the oracle is the
    // same closed-form point-in-box join as geo_pip_join.
    "geo_rule_join" -> ((s, d) => {
      graft.plans.SpatialJoinRule.install(s)
      GeoSynth.points(s, d).join(GeoSynth.boxes(s, d),
        G.st_within(col("geom"), col("bgeom")))
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    }),

    // J5: count points per polygon, zeros included (left-outer shape).
    "geo_pip_count" -> ((s, d) => {
      val joined = SpatialJoin.grid(
        GeoSynth.points(s, d), col("geom"),
        GeoSynth.boxes(s, d), col("bgeom"),
        (l, r) => G.st_within(l, r), cellSize = 0.5)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_points"))
      GeoSynth.boxes(s, d).select(col("s_suppkey"))
        .join(joined, Seq("s_suppkey"), "left")
        .select(col("s_suppkey"), coalesce(col("n_points"), lit(0L)).as("n_points"))
        .orderBy(col("s_suppkey"))
    }),

    // J4: 1-NN join (broadcast STRtree with deterministic tie-break).
    "geo_knn" -> ((s, d) => {
      val centroids = GeoSynth.boxes(s, d).select(
        col("s_suppkey"),
        ((col("x0") + col("x1")) / 2).as("cx"),
        ((col("y0") + col("y1")) / 2).as("cy"))
        .withColumn("cgeom", G.st_point(col("cx"), col("cy")))
      SpatialJoin.knnBroadcast(
        GeoSynth.points(s, d), "geom", centroids, "cgeom",
        k = 1, tiebreak = "s_suppkey")
        .select(col("c_custkey"), col("s_suppkey"),
          Det.r(col("knn_dist"), 6).as("dist"))
        .orderBy(col("c_custkey"))
    }),

    // J4 at k=3: same broadcast STRtree join, multi-neighbor output.
    "geo_knn3" -> ((s, d) => {
      val centroids = GeoSynth.boxes(s, d).select(
        col("s_suppkey"),
        ((col("x0") + col("x1")) / 2).as("cx"),
        ((col("y0") + col("y1")) / 2).as("cy"))
        .withColumn("cgeom", G.st_point(col("cx"), col("cy")))
      SpatialJoin.knnBroadcast(
        GeoSynth.points(s, d), "geom", centroids, "cgeom",
        k = 3, tiebreak = "s_suppkey")
        .select(col("c_custkey"), col("s_suppkey"),
          Det.r(col("knn_dist"), 6).as("dist"))
        .orderBy(col("c_custkey"), col("dist"), col("s_suppkey"))
    }),

    // J4 scale path: the same 1-NN join through the partitioned grid
    // k-NN (per-cell histogram broadcast + expanding-ring candidates —
    // no collect of right rows, no cross join), hash-matched against the
    // SAME closed-form oracle as geo_knn. This is the variant that
    // survives a right side that doesn't fit the driver.
    "geo_knn_grid" -> ((s, d) => {
      val centroids = GeoSynth.boxes(s, d).select(
        col("s_suppkey"),
        ((col("x0") + col("x1")) / 2).as("cx"),
        ((col("y0") + col("y1")) / 2).as("cy"))
        .withColumn("cgeom", G.st_point(col("cx"), col("cy")))
      SpatialJoin.knnGrid(
        GeoSynth.points(s, d), "c_custkey", "geom", centroids, "cgeom",
        k = 1, tiebreak = "s_suppkey", cellSize = 0.5)
        .select(col("c_custkey"), col("s_suppkey"),
          Det.r(col("knn_dist"), 6).as("dist"))
        .orderBy(col("c_custkey"))
    }),

    // J3: distance (buffer) join via grid join with envelope expansion.
    "geo_dwithin_join" -> ((s, d) => {
      val centroids = GeoSynth.boxes(s, d).select(
        col("s_suppkey"),
        ((col("x0") + col("x1")) / 2).as("cx"),
        ((col("y0") + col("y1")) / 2).as("cy"))
        .withColumn("cgeom", G.st_point(col("cx"), col("cy")))
      SpatialJoin.grid(
        GeoSynth.points(s, d), col("geom"),
        centroids, col("cgeom"),
        (l, r) => G.st_dwithin(l, r, lit(0.313)), cellSize = 0.5, expand = 0.313)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_near"))
        .orderBy(col("s_suppkey"))
    }),

    // A7: geometric union aggregate over disjoint boxes (area check).
    "geo_union_area" -> ((s, d) => {
      val boxes = graft.Tables.supplier(s, d).select(
        col("s_suppkey"), col("s_nationkey"),
        (lit(-120.0) + (col("s_suppkey") % 100) * 1.0).as("x0"),
        (lit(25.0) + ((col("s_suppkey") / 100).cast("long") % 50) * 1.0).as("y0"),
        (lit(0.1) + (col("s_suppkey") % 7) * 0.1).as("w"))
      boxes
        .withColumn("bgeom", G.st_makeenvelope(col("x0"), col("y0"),
          col("x0") + col("w"), col("y0") + col("w")))
        .groupBy(col("s_nationkey"))
        .agg(Det.r(G.st_area(G.st_union_aggr(col("bgeom"))), 4).as("union_area"),
          count(lit(1)).as("n_boxes"))
        .orderBy(col("s_nationkey"))
    }),

    // A8: envelope aggregate per group.
    "geo_envelope_agg" -> ((s, d) => {
      GeoSynth.boxes(s, d)
        .groupBy(col("s_nationkey"))
        .agg(
          G.st_xmin(G.st_envelope_aggr(col("bgeom"))).as("xmin"),
          G.st_ymin(G.st_envelope_aggr(col("bgeom"))).as("ymin"),
          G.st_xmax(G.st_envelope_aggr(col("bgeom"))).as("xmax"),
          G.st_ymax(G.st_envelope_aggr(col("bgeom"))).as("ymax"))
        .orderBy(col("s_nationkey"))
    }),

    // ST_Buffer + ST_Area: JTS buffers a point with 8 segments/quadrant
    // (a regular 32-gon), whose area has the closed form
    // 0.5 * 32 * r^2 * sin(2*pi/32) — the oracle computes exactly that.
    "geo_buffer_area" -> ((s, d) => {
      // top-k BEFORE the buffer: the ORDER BY is on the key, so the
      // gate's 400 output rows are decided by a narrow TakeOrdered and
      // JTS buffers run on 400 rows, not the corpus (at sf1 the
      // buffer-everything plan was 3 s for 400 output rows)
      GeoSynth.points(s, d)
        .orderBy(col("c_custkey")).limit(400)
        .withColumn("r", lit(0.1) + (col("c_custkey") % 5) * 0.1)
        .select(col("c_custkey"),
          Det.r(G.st_area(G.st_buffer(col("geom"), col("r"))), 6).as("buf_area"),
          Det.r(G.st_length(G.st_buffer(col("geom"), col("r"))), 6).as("buf_perim"))
    }),

    // WKT writer/reader round-trip: text out, parse back, coordinates must
    // survive exactly (differential on the codec, not on geometry math).
    "geo_wkt_roundtrip" -> ((s, d) => {
      GeoSynth.points(s, d)
        .orderBy(col("c_custkey")).limit(500) // codec runs on kept rows only
        .withColumn("back", G.st_geomfromtext(G.st_astext(col("geom"))))
        .select(col("c_custkey"),
          G.st_x(col("back")).as("x"), G.st_y(col("back")).as("y"),
          G.st_geometrytype(col("back")).as("gt"))
    }),

    // J2: line-polygon intersect join. Lines synthesized horizontal
    // (y const, x0..x1) so the oracle is an interval-overlap test; JTS
    // st_intersects on the same doubles agrees exactly.
    "geo_line_join" -> ((s, d) => {
      val lines = graft.Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          (lit(-120.0) + (col("o_orderkey") % 190) * 0.25).as("lx0"),
          (lit(25.0) + ((col("o_orderkey") * 7) % 95) * 0.25).as("ly"))
        .withColumn("lx1", col("lx0") + 0.6)
        .withColumn("lgeom", G.st_geomfromtext(
          concat(lit("LINESTRING ("), col("lx0"), lit(" "), col("ly"),
            lit(", "), col("lx1"), lit(" "), col("ly"), lit(")"))))
      SpatialJoin.grid(
        lines, col("lgeom"),
        GeoSynth.boxes(s, d), col("bgeom"),
        (l, r) => G.st_intersects(l, r), cellSize = 0.5)
        .select(col("o_orderkey"), col("s_suppkey"))
        .orderBy(col("o_orderkey"), col("s_suppkey"))
    }),

    // Binary overlay (st_union of two boxes) + st_centroid: union area of a
    // box and its half-width-shifted copy has closed form 2w² - w²/2; the
    // box centroid is the midpoint. Exercises JTS overlay + centroid math.
    "geo_overlay" -> ((s, d) => {
      GeoSynth.boxes(s, d)
        .withColumn("shifted", G.st_makeenvelope(
          col("x0") + (col("x1") - col("x0")) / 2, col("y0"),
          col("x1") + (col("x1") - col("x0")) / 2, col("y1")))
        .select(col("s_suppkey"),
          Det.r(G.st_area(G.st_union(col("bgeom"), col("shifted"))), 6).as("union_area"),
          Det.r(G.st_x(G.st_centroid(col("bgeom"))), 6).as("ctr_x"),
          Det.r(G.st_y(G.st_centroid(col("bgeom"))), 6).as("ctr_y"))
        .orderBy(col("s_suppkey"))
    }),

    // S4/F2 under the gate: points -> GeoJSON FeatureCollection text ->
    // file -> distributed GeoJSON read -> coordinates. Shortest-repr
    // double printing round-trips exactly, so the oracle is the raw
    // coordinates.
    "geojson_roundtrip" -> ((s, d) => {
      val pts = GeoSynth.points(s, d).filter(col("c_custkey") <= 200)
        .withColumn("__oid", col("c_custkey"))
        .select(col("__oid"), col("c_custkey"), col("geom"))
      val rows = pts.orderBy(col("c_custkey")).collect().toSeq
      val fs = graft.engine.FeatureSchema("pts", Some("geom"), Some("Point"),
        4326, Seq.empty, Some("c_custkey"), 10000)
      val json = graft.serializers.JsonSerializers.geoJsonFeatureCollection(
        rows, pts.schema, fs, scala.None)
      val f = java.nio.file.Files.createTempFile("gjrt", ".json")
      java.nio.file.Files.writeString(f, json)
      graft.sources.GeoJsonSource.read(s, f.toString)
        .select(col("c_custkey"),
          G.st_x(col("geometry")).as("x"), G.st_y(col("geometry")).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // S5/S7 under the gate: points -> GeoParquet page (geo footer) ->
    // GeoParquet read -> coordinates.
    "geoparquet_roundtrip" -> ((s, d) => {
      val pts = GeoSynth.points(s, d).filter(col("c_custkey") <= 300)
        .withColumn("__oid", col("c_custkey"))
        .select(col("__oid"), col("c_custkey"), col("geom"))
      val rows = pts.orderBy(col("c_custkey")).collect().toSeq
      val out = java.nio.file.Files.createTempDirectory("gprt").toString +
        "/page.parquet"
      graft.sources.GeoParquetIO.writePage(rows, pts.schema, "geom", out,
        geometryTypes = Seq("Point"))
      graft.sources.GeoParquetIO.read(s, out)
        .select(col("c_custkey"),
          G.st_x(col("geom")).as("x"), G.st_y(col("geom")).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // S7 at scale under the gate: the DISTRIBUTED GeoParquet writer — no
    // driver collect, each task writes its own footer-carrying part file
    // (round-3 verdict #6: the collected page writer stays for API-page
    // parity, but the df-level path is the one that must hold at scale).
    // 10x the page gate's row cap, multi-partition; every part file's
    // geo footer is verified before the distributed read-back.
    "geoparquet_dist" -> ((s, d) => {
      val pts = GeoSynth.points(s, d).filter(col("c_custkey") <= 3000)
        .select(col("c_custkey"), col("geom"))
      val out = java.nio.file.Files.createTempDirectory("gpdist").toString
      graft.sources.GeoParquetIO.writeDistributed(
        pts.repartition(8, col("c_custkey")), "geom", out,
        geometryTypes = Seq("Point"))
      val parts = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      require(parts.nonEmpty, "distributed writer produced no part files")
      parts.foreach { f =>
        require(graft.sources.GeoParquetIO.readGeoMetadata(f.getPath)
          .contains(("geom", "WKB")),
          s"missing/invalid geo footer: ${f.getName}")
      }
      graft.sources.GeoParquetIO.read(s, out)
        .select(col("c_custkey"),
          G.st_x(col("geom")).as("x"), G.st_y(col("geom")).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // F3 at scale under the gate: DISTRIBUTED tiled PBF export (round-6
    // verdict #7) — every partition quantizes + delta-encodes its own
    // tile with the same serialize() the API page path uses (no driver
    // collect), then tiles are decoded back DISTRIBUTED (binaryFile scan
    // + per-tile Transform dequantize) and compared against the
    // closed-form coordinates. Round to 4 dp on both sides: worst-case
    // dequantize error is range/2e8 ≈ 2.5e-7 (< half of 1e-4), and the
    // 0.05° coordinate lattice keeps every value off the rounding
    // boundary.
    "esripbf_dist" -> ((s, d) => {
      import s.implicits._
      val pts = GeoSynth.points(s, d).filter(col("c_custkey") <= 3000)
        .withColumn("__oid", col("c_custkey"))
        .select(col("__oid"), col("geom"))
      val fs = graft.engine.FeatureSchema("pts", Some("geom"), Some("Point"),
        4326, Seq.empty, Some("__oid"), 10000)
      val out = java.nio.file.Files.createTempDirectory("pbftiles").toString
      graft.serializers.EsriPbf.writeTilesDistributed(
        pts.repartition(8, col("__oid")), fs, out)
      val tiles = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.pbf").load(out)
        .select(col("content")).as[Array[Byte]]
      tiles.flatMap(graft.serializers.EsriPbf.decodePointTile)
        .toDF("c_custkey", "x", "y")
        .select(col("c_custkey"),
          Det.r(col("x"), 4).as("x"), Det.r(col("y"), 4).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // LOD simplification under the gate: collinear lines collapse to their
    // 2 endpoints at any tolerance; zigzags with amplitude 1.0 >> tol 0.05
    // keep every vertex (each interior vertex deviates from any containing
    // chord by far more than the tolerance) — so vertex counts have a
    // closed form the oracle recomputes.
    "geo_simplify" -> ((s, d) => {
      val base = graft.Tables.orders(s, d).filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          (col("o_orderkey") % 7 + 3).cast("int").as("npts"),
          (lit(-120.0) + (col("o_orderkey") % 190) * 0.25).as("x0"),
          (lit(25.0) + ((col("o_orderkey") * 3) % 95) * 0.25).as("y0"),
          (col("o_orderkey") % 2 === 0).as("straight"))
      val lines = base.withColumn("geom", G.st_geomfromtext(
        concat(lit("LINESTRING ("),
          concat_ws(", ", transform(sequence(lit(0), col("npts") - 1),
            i => concat(
              (col("x0") + i.cast("double") * 0.1).cast("string"), lit(" "),
              (col("y0") + when(col("straight"), lit(0.0))
                .otherwise((i % 2).cast("double"))).cast("string")))),
          lit(")"))))
      lines.select(col("o_orderkey"),
        G.st_npoints(col("geom")).as("npts_in"),
        G.st_npoints(G.st_simplify(col("geom"), lit(0.05))).as("npts_out"))
        .orderBy(col("o_orderkey"))
    }),

    // Boolean overlay ops (st_intersection/difference/symdifference) on a
    // box vs its half-width-shifted copy — every area has a closed form:
    // intersection (w/2)*h, difference (w/2)*h, symdifference w*h.
    "geo_boolean_ops" -> ((s, d) => {
      GeoSynth.boxes(s, d)
        .withColumn("shifted", G.st_makeenvelope(
          col("x0") + (col("x1") - col("x0")) / 2, col("y0"),
          col("x1") + (col("x1") - col("x0")) / 2, col("y1")))
        .select(col("s_suppkey"),
          Det.r(G.st_area(G.st_intersection(col("bgeom"), col("shifted"))), 6)
            .as("inter_area"),
          Det.r(G.st_area(G.st_difference(col("bgeom"), col("shifted"))), 6)
            .as("diff_area"),
          Det.r(G.st_area(G.st_symdifference(col("bgeom"), col("shifted"))), 6)
            .as("symdiff_area"))
        .orderBy(col("s_suppkey"))
    }),

    // CRS: web-mercator transform (honoring outSR, which the reference
    // parses but never applies — SURVEY §1.4).
    "geo_transform" -> ((s, d) => {
      GeoSynth.points(s, d)
        .orderBy(col("c_custkey")).limit(500) // reproject kept rows only
        .withColumn("merc", G.st_transform(col("geom"), lit(4326), lit(3857)))
        .select(col("c_custkey"),
          Det.r(G.st_x(col("merc")), 4).as("mx"),
          Det.r(G.st_y(col("merc")), 4).as("my"))
    }),

    // UTM reprojection: each point is projected into its NATURAL zone
    // (pts span zones 11-19), E/N rounded to 0.1 mm. The oracle runs the
    // identical Krueger series in SQL (see oracleSql below); the
    // round-trip inverse is ScalaTest-gated (GeoSpec). Zone selection
    // mirrors Utm.sridFor exactly: clamped to [1, 60] (lon = 180 would
    // otherwise yield zone 61 → SRID 32661, which st_transform rejects)
    // and hemisphere picked by lat sign — on the synth layout (lon in
    // [-120, -70], lat > 0) neither branch engages, but the gate can no
    // longer throw if the layout drifts.
    "geo_utm" -> ((s, d) => {
      GeoSynth.points(s, d)
        .orderBy(col("c_custkey")).limit(500) // reproject kept rows only
        .withColumn("zone",
          least(greatest(floor((col("lon") + 180.0) / 6.0) + 1, lit(1)),
            lit(60)).cast("int"))
        .withColumn("utm", G.st_transform(col("geom"), lit(4326),
          (when(col("lat") < 0, lit(32700)).otherwise(lit(32600))
            + col("zone")).cast("int")))
        .select(col("c_custkey"), col("zone").cast("long").as("zone"),
          Det.r(G.st_x(col("utm")), 4).as("e"),
          Det.r(G.st_y(col("utm")), 4).as("n"))
    }),

    // NAD83 UTM reprojection (§1.4, round-7 "missing" #3): the same
    // natural-zone projection on the GRS80 ellipsoid via SRID 269xx
    // (EPSG:1188 null datum shift — geo/GeoIO.scala Utm scaladoc). The
    // oracle runs the identical Krueger series with the GRS80 constants;
    // zones clamp to NAD83's 1-23 northern range (synth pts span 11-19).
    "geo_utm_nad83" -> ((s, d) => {
      GeoSynth.points(s, d)
        .orderBy(col("c_custkey")).limit(500) // reproject kept rows only
        .withColumn("zone",
          least(greatest(floor((col("lon") + 180.0) / 6.0) + 1, lit(1)),
            lit(23)).cast("int"))
        .withColumn("utm", G.st_transform(col("geom"), lit(4326),
          (lit(26900) + col("zone")).cast("int")))
        .select(col("c_custkey"), col("zone").cast("long").as("zone"),
          Det.r(G.st_x(col("utm")), 4).as("e"),
          Det.r(G.st_y(col("utm")), 4).as("n"))
    }))

  private def P = GeoSynth.oraclePrelude

  def oracleSql: Map[String, String] = Map(
    "geo_extent" ->
      s"""$P SELECT min(lon) AS xmin, min(lat) AS ymin,
          max(lon) AS xmax, max(lat) AS ymax FROM pts""",
    "geo_bbox_filter" ->
      s"""$P SELECT c_custkey, lon, lat FROM pts
          WHERE lon >= -100.0 AND lon <= -95.0 AND lat >= 35.0 AND lat <= 40.0
          ORDER BY c_custkey""",
    "geo_within_wkt" ->
      s"""$P SELECT c_nationkey, count(*) AS n FROM pts
          WHERE lon > -110.0 AND lon < -90.0 AND lat > 30.0 AND lat < 45.0
          GROUP BY c_nationkey ORDER BY c_nationkey""",
    "geo_distance_topk" ->
      s"""$P SELECT c_custkey,
          ${Det.rsql("sqrt((lon - (-100.0)) * (lon - (-100.0)) + (lat - 35.0) * (lat - 35.0))", 6)} AS dist
          FROM pts ORDER BY dist, c_custkey LIMIT 20""",
    "geo_distance_sphere" ->
      s"""$P SELECT c_custkey,
          ${Det.rsql(
            "2.0 * 6371008.8 * asin(sqrt(least(1.0, " +
            "sin(radians(35.0 - lat) / 2.0) * sin(radians(35.0 - lat) / 2.0) + " +
            "cos(radians(lat)) * cos(radians(35.0)) * " +
            "sin(radians(-100.0 - lon) / 2.0) * sin(radians(-100.0 - lon) / 2.0))))",
            3)} AS dist_m
          FROM pts ORDER BY dist_m, c_custkey LIMIT 20""",
    "geo_distance_divergence" ->
      s"""$P, pla AS (
            SELECT c_custkey,
              ${Det.rsql("sqrt((lon - (-100.0)) * (lon - (-100.0)) + (lat - 35.0) * (lat - 35.0))", 6)} AS dist
            FROM pts ORDER BY dist, c_custkey LIMIT 20),
          sph AS (
            SELECT c_custkey,
              ${Det.rsql(
                "2.0 * 6371008.8 * asin(sqrt(least(1.0, " +
                "sin(radians(35.0 - lat) / 2.0) * sin(radians(35.0 - lat) / 2.0) + " +
                "cos(radians(lat)) * cos(radians(35.0)) * " +
                "sin(radians(-100.0 - lon) / 2.0) * sin(radians(-100.0 - lon) / 2.0))))",
                3)} AS dist
            FROM pts ORDER BY dist, c_custkey LIMIT 20),
          pr AS (SELECT CAST(row_number() OVER (ORDER BY dist, c_custkey)
              AS INT) AS rank, c_custkey AS planar_id FROM pla),
          sr AS (SELECT CAST(row_number() OVER (ORDER BY dist, c_custkey)
              AS INT) AS rank, c_custkey AS sphere_id FROM sph)
          SELECT pr.rank, planar_id, sphere_id,
            planar_id = sphere_id AS same
          FROM pr JOIN sr USING (rank) ORDER BY rank""",
    "geo_grid_agg" ->
      s"""$P SELECT CAST(floor(lon / 0.5) AS BIGINT) AS cell_x,
          CAST(floor(lat / 0.5) AS BIGINT) AS cell_y,
          count(*) AS feature_count,
          CAST((CAST(floor(lon / 0.5) AS BIGINT) + 0.5) * 0.5 AS DOUBLE)
            AS cx,
          CAST((CAST(floor(lat / 0.5) AS BIGINT) + 0.5) * 0.5 AS DOUBLE)
            AS cy
          FROM pts GROUP BY 1, 2, 4, 5 ORDER BY cell_x, cell_y""",
    "geo_pip_join" ->
      s"""$P SELECT c_custkey, s_suppkey FROM pts JOIN boxes
          ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
          ORDER BY c_custkey, s_suppkey""",
    "geo_rule_join" ->
      s"""$P SELECT c_custkey, s_suppkey FROM pts JOIN boxes
          ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
          ORDER BY c_custkey, s_suppkey""",
    "geo_pip_count" ->
      s"""$P SELECT s_suppkey, count(c_custkey) AS n_points
          FROM boxes LEFT JOIN pts
          ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
          GROUP BY s_suppkey ORDER BY s_suppkey""",
    "geo_knn" ->
      s"""$P, cents AS (
            SELECT s_suppkey, (x0 + x1) / 2 AS cx, (y0 + y1) / 2 AS cy
            FROM boxes)
          SELECT c_custkey, s_suppkey, ${Det.rsql("dist", 6)} AS dist FROM (
            SELECT c_custkey, s_suppkey, $distSql AS dist,
              row_number() OVER (PARTITION BY c_custkey
                ORDER BY $distSql, s_suppkey) AS rn
            FROM pts CROSS JOIN cents) t
          WHERE rn = 1 ORDER BY c_custkey""",
    "geo_knn_grid" ->
      s"""$P, cents AS (
            SELECT s_suppkey, (x0 + x1) / 2 AS cx, (y0 + y1) / 2 AS cy
            FROM boxes)
          SELECT c_custkey, s_suppkey, ${Det.rsql("dist", 6)} AS dist FROM (
            SELECT c_custkey, s_suppkey, $distSql AS dist,
              row_number() OVER (PARTITION BY c_custkey
                ORDER BY $distSql, s_suppkey) AS rn
            FROM pts CROSS JOIN cents) t
          WHERE rn = 1 ORDER BY c_custkey""",
    "geo_knn3" ->
      s"""$P, cents AS (
            SELECT s_suppkey, (x0 + x1) / 2 AS cx, (y0 + y1) / 2 AS cy
            FROM boxes)
          SELECT c_custkey, s_suppkey, ${Det.rsql("dist", 6)} AS dist FROM (
            SELECT c_custkey, s_suppkey, $distSql AS dist,
              row_number() OVER (PARTITION BY c_custkey
                ORDER BY $distSql, s_suppkey) AS rn
            FROM pts CROSS JOIN cents) t
          WHERE rn <= 3 ORDER BY c_custkey, dist, s_suppkey""",
    "geo_dwithin_join" ->
      s"""$P, cents AS (
            SELECT s_suppkey, (x0 + x1) / 2 AS cx, (y0 + y1) / 2 AS cy
            FROM boxes)
          SELECT s_suppkey, count(*) AS n_near
          FROM pts CROSS JOIN cents
          WHERE $distSql <= 0.313
          GROUP BY s_suppkey ORDER BY s_suppkey""",
    "geo_union_area" ->
      """WITH b AS (
           SELECT s_suppkey, s_nationkey,
             (CAST(0.1 AS DOUBLE) + (s_suppkey % 7) * CAST(0.1 AS DOUBLE)) AS w
           FROM supplier)
         SELECT s_nationkey,
           floor((sum(w * w)) * 10000.0 + 0.5) / 10000.0 AS union_area,
           count(*) AS n_boxes
         FROM b GROUP BY s_nationkey ORDER BY s_nationkey""",
    "geo_envelope_agg" ->
      s"""$P SELECT s_nationkey, min(x0) AS xmin, min(y0) AS ymin,
          max(x1) AS xmax, max(y1) AS ymax
          FROM boxes GROUP BY s_nationkey ORDER BY s_nationkey""",
    "geo_buffer_area" ->
      s"""$P SELECT c_custkey,
          ${Det.rsql("0.5 * 32 * (r * r) * sin(2 * pi() / 32)", 6)} AS buf_area,
          ${Det.rsql("32 * 2 * r * sin(pi() / 32)", 6)} AS buf_perim
          FROM (SELECT c_custkey,
            CAST(0.1 AS DOUBLE) + (c_custkey % 5) * CAST(0.1 AS DOUBLE) AS r
            FROM pts)
          ORDER BY c_custkey LIMIT 400""",
    "geo_wkt_roundtrip" ->
      s"""$P SELECT c_custkey, lon AS x, lat AS y, 'Point' AS gt
          FROM pts ORDER BY c_custkey LIMIT 500""",
    "geo_line_join" ->
      s"""$P, lines AS (
            SELECT o_orderkey,
              (CAST(-120.0 AS DOUBLE) + (o_orderkey % 190) * CAST(0.25 AS DOUBLE)) AS lx0,
              (CAST(25.0 AS DOUBLE) + ((o_orderkey * 7) % 95) * CAST(0.25 AS DOUBLE)) AS ly
            FROM orders WHERE o_orderkey < 2000)
          SELECT o_orderkey, s_suppkey
          FROM lines JOIN boxes
            ON ly >= y0 AND ly <= y1 AND lx0 <= x1 AND (lx0 + 0.6) >= x0
          ORDER BY o_orderkey, s_suppkey""",
    "geo_overlay" ->
      s"""$P SELECT s_suppkey,
          ${Det.rsql("2 * (x1 - x0) * (y1 - y0) - ((x1 - x0) / 2) * (y1 - y0)", 6)}
            AS union_area,
          ${Det.rsql("(x0 + x1) / 2", 6)} AS ctr_x,
          ${Det.rsql("(y0 + y1) / 2", 6)} AS ctr_y
          FROM boxes ORDER BY s_suppkey""",
    "geojson_roundtrip" ->
      s"""$P SELECT c_custkey, lon AS x, lat AS y FROM pts
          WHERE c_custkey <= 200 ORDER BY c_custkey""",
    "geoparquet_roundtrip" ->
      s"""$P SELECT c_custkey, lon AS x, lat AS y FROM pts
          WHERE c_custkey <= 300 ORDER BY c_custkey""",
    "geoparquet_dist" ->
      s"""$P SELECT c_custkey, lon AS x, lat AS y FROM pts
          WHERE c_custkey <= 3000 ORDER BY c_custkey""",
    "esripbf_dist" ->
      s"""$P SELECT c_custkey,
          ${Det.rsql("lon", 4)} AS x, ${Det.rsql("lat", 4)} AS y FROM pts
          WHERE c_custkey <= 3000 ORDER BY c_custkey""",
    "geo_simplify" ->
      """SELECT o_orderkey,
          CAST(o_orderkey % 7 + 3 AS INTEGER) AS npts_in,
          CASE WHEN o_orderkey % 2 = 0 THEN 2
               ELSE CAST(o_orderkey % 7 + 3 AS INTEGER) END AS npts_out
          FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
    "geo_boolean_ops" ->
      s"""$P SELECT s_suppkey,
          ${Det.rsql("((x1 - x0) / 2) * (y1 - y0)", 6)} AS inter_area,
          ${Det.rsql("((x1 - x0) / 2) * (y1 - y0)", 6)} AS diff_area,
          ${Det.rsql("(x1 - x0) * (y1 - y0)", 6)} AS symdiff_area
          FROM boxes ORDER BY s_suppkey""",
    "geo_transform" ->
      s"""$P SELECT c_custkey,
          ${Det.rsql("6378137.0 * (lon * pi() / 180.0)", 4)} AS mx,
          ${Det.rsql("6378137.0 * ln(tan(pi() / 4.0 + (lat * pi() / 180.0) / 2.0))", 4)} AS my
          FROM pts ORDER BY c_custkey LIMIT 500""",

    "geo_utm" -> utmOracleSql(graft.geo.Utm.Wgs84, southAware = true,
      zoneMax = 60),
    "geo_utm_nad83" -> utmOracleSql(graft.geo.Utm.Grs80, southAware = false,
      zoneMax = 23))

  /** The forward Krueger series spelled out in DuckDB SQL, parametrized
    * by ellipsoid ([[graft.geo.TransverseMercator]] — WGS84 for 326xx,
    * GRS80 for the NAD83 269xx gate). Constants are interpolated from the
    * instance (Double.toString round-trips exactly, so both sides use
    * bit-identical coefficients); sinh/cosh/atanh are expanded via
    * exp/ln. 0.1 mm rounding absorbs the ~1-ulp divergence between JVM
    * Math.sinh and the exp-based SQL form. `southAware` adds the false
    * northing for lat < 0 (WGS84 only — the NAD83 zones are northern);
    * `zoneMax` clamps the natural zone to the SRID range's extent. */
  private def utmOracleSql(tm: graft.geo.TransverseMercator,
      southAware: Boolean, zoneMax: Int): String = {
    // every interpolated constant is CAST to DOUBLE: DuckDB types bare
    // decimal literals as DECIMAL and overflows multiplying them
    def c(x: Double) = s"CAST($x AS DOUBLE)"
    val tsn = c(tm.twoSqrtN)
    val k0A = s"(${c(tm.k0)} * ${c(tm.A)})"
    val falseNorthing =
      if (southAware) "(CASE WHEN lat < 0 THEN 10000000.0 ELSE 0.0 END) + "
      else ""
    s"""$P, u AS (
          SELECT c_custkey, lat, lat * pi() / 180.0 AS phi,
                 CAST(least(greatest(floor((lon + 180.0) / 6.0) + 1, 1),
                   $zoneMax) AS BIGINT) AS zone,
                 (lon - least(greatest(floor((lon + 180.0) / 6.0) + 1, 1),
                   $zoneMax) * 6.0 + 183.0) * pi() / 180.0 AS dlam
          FROM pts),
        t1 AS (
          SELECT *, 0.5 * ln((1.0 + sin(phi)) / (1.0 - sin(phi)))
                    - $tsn * 0.5 * ln((1.0 + $tsn * sin(phi))
                                      / (1.0 - $tsn * sin(phi))) AS q
          FROM u),
        t2 AS (SELECT *, (exp(q) - exp(-q)) / 2.0 AS t FROM t1),
        t3 AS (
          SELECT *, atan2(t, cos(dlam)) AS xip,
                 0.5 * ln((1.0 + sin(dlam) / sqrt(1.0 + t * t))
                          / (1.0 - sin(dlam) / sqrt(1.0 + t * t))) AS etap
          FROM t2),
        t4 AS (
          SELECT *,
            xip + ${c(tm.a1)} * sin(2.0 * xip) * (exp(2.0 * etap) + exp(-2.0 * etap)) / 2.0
                + ${c(tm.a2)} * sin(4.0 * xip) * (exp(4.0 * etap) + exp(-4.0 * etap)) / 2.0
                + ${c(tm.a3)} * sin(6.0 * xip) * (exp(6.0 * etap) + exp(-6.0 * etap)) / 2.0 AS xi,
            etap + ${c(tm.a1)} * cos(2.0 * xip) * (exp(2.0 * etap) - exp(-2.0 * etap)) / 2.0
                 + ${c(tm.a2)} * cos(4.0 * xip) * (exp(4.0 * etap) - exp(-4.0 * etap)) / 2.0
                 + ${c(tm.a3)} * cos(6.0 * xip) * (exp(6.0 * etap) - exp(-6.0 * etap)) / 2.0 AS eta
          FROM t3)
        SELECT c_custkey, zone,
          ${Det.rsql(s"500000.0 + $k0A * eta", 4)} AS e,
          ${Det.rsql(s"$falseNorthing$k0A * xi", 4)} AS n
        FROM t4 ORDER BY c_custkey LIMIT 500"""
  }
}
