package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.geo.{GeoIO, GeoFunctions => G}

/** Geometry kernel: codec round-trips (ScalaCheck), scalar semantics against
  * JTS directly, SQL registry, and the two geometric aggregates. */
class GeoSpec extends SparkFunSuite {
  import spark.implicits._

  private def wkbOf(wkt: String): Array[Byte] = GeoIO.toWkb(GeoIO.fromWkt(wkt))

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("WKB/WKT round-trip property (points, boxes, linestrings)") {
    val coord = for {
      x <- Gen.chooseNum(-179.0, 179.0)
      y <- Gen.chooseNum(-89.0, 89.0)
    } yield (x, y)
    val pointWkt = coord.map { case (x, y) => s"POINT ($x $y)" }
    val boxWkt = for {
      (x, y) <- coord; w <- Gen.chooseNum(0.001, 5.0); h <- Gen.chooseNum(0.001, 5.0)
    } yield s"POLYGON (($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"
    val lineWkt = for {
      (x, y) <- coord; (x2, y2) <- coord
    } yield s"LINESTRING ($x $y, $x2 $y2)"
    check(Prop.forAll(Gen.oneOf(pointWkt, boxWkt, lineWkt)) { wkt =>
      val g = GeoIO.fromWkt(wkt)
      GeoIO.fromWkb(GeoIO.toWkb(g)).equalsExact(g)
    })
  }

  test("GeoJSON round-trip for every geometry type") {
    val wkts = Seq(
      "POINT (1 2)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((0 0), (1 1))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { wkt =>
      val g = GeoIO.fromWkt(wkt)
      assert(GeoIO.fromGeoJson(GeoIO.toGeoJson(g)).equalsExact(g), wkt)
    }
  }

  test("scalar functions match JTS semantics through the DataFrame API") {
    val df = Seq(
      (1L, wkbOf("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")),
      (2L, wkbOf("POINT (2 1)"))
    ).toDF("id", "geom")
    val r = df.select(
      col("id"), G.st_area(col("geom")).as("area"),
      G.st_xmin(col("geom")).as("xmin"), G.st_xmax(col("geom")).as("xmax"),
      G.st_geometrytype(col("geom")).as("gt"),
      G.st_astext(G.st_centroid(col("geom"))).as("centroid"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) === 12.0)
    assert(r(0).getDouble(2) === 0.0 && r(0).getDouble(3) === 4.0)
    assert(r(0).getString(4) === "Polygon")
    assert(r(0).getString(5) === "POINT (2 1.5)")
    assert(r(1).getDouble(1) === 0.0)
    assert(r(1).getString(4) === "Point")
  }

  test("predicates: within / contains / intersects / dwithin") {
    val box = wkbOf("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val df = Seq(
      ("in", wkbOf("POINT (5 5)")),
      ("out", wkbOf("POINT (20 20)")),
      ("edge", wkbOf("POINT (10 5)"))
    ).toDF("name", "pt").withColumn("box", lit(box))
    val got = df.select(col("name"),
      G.st_within(col("pt"), col("box")).as("within"),
      G.st_contains(col("box"), col("pt")).as("contains"),
      G.st_intersects(col("pt"), col("box")).as("intersects"),
      G.st_dwithin(col("pt"), col("box"), lit(1.0)).as("near"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("in").getBoolean(1) && got("in").getBoolean(2) && got("in").getBoolean(3))
    assert(!got("out").getBoolean(1) && !got("out").getBoolean(3) && !got("out").getBoolean(4))
    // boundary point: intersects but not within (JTS/OGC semantics)
    assert(!got("edge").getBoolean(1) && got("edge").getBoolean(3))
  }

  test("SQL registry: same functions usable via spark.sql") {
    graft.geo.GeoRegistry.install(spark)
    val r = spark.sql(
      """SELECT st_area(st_makeenvelope(0.0d, 0.0d, 2.0d, 3.0d)) AS a,
                st_astext(st_point(1.0d, 2.0d)) AS p,
                st_distance(st_point(0.0d, 0.0d), st_point(3.0d, 4.0d)) AS d,
                st_x(st_geomfromtext('POINT (7 8)')) AS x
      """).collect()(0)
    assert(r.getDouble(0) === 6.0)
    assert(r.getString(1) === "POINT (1 2)")
    assert(r.getDouble(2) === 5.0)
    assert(r.getDouble(3) === 7.0)
  }

  test("st_union_aggr: area of disjoint boxes == sum of areas") {
    val rows = (0 until 100).map { i =>
      val x = (i % 10) * 3.0; val y = (i / 10) * 3.0
      (i.toLong, wkbOf(s"POLYGON (($x $y, ${x + 1} $y, ${x + 1} ${y + 1}, $x ${y + 1}, $x $y))"))
    }
    val df = rows.toDF("id", "geom")
    val area = df.agg(G.st_area(G.st_union_aggr(col("geom"))).as("a")).collect()(0).getDouble(0)
    assert(math.abs(area - 100.0) < 1e-9)
    // overlapping boxes: union area < sum of areas
    val df2 = Seq((1L, wkbOf("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")),
      (2L, wkbOf("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))).toDF("id", "geom")
    val a2 = df2.agg(G.st_area(G.st_union_aggr(col("geom"))).as("a")).collect()(0).getDouble(0)
    assert(math.abs(a2 - 7.0) < 1e-9)
  }

  test("st_envelope_aggr folds extents; groupBy partial agg works") {
    val df = Seq(
      ("a", wkbOf("POINT (1 2)")), ("a", wkbOf("POINT (5 8)")),
      ("b", wkbOf("POINT (-3 0)"))).toDF("k", "geom")
    val r = df.groupBy("k").agg(
      G.st_xmin(G.st_envelope_aggr(col("geom"))).as("xmin"),
      G.st_ymax(G.st_envelope_aggr(col("geom"))).as("ymax"))
      .orderBy("k").collect()
    assert(r(0).getDouble(1) === 1.0 && r(0).getDouble(2) === 8.0)
    assert(r(1).getDouble(1) === -3.0 && r(1).getDouble(2) === 0.0)
  }

  test("st_transform 4326<->3857 round-trips") {
    val p = GeoIO.fromWkt("POINT (-105.0 39.7)")
    val merc = GeoIO.transform(p, 4326, 3857)
    assert(math.abs(merc.getCoordinate.x - -11688546.53) < 1.0)
    val back = GeoIO.transform(merc, 3857, 4326)
    assert(math.abs(back.getCoordinate.x - -105.0) < 1e-9)
    assert(math.abs(back.getCoordinate.y - 39.7) < 1e-9)
  }

  test("st_transform 4326<->UTM: anchors, round-trip grid, both hemispheres") {
    import graft.geo.Utm
    // exact anchors by construction: the central meridian maps to
    // E=500000 and the equator to N=0 (north) / N=1e7 (south)
    val (e0, n0) = Utm.forward(0.0, 3.0, 32631) // zone 31, CM=3E
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    val (eS, nS) = Utm.forward(0.0, 3.0, 32731)
    assert(math.abs(eS - 500000.0) < 1e-6 && math.abs(nS - 1e7) < 1e-6)
    // published control point (CN Tower, Wikipedia UTM article's running
    // example): 43.642567N 79.387139W -> 17N 630084E 4833439N (+-2 m for
    // the citation's own rounding)
    val (eCn, nCn) = Utm.forward(43.642567, -79.387139, 32617)
    assert(math.abs(eCn - 630084.0) < 2.0, s"easting $eCn")
    assert(math.abs(nCn - 4833439.0) < 2.0, s"northing $nCn")
    // round-trip accuracy across each zone's usable width, both
    // hemispheres; 1e-8 deg ~ 1.1 mm bounds the third-order series
    // truncation (worst observed: 3.3e-9 deg ~ 0.4 mm at |lat| 80)
    for {
      lat <- Seq(-80.0, -45.0, -0.5, 0.5, 27.99, 45.0, 72.0, 84.0)
      dLon <- Seq(-2.9, -1.0, 0.0, 1.4, 2.9)
    } {
      val srid = if (lat < 0) 32713 else 32613
      val lon = Utm.centralMeridian(13) + dLon
      val (e, n) = Utm.forward(lat, lon, srid)
      val (lat2, lon2) = Utm.inverse(e, n, srid)
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat dLon $dLon -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
    }
    // the geometry-level path and zone selection
    val p = GeoIO.fromWkt("POINT (-105.3 39.7)")
    assert(Utm.sridFor(-105.3, 39.7) === 32613)
    // boundary semantics the gate query mirrors (ADVICE r7): lon = 180
    // clamps to zone 60 (not a nonexistent 32661), antimeridian-west to
    // zone 1, and the hemisphere follows the lat sign
    assert(Utm.sridFor(180.0, 10.0) === 32660)
    assert(Utm.sridFor(-180.0, 10.0) === 32601)
    assert(Utm.sridFor(-105.3, -39.7) === 32713)
    // NAD83 UTM (269xx, GRS80 ellipsoid, EPSG:1188 null datum shift):
    // same zone machinery, different flattening. The equator/central-
    // meridian anchor is exact on ANY ellipsoid; the GRS80 projection
    // must differ from WGS84's at double precision (the ellipsoids are
    // distinct) but by well under a millimeter (they differ only in the
    // 7th digit of 1/f).
    assert(Utm.isNad83(26913) && !Utm.isNad83(32613) && Utm.isUtm(26913))
    val (eN0, nN0) = Utm.forward(0.0, -105.0, 26913) // zone 13 CM
    assert(math.abs(eN0 - 500000.0) < 1e-6 && math.abs(nN0) < 1e-6)
    val (eW, nW) = Utm.forward(39.7, -105.3, 32613)
    val (eN, nN) = Utm.forward(39.7, -105.3, 26913)
    assert(eW != eN || nW != nN, "GRS80 must not alias WGS84")
    assert(math.abs(eW - eN) < 1e-3 && math.abs(nW - nN) < 1e-3)
    // round-trip through the geometry-level path
    val pN = GeoIO.fromWkt("POINT (-105.3 39.7)")
    val backN = GeoIO.transform(GeoIO.transform(pN, 4326, 26913), 26913, 4326)
    assert(math.abs(backN.getCoordinate.x - -105.3) < 1e-9)
    assert(math.abs(backN.getCoordinate.y - 39.7) < 1e-9)
    val utm = GeoIO.transform(p, 4326, 32613)
    val back = GeoIO.transform(utm, 32613, 4326)
    assert(math.abs(back.getCoordinate.x - -105.3) < 1e-9)
    assert(math.abs(back.getCoordinate.y - 39.7) < 1e-9)
    // genuinely unsupported datums still rejected (NAD27 needs NADCON
    // grids; NAD83 269xx is now honored — asserted above)
    intercept[IllegalArgumentException](GeoIO.transform(p, 4326, 26713))
  }

  test("st_collect over array + convex hull") {
    val df = Seq((1L, wkbOf("POINT (0 0)")), (1L, wkbOf("POINT (2 0)")),
      (1L, wkbOf("POINT (1 3)"))).toDF("k", "geom")
    val hullArea = df.groupBy("k")
      .agg(collect_list(col("geom")).as("gs"))
      .select(G.st_area(G.st_convexhull(G.st_collect(col("gs")))).as("a"))
      .collect()(0).getDouble(0)
    assert(math.abs(hullArea - 3.0) < 1e-9)
  }

  test("null propagation: null WKB yields null, not a crash") {
    val df = Seq((1L, Option.empty[Array[Byte]]),
      (2L, Some(wkbOf("POINT (1 1)")))).toDF("id", "geom")
    val r = df.select(G.st_area(col("geom")).as("a")).orderBy(col("a").asc_nulls_first).collect()
    assert(r(0).isNullAt(0) && r(1).getDouble(0) === 0.0)
  }

  test("st_aswkb is identity; st_normalize_wkb canonicalizes NDR input") {
    import org.locationtech.jts.io.{WKBWriter, ByteOrderValues}
    val pt = graft.geo.GeoIO.point(-105.25, 39.75)
    // NDR (little-endian) encoding — NOT the engine's canonical order
    val ndr = new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN).write(pt)
    val canonical = graft.geo.GeoIO.toWkb(pt)
    assert(!ndr.sameElements(canonical), "test requires a non-canonical input")
    val df = Seq(Tuple1(ndr)).toDF("geom")
    val Row(aswkb: Array[Byte], norm: Array[Byte], x: Double) = df.select(
      G.st_aswkb(col("geom")),
      G.st_normalize_wkb(col("geom")),
      G.st_x(col("geom"))).collect()(0)
    assert(aswkb.sameElements(ndr), "st_aswkb must pass bytes through untouched")
    assert(norm.sameElements(canonical), "st_normalize_wkb must re-encode")
    assert(x === -105.25) // readers accept either byte order
  }

  test("st_simplify reduces vertices, st_buffer grows area") {
    val line = wkbOf((0 to 100).map(i => s"$i ${if (i % 2 == 0) 0.001 else -0.001}")
      .mkString("LINESTRING (", ", ", ")"))
    val df = Seq(Tuple1(line)).toDF("geom")
    val Row(n0: Int, n1: Int, bufArea: Double) = df.select(
      G.st_npoints(col("geom")),
      G.st_npoints(G.st_simplify(col("geom"), lit(0.01))),
      G.st_area(G.st_buffer(col("geom"), lit(1.0)))).collect()(0)
    assert(n1 < n0)
    assert(bufArea > 100 * 2 * 0.9) // ~length*2*d plus caps
  }

  test("st_distance_sphere: haversine meters, symmetric, planar-divergent") {
    val df = Seq(1).toDF("x")
    def d(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
      df.select(G.st_distance_sphere(
        G.st_point(lit(lon1), lit(lat1)),
        G.st_point(lit(lon2), lit(lat2)))).collect()(0).getDouble(0)
    // 1 degree of latitude on the 6371008.8 m sphere = R*pi/180
    val perDeg = 6371008.8 * math.Pi / 180.0
    assert(math.abs(d(0, 0, 0, 1) - perDeg) < 1e-6)
    // east-west shrinks by cos(latitude) — the planar formula's error
    assert(math.abs(d(0, 60, 1, 60) - perDeg * math.cos(math.toRadians(60)))
      < perDeg * 0.001)
    // symmetric, zero at identity
    assert(d(10, 20, 30, 40) === d(30, 40, 10, 20))
    assert(d(5, 5, 5, 5) === 0.0)
    // antipodal clamp: half circumference, no NaN from asin(>1)
    assert(math.abs(d(0, 0, 180, 0) - 6371008.8 * math.Pi) < 1.0)
  }
}
