package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry codecs shared by every expression: WKB (the storage format —
  * the reference persists WKB bytes in binary columns, never a native
  * geometry type; `engine.py:498-513`, `README.md:400`), WKT, and GeoJSON
  * (shape per `query/geometry.py:17-77`).
  *
  * JTS reader/writer instances are not thread-safe; Spark evaluates
  * expressions on many task threads in one JVM, so each thread gets its own
  * via ThreadLocal (cheap: one instance per executor core, reused across
  * all rows — no per-row allocation).
  */
object GeoIO {
  val SRID = 4326
  val factory = new GeometryFactory(new PrecisionModel(), SRID)

  private val wkbR = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbW = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wktR = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktW = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  private val json = new ObjectMapper()

  def fromWkb(bytes: Array[Byte]): Geometry = wkbR.get.read(bytes)
  def toWkb(g: Geometry): Array[Byte] = wkbW.get.write(g)
  def fromWkt(wkt: String): Geometry = wktR.get.read(wkt)
  def toWkt(g: Geometry): String = wktW.get.write(g)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  def envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.toGeometry(new Envelope(xmin, xmax, ymin, ymax))

  // ---- GeoJSON ----------------------------------------------------------

  def toGeoJson(g: Geometry): String = json.writeValueAsString(geomNode(g))

  private def coordArr(c: Coordinate): ArrayNode = {
    val a = json.createArrayNode(); a.add(c.x); a.add(c.y); a
  }
  private def coordsArr(cs: Array[Coordinate]): ArrayNode = {
    val a = json.createArrayNode(); cs.foreach(c => a.add(coordArr(c))); a
  }
  private def ringsArr(p: Polygon): ArrayNode = {
    val a = json.createArrayNode()
    a.add(coordsArr(p.getExteriorRing.getCoordinates))
    (0 until p.getNumInteriorRing).foreach(i =>
      a.add(coordsArr(p.getInteriorRingN(i).getCoordinates)))
    a
  }
  private def geomNode(g: Geometry): ObjectNode = {
    val o = json.createObjectNode()
    g match {
      case p: Point =>
        o.put("type", "Point"); o.set[ObjectNode]("coordinates", coordArr(p.getCoordinate))
      case l: LineString =>
        o.put("type", "LineString"); o.set[ObjectNode]("coordinates", coordsArr(l.getCoordinates))
      case p: Polygon =>
        o.put("type", "Polygon"); o.set[ObjectNode]("coordinates", ringsArr(p))
      case m: MultiPoint =>
        o.put("type", "MultiPoint")
        val a = json.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(coordArr(m.getGeometryN(i).getCoordinate)))
        o.set[ObjectNode]("coordinates", a)
      case m: MultiLineString =>
        o.put("type", "MultiLineString")
        val a = json.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(coordsArr(m.getGeometryN(i).getCoordinates)))
        o.set[ObjectNode]("coordinates", a)
      case m: MultiPolygon =>
        o.put("type", "MultiPolygon")
        val a = json.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(ringsArr(m.getGeometryN(i).asInstanceOf[Polygon])))
        o.set[ObjectNode]("coordinates", a)
      case gc: GeometryCollection =>
        o.put("type", "GeometryCollection")
        val a = json.createArrayNode()
        (0 until gc.getNumGeometries).foreach(i => a.add(geomNode(gc.getGeometryN(i))))
        o.set[ObjectNode]("geometries", a)
    }
    o
  }

  def fromGeoJson(s: String): Geometry = nodeGeom(json.readTree(s))

  private def nodeCoord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())
  private def nodeCoords(n: JsonNode): Array[Coordinate] = {
    val out = new Array[Coordinate](n.size())
    var i = 0; while (i < n.size()) { out(i) = nodeCoord(n.get(i)); i += 1 }
    out
  }
  private def nodePolygon(rings: JsonNode): Polygon = {
    val shell = factory.createLinearRing(nodeCoords(rings.get(0)))
    val holes = (1 until rings.size()).map(i =>
      factory.createLinearRing(nodeCoords(rings.get(i)))).toArray
    factory.createPolygon(shell, holes)
  }
  def nodeGeom(n: JsonNode): Geometry = n.get("type").asText() match {
    case "Point"      => factory.createPoint(nodeCoord(n.get("coordinates")))
    case "LineString" => factory.createLineString(nodeCoords(n.get("coordinates")))
    case "Polygon"    => nodePolygon(n.get("coordinates"))
    case "MultiPoint" =>
      factory.createMultiPoint(nodeCoords(n.get("coordinates"))
        .map(factory.createPoint))
    case "MultiLineString" =>
      val cs = n.get("coordinates")
      factory.createMultiLineString((0 until cs.size())
        .map(i => factory.createLineString(nodeCoords(cs.get(i)))).toArray)
    case "MultiPolygon" =>
      val cs = n.get("coordinates")
      factory.createMultiPolygon((0 until cs.size())
        .map(i => nodePolygon(cs.get(i))).toArray)
    case "GeometryCollection" =>
      val gs = n.get("geometries")
      factory.createGeometryCollection((0 until gs.size())
        .map(i => nodeGeom(gs.get(i))).toArray)
    case "Feature" => nodeGeom(n.get("geometry"))
    case t => throw new IllegalArgumentException(s"unsupported GeoJSON type: $t")
  }

  // ---- CRS transforms ---------------------------------------------------
  // The reference hardcodes 4326 and never applies outSR (`models.py:69`,
  // unused pyproj util `query/geometry.py:80-102`); we honor it for the
  // web-mercator pair its web clients use, the WGS84 UTM zones
  // (EPSG 32601-32660 north / 32701-32760 south) a desktop GIS client
  // typically requests, and NAD83 UTM 26901-26923 on the GRS80
  // ellipsoid with the EPSG:1188 null datum shift (see [[Utm]]).
  // Datums needing a real grid shift (NAD27 267xx, national grids)
  // stay rejected: honoring those to meter accuracy without grid files
  // would be silently wrong.

  private val R = 6378137.0
  def transform(g: Geometry, from: Int, to: Int): Geometry = {
    if (from == to) return g
    def isUtm(srid: Int) = Utm.isUtm(srid)
    val filter: CoordinateFilter = (from, to) match {
      case (4326, 3857) => c => {
        c.x = R * math.toRadians(c.x)
        c.y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(c.y) / 2))
      }
      case (3857, 4326) => c => {
        c.x = math.toDegrees(c.x / R)
        c.y = math.toDegrees(2 * math.atan(math.exp(c.y / R)) - math.Pi / 2)
      }
      case (4326, utm) if isUtm(utm) => c => {
        val (e, nn) = Utm.forward(c.y, c.x, utm)
        c.x = e; c.y = nn
      }
      case (utm, 4326) if isUtm(utm) => c => {
        val (lat, lon) = Utm.inverse(c.x, c.y, utm)
        c.x = lon; c.y = lat
      }
      case _ => throw new IllegalArgumentException(
        s"st_transform supports 4326<->3857 and 4326<->UTM " +
          s"(EPSG 326xx/327xx WGS84, 269xx NAD83), got $from->$to")
    }
    val out = g.copy()
    out.apply(filter)
    out.geometryChanged()
    out
  }
}

/** Transverse Mercator via the Krueger series in Karney 2011 ("Transverse
  * Mercator with an accuracy of a few nanometers", J. Geod. 85) — the same
  * formulation GeographicLib and proj's `etmerc`/`utm` use — on a
  * PARAMETRIZED ellipsoid (WGS84 and GRS80 share their semi-major axis and
  * differ only in flattening). Third-order terms in n (n ~ 1.68e-3) bound
  * the series truncation error well under a millimeter anywhere inside a
  * UTM zone's extent, far below the 0.1 mm rounding every consumer of this
  * object applies. All closed-form double math: usable inside codegen'd
  * expressions and reproducible verbatim in the DuckDB oracle of the
  * differential gate, unlike a native PROJ binding. */
final class TransverseMercator(invFlattening: Double) {
  private val a = 6378137.0 // semi-major axis shared by WGS84 and GRS80
  private val f = 1.0 / invFlattening
  // series constants are exposed so the differential gate's SQL oracle can
  // inline the EXACT same doubles (Double.toString round-trips exactly)
  val k0 = 0.9996
  private val n = f / (2.0 - f)
  private val n2 = n * n
  private val n3 = n2 * n
  // rectifying radius
  val A = a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
  // forward (alpha), inverse (beta), and footprint-latitude (delta) series
  val a1 = n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0
  val a2 = 13.0 * n2 / 48.0 - 3.0 * n3 / 5.0
  val a3 = 61.0 * n3 / 240.0
  private val b1 = n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0
  private val b2 = n2 / 48.0 + n3 / 15.0
  private val b3 = 17.0 * n3 / 480.0
  private val d1 = 2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3
  private val d2 = 7.0 * n2 / 3.0 - 8.0 * n3 / 5.0
  private val d3 = 56.0 * n3 / 15.0
  val twoSqrtN = 2.0 * math.sqrt(n) / (1.0 + n)

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  /** (easting, northing) in meters for a UTM `zone`, hemisphere by
    * `south` (false northing 10,000,000 m). */
  def forward(latDeg: Double, lonDeg: Double, zone: Int,
      south: Boolean): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dLam = math.toRadians(lonDeg - Utm.centralMeridian(zone))
    val s = math.sin(phi)
    val t = math.sinh(atanh(s) - twoSqrtN * atanh(twoSqrtN * s))
    val xiP = math.atan2(t, math.cos(dLam))
    val etaP = atanh(math.sin(dLam) / math.sqrt(1.0 + t * t))
    val xi = xiP +
      a1 * math.sin(2.0 * xiP) * math.cosh(2.0 * etaP) +
      a2 * math.sin(4.0 * xiP) * math.cosh(4.0 * etaP) +
      a3 * math.sin(6.0 * xiP) * math.cosh(6.0 * etaP)
    val eta = etaP +
      a1 * math.cos(2.0 * xiP) * math.sinh(2.0 * etaP) +
      a2 * math.cos(4.0 * xiP) * math.sinh(4.0 * etaP) +
      a3 * math.cos(6.0 * xiP) * math.sinh(6.0 * etaP)
    val e = 500000.0 + k0 * A * eta
    val nn = (if (south) 10000000.0 else 0.0) + k0 * A * xi
    (e, nn)
  }

  /** (lat, lon) in degrees. */
  def inverse(easting: Double, northing: Double, zone: Int,
      south: Boolean): (Double, Double) = {
    val xi = (northing - (if (south) 10000000.0 else 0.0)) / (k0 * A)
    val eta = (easting - 500000.0) / (k0 * A)
    val xiP = xi -
      b1 * math.sin(2.0 * xi) * math.cosh(2.0 * eta) -
      b2 * math.sin(4.0 * xi) * math.cosh(4.0 * eta) -
      b3 * math.sin(6.0 * xi) * math.cosh(6.0 * eta)
    val etaP = eta -
      b1 * math.cos(2.0 * xi) * math.sinh(2.0 * eta) -
      b2 * math.cos(4.0 * xi) * math.sinh(4.0 * eta) -
      b3 * math.cos(6.0 * xi) * math.sinh(6.0 * eta)
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    val phi = chi +
      d1 * math.sin(2.0 * chi) +
      d2 * math.sin(4.0 * chi) +
      d3 * math.sin(6.0 * chi)
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(phi),
      Utm.centralMeridian(zone) + math.toDegrees(lam))
  }
}

/** UTM SRID dispatch over the two supported ellipsoids.
  *
  * EPSG 326xx/327xx (WGS84 north/south) and 269xx (NAD83, GRS80
  * ellipsoid, northern zones 1-23). The NAD83 ↔ WGS84 DATUM shift is
  * applied as the EPSG:1188 null transformation — the same default PROJ
  * uses without datum grids — so honoring SRID 269xx means projecting
  * with the correct GRS80 flattening while treating the geographic
  * coordinates as datum-identical (physical offset ≲ 2 m in CONUS;
  * grid-based NADCON shifts are out of scope, as they are for any
  * engine without grid files). The reference parses these outSR values
  * and never applies ANY reprojection (query/geometry.py:80-102). */
object Utm {
  /** WGS84 ellipsoid (EPSG:7030) — SRIDs 326xx/327xx. */
  val Wgs84 = new TransverseMercator(298.257223563)
  /** GRS80 ellipsoid (EPSG:7019), the NAD83 ellipsoid — SRIDs 269xx. */
  val Grs80 = new TransverseMercator(298.257222101)

  // WGS84-surface constants, kept at the historical names the SQL-oracle
  // builder and specs inline
  val k0: Double = Wgs84.k0
  val A: Double = Wgs84.A
  val a1: Double = Wgs84.a1
  val a2: Double = Wgs84.a2
  val a3: Double = Wgs84.a3
  val twoSqrtN: Double = Wgs84.twoSqrtN

  def isNad83(srid: Int): Boolean = srid >= 26901 && srid <= 26923
  def isUtm(srid: Int): Boolean =
    (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760) ||
      isNad83(srid)
  private def zoneOf(srid: Int): Int =
    if (isNad83(srid)) srid - 26900 else srid % 100
  private def south(srid: Int): Boolean = srid >= 32701 && srid <= 32760
  private def ellipsoid(srid: Int): TransverseMercator =
    if (isNad83(srid)) Grs80 else Wgs84
  /** Central meridian of a UTM zone, degrees. */
  def centralMeridian(zone: Int): Double = zone * 6.0 - 183.0
  /** EPSG code of the natural WGS84 zone for a lon/lat (for callers
    * picking a zone per feature). */
  def sridFor(lon: Double, lat: Double): Int = {
    val zone = math.min(60, math.max(1, (math.floor((lon + 180.0) / 6.0) + 1).toInt))
    (if (lat < 0) 32700 else 32600) + zone
  }

  /** (easting, northing) in meters. */
  def forward(latDeg: Double, lonDeg: Double, srid: Int): (Double, Double) =
    ellipsoid(srid).forward(latDeg, lonDeg, zoneOf(srid), south(srid))

  /** (lat, lon) in degrees. */
  def inverse(easting: Double, northing: Double, srid: Int): (Double, Double) =
    ellipsoid(srid).inverse(easting, northing, zoneOf(srid), south(srid))
}
