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

  // ---- CRS: spherical-mercator transform (4326 <-> 3857) ---------------
  // The reference hardcodes 4326 and never applies outSR (`models.py:69`,
  // unused pyproj util `query/geometry.py:80-102`); we honor it for the
  // web-mercator pair, the only CRS pair its web clients use.

  private val R = 6378137.0
  def transform(g: Geometry, from: Int, to: Int): Geometry = {
    if (from == to) return g
    val filter: CoordinateFilter = (from, to) match {
      case (4326, 3857) => c => {
        c.x = R * math.toRadians(c.x)
        c.y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(c.y) / 2))
      }
      case (3857, 4326) => c => {
        c.x = math.toDegrees(c.x / R)
        c.y = math.toDegrees(2 * math.atan(math.exp(c.y / R)) - math.Pi / 2)
      }
      case _ => throw new IllegalArgumentException(
        s"st_transform supports 4326<->3857, got $from->$to")
    }
    val out = g.copy()
    out.apply(filter)
    out.geometryChanged()
    out
  }
}
