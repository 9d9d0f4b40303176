package graft.geo

import org.locationtech.jts.geom.Geometry

/** Static eval helpers for codegen'd ST_* expressions: whole-stage codegen
  * emits direct calls to these (one virtual dispatch, no boxing of the
  * expression tree), keeping geo predicates inside the generated loop
  * instead of breaking the WSCG span the way CodegenFallback does.
  */
object GeoOps {
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeoIO.fromWkb(a).intersects(GeoIO.fromWkb(b))
  def contains(a: Array[Byte], b: Array[Byte]): Boolean =
    GeoIO.fromWkb(a).contains(GeoIO.fromWkb(b))
  def within(a: Array[Byte], b: Array[Byte]): Boolean =
    GeoIO.fromWkb(a).within(GeoIO.fromWkb(b))
  def distance(a: Array[Byte], b: Array[Byte]): Double =
    GeoIO.fromWkb(a).distance(GeoIO.fromWkb(b))

  /** Great-circle (haversine) distance in METERS between two lon/lat
    * geometries, IUGG mean earth radius 6371008.8 m — the geodesic
    * correction the cookbook's planar `×111.32 km` approximation lacks
    * (round-15 verdict #7; the PostGIS `ST_DistanceSphere` semantics).
    * Non-point inputs measure between CENTROIDS (documented narrowing:
    * the reference's distance queries are point-to-point). The formula
    * is written in the exact operation order the DuckDB oracle twin
    * replays (radians → half-angle sines → asin), so both engines walk
    * the same IEEE doubles. */
  def distanceSphere(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeoIO.fromWkb(a).getCentroid.getCoordinate
    val cb = GeoIO.fromWkb(b).getCentroid.getCoordinate
    val phi1 = math.toRadians(ca.y)
    val phi2 = math.toRadians(cb.y)
    val dphi = math.toRadians(cb.y - ca.y)
    val dlmb = math.toRadians(cb.x - ca.x)
    val sp = math.sin(dphi / 2.0)
    val sl = math.sin(dlmb / 2.0)
    val h = sp * sp + math.cos(phi1) * math.cos(phi2) * sl * sl
    2.0 * 6371008.8 * math.asin(math.sqrt(math.min(1.0, h)))
  }
  def dwithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    GeoIO.fromWkb(a).isWithinDistance(GeoIO.fromWkb(b), d)
  def xmin(a: Array[Byte]): Double = GeoIO.fromWkb(a).getEnvelopeInternal.getMinX
  def ymin(a: Array[Byte]): Double = GeoIO.fromWkb(a).getEnvelopeInternal.getMinY
  def xmax(a: Array[Byte]): Double = GeoIO.fromWkb(a).getEnvelopeInternal.getMaxX
  def ymax(a: Array[Byte]): Double = GeoIO.fromWkb(a).getEnvelopeInternal.getMaxY
  def x(a: Array[Byte]): Double = GeoIO.fromWkb(a).getCoordinate.x
  def y(a: Array[Byte]): Double = GeoIO.fromWkb(a).getCoordinate.y
  def area(a: Array[Byte]): Double = GeoIO.fromWkb(a).getArea
  def length(a: Array[Byte]): Double = GeoIO.fromWkb(a).getLength
  def point(x: Double, y: Double): Array[Byte] = GeoIO.toWkb(GeoIO.point(x, y))
  def makeEnvelope(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    GeoIO.toWkb(GeoIO.envelope(x0, y0, x1, y1))
  def fromWkt(wkt: String): Array[Byte] = GeoIO.toWkb(GeoIO.fromWkt(wkt))

  /** One decode -> all four envelope bounds (for the grid-join cell stage,
    * which otherwise decodes the same WKB four times). */
  def envelopeBounds(a: Array[Byte]): Array[Double] = {
    val e = GeoIO.fromWkb(a).getEnvelopeInternal
    Array(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }
}
