package graft.geo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge

/** Column-typed API over the ST_* expressions — `import graft.geo.GeoFunctions._`
  * and use like `org.apache.spark.sql.functions`. */
object GeoFunctions {
  private def c(e: Expression): Column = graftbridge.column(e)
  private def x(col: Column): Expression = graftbridge.expression(col)
  private def agg(a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    c(a.toAggregateExpression())

  // constructors
  def st_point(lon: Column, lat: Column): Column = c(StPoint(x(lon), x(lat)))
  def st_makeenvelope(x0: Column, y0: Column, x1: Column, y1: Column): Column =
    c(StMakeEnvelope(x(x0), x(y0), x(x1), x(y1)))
  def st_geomfromtext(wkt: Column): Column = c(StGeomFromText(x(wkt)))
  def st_geomfromwkt(wkt: Column): Column = st_geomfromtext(wkt)
  def st_geomfromwkb(wkb: Column): Column = c(StGeomFromWKB(x(wkb)))
  def st_geomfromgeojson(gj: Column): Column = c(StGeomFromGeoJson(x(gj)))

  // accessors / measures
  def st_x(g: Column): Column = c(StX(x(g)))
  def st_y(g: Column): Column = c(StY(x(g)))
  def st_xmin(g: Column): Column = c(StXMin(x(g)))
  def st_ymin(g: Column): Column = c(StYMin(x(g)))
  def st_xmax(g: Column): Column = c(StXMax(x(g)))
  def st_ymax(g: Column): Column = c(StYMax(x(g)))
  def st_area(g: Column): Column = c(StArea(x(g)))
  def st_length(g: Column): Column = c(StLength(x(g)))
  def st_npoints(g: Column): Column = c(StNPoints(x(g)))
  def st_geometrytype(g: Column): Column = c(StGeometryType(x(g)))
  def st_isempty(g: Column): Column = c(StIsEmpty(x(g)))
  def st_isvalid(g: Column): Column = c(StIsValid(x(g)))

  // serialization
  def st_astext(g: Column): Column = c(StAsText(x(g)))
  def st_asgeojson(g: Column): Column = c(StAsGeoJson(x(g)))
  // Geometry IS WKB in this engine, so the writer direction is a true
  // identity: the input bytes pass through untouched (an NDR-encoded
  // input stays NDR). Use st_normalize_wkb to parse + re-write into the
  // engine's canonical encoding instead.
  def st_aswkb(g: Column): Column = g
  def st_asbinary(g: Column): Column = g
  def st_normalize_wkb(g: Column): Column = c(StGeomFromWKB(x(g)))

  def st_envelope_bounds(g: Column): Column = c(StEnvelopeBounds(x(g)))

  // unary geometry ops
  def st_centroid(g: Column): Column = c(StCentroid(x(g)))
  def st_envelope(g: Column): Column = c(StEnvelope(x(g)))
  def st_convexhull(g: Column): Column = c(StConvexHull(x(g)))

  // predicates
  def st_intersects(a: Column, b: Column): Column = c(StIntersects(x(a), x(b)))
  def st_contains(a: Column, b: Column): Column = c(StContains(x(a), x(b)))
  def st_within(a: Column, b: Column): Column = c(StWithin(x(a), x(b)))
  def st_dwithin(a: Column, b: Column, d: Column): Column =
    c(StDWithin(x(a), x(b), x(d)))

  // binary ops
  def st_distance(a: Column, b: Column): Column = c(StDistance(x(a), x(b)))
  def st_distance_sphere(a: Column, b: Column): Column =
    c(StDistanceSphere(x(a), x(b)))
  def st_union(a: Column, b: Column): Column = c(StUnion(x(a), x(b)))
  def st_intersection(a: Column, b: Column): Column = c(StIntersection(x(a), x(b)))
  def st_difference(a: Column, b: Column): Column = c(StDifference(x(a), x(b)))
  def st_symdifference(a: Column, b: Column): Column = c(StSymDifference(x(a), x(b)))

  // geometry + scalar
  def st_buffer(g: Column, d: Column): Column = c(StBuffer(x(g), x(d)))
  def st_simplify(g: Column, tol: Column): Column = c(StSimplify(x(g), x(tol)))
  def st_simplify_dp(g: Column, tol: Column): Column =
    c(StSimplify(x(g), x(tol), preserveTopology = false))
  def st_transform(g: Column, from: Column, to: Column): Column =
    c(StTransform(x(g), x(from), x(to)))

  // arrays
  def st_collect(arr: Column): Column = c(StCollect(x(arr)))

  // aggregates
  def st_union_aggr(g: Column): Column = agg(StUnionAggr(x(g)))
  def st_envelope_aggr(g: Column): Column = agg(StEnvelopeAggr(x(g)))
  def st_extent(g: Column): Column = st_envelope_aggr(g)
}

/** SQL registration so `spark.sql("SELECT st_area(geom) ...")` works — the
  * reference's free-form SQL surface (MCP server / notebooks) maps to
  * `spark.sql` with these names installed. */
object GeoRegistry {
  def install(spark: SparkSession): Unit = {
    // spatial theta-joins rewrite to the grid equi-join automatically
    graft.plans.SpatialJoinRule.install(spark)
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")

    f("st_point") { case Seq(a, b) => StPoint(a, b) }
    f("st_makeenvelope") { case Seq(a, b, c2, d) => StMakeEnvelope(a, b, c2, d) }
    f("st_geomfromtext") { case Seq(a) => StGeomFromText(a) }
    f("st_geomfromwkt") { case Seq(a) => StGeomFromText(a) }
    f("st_geomfromwkb") { case Seq(a) => StGeomFromWKB(a) }
    f("st_geomfromgeojson") { case Seq(a) => StGeomFromGeoJson(a) }
    f("st_aswkb") { case Seq(a) => a } // identity: geometry is stored as WKB
    f("st_asbinary") { case Seq(a) => a }
    f("st_normalize_wkb") { case Seq(a) => StGeomFromWKB(a) }
    f("st_x") { case Seq(a) => StX(a) }
    f("st_y") { case Seq(a) => StY(a) }
    f("st_xmin") { case Seq(a) => StXMin(a) }
    f("st_ymin") { case Seq(a) => StYMin(a) }
    f("st_xmax") { case Seq(a) => StXMax(a) }
    f("st_ymax") { case Seq(a) => StYMax(a) }
    f("st_area") { case Seq(a) => StArea(a) }
    f("st_length") { case Seq(a) => StLength(a) }
    f("st_npoints") { case Seq(a) => StNPoints(a) }
    f("st_geometrytype") { case Seq(a) => StGeometryType(a) }
    f("st_isempty") { case Seq(a) => StIsEmpty(a) }
    f("st_isvalid") { case Seq(a) => StIsValid(a) }
    f("st_astext") { case Seq(a) => StAsText(a) }
    f("st_asgeojson") { case Seq(a) => StAsGeoJson(a) }
    f("st_centroid") { case Seq(a) => StCentroid(a) }
    f("st_envelope") { case Seq(a) => StEnvelope(a) }
    f("st_convexhull") { case Seq(a) => StConvexHull(a) }
    f("st_intersects") { case Seq(a, b) => StIntersects(a, b) }
    f("st_contains") { case Seq(a, b) => StContains(a, b) }
    f("st_within") { case Seq(a, b) => StWithin(a, b) }
    f("st_dwithin") { case Seq(a, b, d) => StDWithin(a, b, d) }
    f("st_distance") { case Seq(a, b) => StDistance(a, b) }
    f("st_distance_sphere") { case Seq(a, b) => StDistanceSphere(a, b) }
    f("st_union") {
      case Seq(a, b) => StUnion(a, b)
      case Seq(a) => StUnionAggr(a).toAggregateExpression()
    }
    f("st_intersection") { case Seq(a, b) => StIntersection(a, b) }
    f("st_difference") { case Seq(a, b) => StDifference(a, b) }
    f("st_symdifference") { case Seq(a, b) => StSymDifference(a, b) }
    f("st_union_aggr") { case Seq(a) => StUnionAggr(a).toAggregateExpression() }
    f("st_envelope_aggr") { case Seq(a) => StEnvelopeAggr(a).toAggregateExpression() }
    f("st_extent") { case Seq(a) => StEnvelopeAggr(a).toAggregateExpression() }
    f("st_buffer") { case Seq(a, d) => StBuffer(a, d) }
    f("st_simplify") { case Seq(a, t) => StSimplify(a, t) }
    f("st_transform") { case Seq(a, from, to) => StTransform(a, from, to) }
    f("st_collect") { case Seq(a) => StCollect(a) }
  }
}
