package graft.geo

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.operation.buffer.BufferOp
import org.locationtech.jts.simplify.{DouglasPeuckerSimplifier, TopologyPreservingSimplifier}

/** Catalyst expressions for the ST_* surface (SURVEY.md §2.8).
  *
  * Design: geometry travels as WKB bytes (`BinaryType`) between expressions —
  * the storage representation, so scans feed expressions with zero
  * conversion. Each expression decodes/encodes at its boundary via JTS.
  * They are `CodegenFallback` (the JTS call dominates; codegen would only
  * inline the dispatch) but remain null-safe, Filter/Project-pushable, and
  * serializable to executors like any built-in.
  */
object geomops {
  @inline def g(v: Any): Geometry = GeoIO.fromWkb(v.asInstanceOf[Array[Byte]])
  @inline def wkb(geom: Geometry): Array[Byte] = GeoIO.toWkb(geom)
  @inline def utf8(s: String): UTF8String = UTF8String.fromString(s)
}
import geomops._

// ---- base shapes ---------------------------------------------------------

abstract class GeoUnaryExpr extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType)
}

/** Binary predicate with real whole-stage codegen: the generated loop
  * calls a static [[GeoOps]] method directly instead of falling back to
  * interpreted eval (CodegenFallback would split the WSCG span at every
  * spatial filter). */
abstract class GeoPredicate extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  protected def opName: String
  protected def test(a: Geometry, b: Geometry): Boolean
  override def nullSafeEval(l: Any, r: Any): Any = test(g(l), g(r))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoOps.$opName($a, $b)")
}

/** Unary double accessor with codegen through [[GeoOps]]. */
abstract class GeoUnaryDouble extends GeoUnaryExpr {
  override def dataType: DataType = DoubleType
  protected def opName: String
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.geo.GeoOps.$opName($c)")
}

// ---- constructors --------------------------------------------------------

case class StPoint(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(x: Any, y: Any): Any =
    wkb(GeoIO.point(x.asInstanceOf[Double], y.asInstanceOf[Double]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoOps.point($a, $b)")
  override def prettyName: String = "st_point"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class StMakeEnvelope(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq.fill(4)(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(x0: Any, y0: Any, x1: Any, y1: Any): Any =
    wkb(GeoIO.envelope(x0.asInstanceOf[Double], y0.asInstanceOf[Double],
      x1.asInstanceOf[Double], y1.asInstanceOf[Double]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.geo.GeoOps.makeEnvelope($a, $b, $c, $d)")
  override def prettyName: String = "st_makeenvelope"
  override protected def withNewChildrenInternal(f: Expression, s2: Expression,
      t: Expression, q: Expression): StMakeEnvelope =
    copy(first = f, second = s2, third = t, fourth = q)
}

case class StGeomFromText(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(GeoIO.fromWkt(v.toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.geo.GeoOps.fromWkt($c.toString())")
  override def prettyName: String = "st_geomfromtext"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class StGeomFromGeoJson(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(GeoIO.fromGeoJson(v.toString))
  override def prettyName: String = "st_geomfromgeojson"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Parse + re-write: validates WKB and normalizes byte order/layout. */
case class StGeomFromWKB(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(g(v))
  override def prettyName: String = "st_geomfromwkb"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// ---- accessors / measures ------------------------------------------------

case class StX(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "x"
  override def nullSafeEval(v: Any): Any = g(v).getCoordinate.x
  override def prettyName: String = "st_x"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StY(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "y"
  override def nullSafeEval(v: Any): Any = g(v).getCoordinate.y
  override def prettyName: String = "st_y"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StXMin(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "xmin"
  override def nullSafeEval(v: Any): Any = g(v).getEnvelopeInternal.getMinX
  override def prettyName: String = "st_xmin"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StYMin(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "ymin"
  override def nullSafeEval(v: Any): Any = g(v).getEnvelopeInternal.getMinY
  override def prettyName: String = "st_ymin"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StXMax(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "xmax"
  override def nullSafeEval(v: Any): Any = g(v).getEnvelopeInternal.getMaxX
  override def prettyName: String = "st_xmax"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StYMax(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "ymax"
  override def nullSafeEval(v: Any): Any = g(v).getEnvelopeInternal.getMaxY
  override def prettyName: String = "st_ymax"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StArea(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "area"
  override def nullSafeEval(v: Any): Any = g(v).getArea
  override def prettyName: String = "st_area"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StLength(child: Expression) extends GeoUnaryDouble {
  override protected def opName: String = "length"
  override def nullSafeEval(v: Any): Any = g(v).getLength
  override def prettyName: String = "st_length"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StNPoints(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = g(v).getNumPoints
  override def prettyName: String = "st_npoints"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StGeometryType(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = utf8(g(v).getGeometryType)
  override def prettyName: String = "st_geometrytype"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StIsEmpty(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = g(v).isEmpty
  override def prettyName: String = "st_isempty"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StIsValid(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = g(v).isValid
  override def prettyName: String = "st_isvalid"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// ---- serialization -------------------------------------------------------

case class StAsText(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = utf8(GeoIO.toWkt(g(v)))
  override def prettyName: String = "st_astext"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StAsGeoJson(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = utf8(GeoIO.toGeoJson(g(v)))
  override def prettyName: String = "st_asgeojson"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// ---- unary geometry -> geometry ------------------------------------------

case class StCentroid(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(g(v).getCentroid)
  override def prettyName: String = "st_centroid"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StEnvelope(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(g(v).getEnvelope)
  override def prettyName: String = "st_envelope"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
case class StConvexHull(child: Expression) extends GeoUnaryExpr {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = wkb(g(v).convexHull())
  override def prettyName: String = "st_convexhull"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// ---- binary predicates ---------------------------------------------------

case class StIntersects(left: Expression, right: Expression) extends GeoPredicate {
  override protected def opName: String = "intersects"
  override protected def test(a: Geometry, b: Geometry): Boolean = a.intersects(b)
  override def prettyName: String = "st_intersects"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StContains(left: Expression, right: Expression) extends GeoPredicate {
  override protected def opName: String = "contains"
  override protected def test(a: Geometry, b: Geometry): Boolean = a.contains(b)
  override def prettyName: String = "st_contains"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StWithin(left: Expression, right: Expression) extends GeoPredicate {
  override protected def opName: String = "within"
  override protected def test(a: Geometry, b: Geometry): Boolean = a.within(b)
  override def prettyName: String = "st_within"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

// ---- binary geometry ops -------------------------------------------------

case class StDistance(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = g(l).distance(g(r))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoOps.distance($a, $b)")
  override def prettyName: String = "st_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
/** Great-circle (haversine) distance in meters — see
  * [[GeoOps.distanceSphere]] for the semantics and determinism pins. */
case class StDistanceSphere(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    graft.geo.GeoOps.distanceSphere(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.geo.GeoOps.distanceSphere($a, $b)")
  override def prettyName: String = "st_distance_sphere"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StUnion(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any = wkb(g(l).union(g(r)))
  override def prettyName: String = "st_union"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StIntersection(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any = wkb(g(l).intersection(g(r)))
  override def prettyName: String = "st_intersection"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StDifference(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any = wkb(g(l).difference(g(r)))
  override def prettyName: String = "st_difference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StSymDifference(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, r: Any): Any = wkb(g(l).symDifference(g(r)))
  override def prettyName: String = "st_symdifference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
case class StDWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    g(a).isWithinDistance(g(b), d.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b, d) => s"graft.geo.GeoOps.dwithin($a, $b, $d)")
  override def prettyName: String = "st_dwithin"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

// ---- geometry + scalar ---------------------------------------------------

case class StBuffer(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, d: Any): Any =
    wkb(BufferOp.bufferOp(g(l), d.asInstanceOf[Double]))
  override def prettyName: String = "st_buffer"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Topology-preserving by default — matches the reference's shapely
  * `simplify(preserve_topology=True)` (`serializers/esri_pbf.py:136-138`). */
case class StSimplify(left: Expression, right: Expression,
    preserveTopology: Boolean = true) extends BinaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(l: Any, d: Any): Any = {
    val tol = d.asInstanceOf[Double]
    val geom = g(l)
    wkb(if (preserveTopology) TopologyPreservingSimplifier.simplify(geom, tol)
        else DouglasPeuckerSimplifier.simplify(geom, tol))
  }
  override def prettyName: String = "st_simplify"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class StTransform(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes =
    Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(geom: Any, from: Any, to: Any): Any =
    wkb(GeoIO.transform(g(geom), from.asInstanceOf[Int], to.asInstanceOf[Int]))
  override def prettyName: String = "st_transform"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

// ---- array of geometries -------------------------------------------------

/** ST_Collect over an array column (cookbook 2.7: `ST_Collect(ARRAY_AGG(g))`). */
case class StCollect(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val geoms = (0 until arr.numElements())
      .filterNot(arr.isNullAt)
      .map(i => g(arr.getBinary(i)))
    wkb(GeoIO.factory.buildGeometry(
      scala.jdk.CollectionConverters.SeqHasAsJava(geoms).asJava))
  }
  override def prettyName: String = "st_collect"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** All four envelope bounds from ONE WKB decode, as array<double>
  * [xmin, ymin, xmax, ymax] — the grid spatial join's cell-assignment
  * stage uses this instead of four separate accessors (4x fewer decodes
  * of every geometry on both join sides). */
case class StEnvelopeBounds(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GeoOps.envelopeBounds(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.geo.GeoOps.envelopeBounds($c))")
  override def prettyName: String = "st_envelope_bounds"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
