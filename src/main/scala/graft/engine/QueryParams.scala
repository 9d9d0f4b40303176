package graft.engine

/** API-agnostic query IR — the single abstraction every API surface
  * (GeoServices, OGC Features, GeoParquet stream) translates into.
  * Mirrors the reference's `QueryParams` (query/models.py:11-61).
  */
final case class QueryParams(
    bbox: Option[Bbox] = None,
    geometryWkt: Option[String] = None,
    spatialRel: SpatialRel = SpatialRel.Intersects,
    where: Option[String] = None,
    outFields: Seq[String] = Seq("*"),
    returnGeometry: Boolean = true,
    limit: Option[Int] = None,
    offset: Long = 0L,
    orderBy: Seq[OrderField] = Nil,
    countOnly: Boolean = false,
    idsOnly: Boolean = false,
    objectIds: Option[Seq[Long]] = None,
    outSr: Option[Int] = None)

final case class Bbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

final case class OrderField(name: String, descending: Boolean = false)

sealed trait SpatialRel
object SpatialRel {
  case object Intersects extends SpatialRel
  case object Contains extends SpatialRel
  case object Within extends SpatialRel

  /** Esri rel names mapped down (feature_server.py:210-216). */
  def fromEsri(s: String): SpatialRel = s match {
    case "esriSpatialRelIntersects" | "esriSpatialRelEnvelopeIntersects" |
         "intersects" => Intersects
    case "esriSpatialRelContains" | "contains" => Contains
    case "esriSpatialRelWithin" | "within" => Within
    case other => throw new IllegalArgumentException(s"unsupported spatialRel: $other")
  }
}

/** Layer schema derived from the DataFrame (query/models.py:63-73). */
final case class FeatureSchema(
    table: String,
    geometryColumn: Option[String],
    geometryType: Option[String],
    srid: Int,
    fields: Seq[FieldDef],
    idField: Option[String],
    maxRecordCount: Int)

final case class FieldDef(name: String, dataType: String, alias: String)

/** Result: the page DataFrame + serving metadata. Under `CountMode.Exact`
  * the page is an eagerly collected LocalRelation (driver-local, bounded
  * by maxRecordCount — one scan serves both rows and count); every other
  * mode stays a lazily-planned DataFrame. `srid` is the spatial reference
  * of the OUTPUT geometry (= `outSr` when a reprojection was applied, else
  * the layer srid) — serializers must report this one. */
final case class QueryResult(
    df: org.apache.spark.sql.DataFrame,
    count: Option[Long],
    exceededTransferLimit: Boolean,
    srid: Int = 4326)
