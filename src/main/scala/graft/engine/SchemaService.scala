package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geo.{GeoFunctions => G, GeoIO}

/** Schema inference over a feature DataFrame — the reference never declares
  * schemas, it detects them (engine.py:466-527, 141-149):
  * geometry column by name heuristic then first-binary fallback, id field by
  * name then first-integer fallback, geometry type by probing one row's WKB,
  * page size by geometry type.
  */
object SchemaService {

  private val GeomNames = Seq("geometry", "geom", "wkb_geometry", "shape", "location")
  private val IdNames = Seq("objectid", "id", "fid", "gid", "ogc_fid")

  def detectGeometryColumn(df: DataFrame): Option[String] = {
    val binaryCols = df.schema.fields.filter(_.dataType == BinaryType)
    binaryCols.find(f => GeomNames.contains(f.name.toLowerCase))
      .orElse(binaryCols.headOption)
      .map(_.name)
  }

  def detectIdField(df: DataFrame): Option[String] = {
    val fields = df.schema.fields
    fields.find(f => IdNames.contains(f.name.toLowerCase) &&
        (f.dataType == IntegerType || f.dataType == LongType))
      .orElse(fields.find(f =>
        f.dataType == IntegerType || f.dataType == LongType))
      .map(_.name)
  }

  /** One-row probe for the layer's geometry type (engine.py:141-149). */
  def probeGeometryType(df: DataFrame, geomCol: String): Option[String] =
    df.select(col(geomCol)).filter(col(geomCol).isNotNull).limit(1)
      .collect().headOption
      .map(r => GeoIO.fromWkb(r.getAs[Array[Byte]](0)).getGeometryType)

  /** Full-layer extent (A4: min/max of the envelope scalars — the
    * formulation the reference deems normative over buggy ST_Extent). */
  def extent(df: DataFrame, geomCol: String): Option[Bbox] = {
    val r = df.agg(
      min(G.st_xmin(col(geomCol))), min(G.st_ymin(col(geomCol))),
      max(G.st_xmax(col(geomCol))), max(G.st_ymax(col(geomCol))))
      .collect()(0)
    if (r.isNullAt(0)) None
    else Some(Bbox(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  /** Cost-aware page size: 500 for (multi)polygon layers (PBF serialization
    * cost), 10 000 otherwise (engine.py:173-174). */
  def maxRecordCount(geometryType: Option[String]): Int = geometryType match {
    case Some(t) if t.toLowerCase.contains("polygon") => 500
    case _ => 10000
  }

  private def typeName(dt: DataType): String = dt match {
    case StringType => "string"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case DateType => "date"
    case _: TimestampType => "timestamp"
    case BinaryType => "binary"
    // complex types demote to string at the schema level (engine.py:128-133)
    case _ => "string"
  }

  def describe(df: DataFrame, table: String): FeatureSchema = {
    val geomCol = detectGeometryColumn(df)
    val geomType = geomCol.flatMap(c => probeGeometryType(df, c))
    FeatureSchema(
      table = table,
      geometryColumn = geomCol,
      geometryType = geomType,
      srid = GeoIO.SRID,
      fields = df.schema.fields.toSeq
        .filterNot(f => geomCol.contains(f.name))
        .filterNot(f => f.name.startsWith("__"))
        .map(f => FieldDef(f.name, typeName(f.dataType), f.name)),
      idField = detectIdField(df),
      maxRecordCount = maxRecordCount(geomType))
  }
}
