package graft.serializers

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Geometry => JtsGeometry, _}

import graft.engine.FeatureSchema
import graft.geo.GeoIO

/** Esri JSON FeatureSet (F1, serializers/esri_json.py:18-133) and GeoJSON
  * FeatureCollection (F2, serializers/geojson.py + pygeoapi provider
  * shape). Driver-side page serializers (pages are engine-capped); the
  * per-row geometry conversion is pure and reusable in mapPartitions for
  * distributed sinks.
  */
object JsonSerializers {
  private val mapper = new ObjectMapper()

  private def esriFieldType(dt: DataType): String = dt match {
    case IntegerType | ShortType => "esriFieldTypeSmallInteger"
    case LongType => "esriFieldTypeInteger"
    case FloatType => "esriFieldTypeSingle"
    case DoubleType => "esriFieldTypeDouble"
    case DateType | _: TimestampType => "esriFieldTypeDate"
    case _ => "esriFieldTypeString"
  }

  def esriGeometryType(geomType: String): String = geomType.toLowerCase match {
    case "point" => "esriGeometryPoint"
    case "multipoint" => "esriGeometryMultipoint"
    case "linestring" | "multilinestring" => "esriGeometryPolyline"
    case _ => "esriGeometryPolygon"
  }

  private def coords(a: ArrayNode, cs: Array[Coordinate]): ArrayNode = {
    cs.foreach { c =>
      val p = mapper.createArrayNode(); p.add(c.x); p.add(c.y); a.add(p)
    }
    a
  }

  /** Esri geometry JSON: {x,y} / {rings} / {paths} / {points}
    * (esri_json.py:73-97). */
  def esriGeometry(g: JtsGeometry): ObjectNode = {
    val o = mapper.createObjectNode()
    g match {
      case p: Point => o.put("x", p.getX); o.put("y", p.getY)
      case poly @ (_: Polygon | _: MultiPolygon) =>
        val rings = mapper.createArrayNode()
        val polys = poly match {
          case p: Polygon => Seq(p)
          case mp: MultiPolygon =>
            (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
        }
        polys.foreach { p =>
          rings.add(coords(mapper.createArrayNode(), p.getExteriorRing.getCoordinates))
          (0 until p.getNumInteriorRing).foreach(i =>
            rings.add(coords(mapper.createArrayNode(), p.getInteriorRingN(i).getCoordinates)))
        }
        o.set[ObjectNode]("rings", rings)
      case line @ (_: LineString | _: MultiLineString) =>
        val paths = mapper.createArrayNode()
        val lines = line match {
          case l: LineString => Seq(l)
          case ml: MultiLineString =>
            (0 until ml.getNumGeometries).map(ml.getGeometryN(_).asInstanceOf[LineString])
        }
        lines.foreach(l => paths.add(coords(mapper.createArrayNode(), l.getCoordinates)))
        o.set[ObjectNode]("paths", paths)
      case mp: MultiPoint =>
        val pts = mapper.createArrayNode()
        (0 until mp.getNumGeometries).foreach { i =>
          val c = mp.getGeometryN(i).getCoordinate
          val p = mapper.createArrayNode(); p.add(c.x); p.add(c.y); pts.add(p)
        }
        o.set[ObjectNode]("points", pts)
      case _ => return null
    }
    o
  }

  private def putValue(o: ObjectNode, name: String, v: Any): Unit = v match {
    case null => o.putNull(name)
    case s: String => o.put(name, s)
    case i: Int => o.put(name, i)
    case l: Long => o.put(name, l)
    case d: Double => o.put(name, d)
    case f: Float => o.put(name, f)
    case b: Boolean => o.put(name, b)
    case t: java.sql.Timestamp => o.put(name, t.getTime)
    case d: java.sql.Date => o.put(name, d.getTime)
    case _: Array[Byte] => o.putNull(name) // binary -> null (type demotion)
    case other => o.put(name, String.valueOf(other))
  }

  /** F1: Esri JSON FeatureSet. */
  def esriFeatureSet(rows: Seq[Row], schema: StructType, fs: FeatureSchema,
      exceededTransferLimit: Boolean): String = {
    val root = mapper.createObjectNode()
    root.put("objectIdFieldName", "__oid")
    root.put("geometryType",
      esriGeometryType(fs.geometryType.getOrElse("polygon")))
    root.set[ObjectNode]("spatialReference",
      mapper.createObjectNode().put("wkid", fs.srid))
    val fields = mapper.createArrayNode()
    fields.add(mapper.createObjectNode()
      .put("name", "__oid").put("type", "esriFieldTypeOID").put("alias", "OID"))
    val geomIdx = fs.geometryColumn.filter(schema.fieldNames.contains)
      .map(schema.fieldIndex)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!geomIdx.contains(i) && f.name != "__oid")
        fields.add(mapper.createObjectNode()
          .put("name", f.name).put("type", esriFieldType(f.dataType))
          .put("alias", f.name))
    }
    root.set[ObjectNode]("fields", fields)
    val features = mapper.createArrayNode()
    rows.foreach { row =>
      val feat = mapper.createObjectNode()
      val attrs = mapper.createObjectNode()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!geomIdx.contains(i)) putValue(attrs, f.name, row.get(i))
      }
      feat.set[ObjectNode]("attributes", attrs)
      geomIdx.foreach { gi =>
        val wkb = row.getAs[Array[Byte]](gi)
        if (wkb != null) feat.set[ObjectNode]("geometry", esriGeometry(GeoIO.fromWkb(wkb)))
        else feat.putNull("geometry")
      }
      features.add(feat)
    }
    root.set[ObjectNode]("features", features)
    root.put("exceededTransferLimit", exceededTransferLimit)
    mapper.writeValueAsString(root)
  }

  /** Esri JSON short forms. */
  def esriCount(count: Long): String =
    mapper.writeValueAsString(mapper.createObjectNode().put("count", count))
  def esriIds(ids: Seq[Long]): String = {
    val o = mapper.createObjectNode().put("objectIdFieldName", "__oid")
    val a = mapper.createArrayNode(); ids.foreach(a.add); o.set[ObjectNode]("objectIds", a)
    mapper.writeValueAsString(o)
  }

  /** F2: GeoJSON FeatureCollection (provider shape: id + numberMatched /
    * numberReturned, pygeoapi_provider/iceberg.py:155-196). */
  def geoJsonFeatureCollection(rows: Seq[Row], schema: StructType,
      fs: FeatureSchema, numberMatched: Option[Long]): String = {
    val geomIdx = fs.geometryColumn.filter(schema.fieldNames.contains)
      .map(schema.fieldIndex)
    val oidIdx = schema.fieldNames.indexOf("__oid")
    val root = mapper.createObjectNode()
    root.put("type", "FeatureCollection")
    val features = mapper.createArrayNode()
    rows.foreach { row =>
      val feat = mapper.createObjectNode()
      feat.put("type", "Feature")
      if (oidIdx >= 0) feat.put("id", row.getLong(oidIdx))
      val props = mapper.createObjectNode()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!geomIdx.contains(i) && f.name != "__oid") putValue(props, f.name, row.get(i))
      }
      feat.set[ObjectNode]("properties", props)
      geomIdx match {
        case Some(gi) if row.getAs[Array[Byte]](gi) != null =>
          feat.set[ObjectNode]("geometry",
            mapper.readTree(GeoIO.toGeoJson(GeoIO.fromWkb(row.getAs[Array[Byte]](gi))))
              .asInstanceOf[ObjectNode])
        case _ => feat.putNull("geometry")
      }
      features.add(feat)
    }
    root.set[ObjectNode]("features", features)
    numberMatched.foreach(n => root.put("numberMatched", n))
    root.put("numberReturned", rows.size)
    mapper.writeValueAsString(root)
  }
}
