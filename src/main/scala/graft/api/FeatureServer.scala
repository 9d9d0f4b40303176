package graft.api

import com.fasterxml.jackson.databind.ObjectMapper

import graft.engine._

/** Esri GeoServices FeatureServer param translation (SURVEY §3.1 steps 1-2;
  * feature_server.py:124-238, 271-337) — pure functions from the ~15 Esri
  * query params to [[QueryParams]]. The HTTP framework is out of scope; any
  * server calls [[translateQuery]] then `QueryEngine.query` then a §2.9
  * serializer picked by `f=`.
  */
/** Esri-style API error (`{"error":{code,message,details}}`) thrown at the
  * request boundary — servers serialize [[toJson]] with HTTP 200 the way
  * ArcGIS clients expect (feature_server.py returns the same shape). */
final class EsriApiException(val code: Int, message: String,
    val details: Seq[String] = Nil)
    extends IllegalArgumentException(message) {
  def toJson: String = {
    val m = new ObjectMapper()
    val o = m.createObjectNode()
    val e = o.putObject("error")
    e.put("code", code)
    e.put("message", message)
    val d = e.putArray("details")
    details.foreach(d.add)
    m.writeValueAsString(o)
  }
}

object FeatureServer {
  private val mapper = new ObjectMapper()

  /** Output spatial references the engine actually honors: `st_transform`
    * implements the closed-form 4326↔3857 web-mercator pair (SURVEY §1.4)
    * and the WGS84 UTM zones (EPSG 32601-32660 / 32701-32760, Krueger
    * series — [[graft.geo.Utm]]), the reprojection a desktop GIS client
    * typically asks for. The reference carries arbitrary WKIDs without
    * ever applying them (feature_server.py:271-295) — silently
    * unhonorable; here an unsupported `outSR` (e.g. a NAD83 UTM zone,
    * which needs a datum shift we don't fake) is REJECTED at the boundary
    * with an Esri-style error instead of surfacing as a deep expression
    * failure or, worse, untransformed coordinates labeled with the wrong
    * SR. */
  // 4326/3857, the 120 WGS84 UTM zones, and NAD83 UTM 26901-26923
  // (GRS80 ellipsoid; the NAD83<->WGS84 datum shift is applied as the
  // EPSG:1188 null transformation — geo/GeoIO.scala `Utm` scaladoc).
  // Genuinely unsupported datums (NAD27 267xx, national grids) still
  // reject Esri-style below.
  val SupportedWkids: Set[Int] = Set(4326, 3857) ++
    (32601 to 32660) ++ (32701 to 32760) ++ (26901 to 26923)

  /** Esri's legacy web-mercator alias, normalized to its modern WKID. */
  private val WkidAliases: Map[Int, Int] = Map(102100 -> 3857)

  /** Normalize aliases, then enforce the supported-WKID contract. */
  def validateOutSr(wkid: Int): Int = {
    val n = WkidAliases.getOrElse(wkid, wkid)
    if (!SupportedWkids(n))
      throw new EsriApiException(400,
        s"outSR $wkid is not supported by this service",
        Seq("supported WKIDs: 4326, 3857, 102100 (alias), " +
          "32601-32660 and 32701-32760 (WGS84 UTM), " +
          "26901-26923 (NAD83 UTM)"))
    n
  }

  /** `geometry=` param: envelope JSON, point JSON, rings JSON, or the
    * "x0,y0,x1,y1" shorthand (feature_server.py:298-337). Returns either a
    * bbox or a WKT polygon filter. */
  def parseGeometry(geometry: String, geometryType: String): (Option[Bbox], Option[String]) = {
    val g = geometry.trim
    if (!g.startsWith("{")) {
      val parts = g.split(",").map(_.trim.toDouble)
      require(parts.length == 4, "geometry shorthand must be x0,y0,x1,y1")
      return (Some(Bbox(parts(0), parts(1), parts(2), parts(3))), None)
    }
    val node = mapper.readTree(g)
    geometryType match {
      case "esriGeometryEnvelope" | "" =>
        (Some(Bbox(node.get("xmin").asDouble, node.get("ymin").asDouble,
          node.get("xmax").asDouble, node.get("ymax").asDouble)), None)
      case "esriGeometryPoint" =>
        val x = node.get("x").asDouble; val y = node.get("y").asDouble
        (None, Some(s"POINT ($x $y)"))
      case "esriGeometryPolygon" =>
        val rings = node.get("rings")
        val ring = rings.get(0)
        val coords = (0 until ring.size()).map { i =>
          s"${ring.get(i).get(0).asDouble} ${ring.get(i).get(1).asDouble}"
        }
        (None, Some(s"POLYGON ((${coords.mkString(", ")}))"))
      case other =>
        throw new IllegalArgumentException(s"unsupported geometryType: $other")
    }
  }

  /** `outSR=` param: plain WKID int or ArcGIS JSON SR object
    * (feature_server.py:271-295). */
  def parseOutSr(outSr: String): Option[Int] = {
    val s = outSr.trim
    if (s.isEmpty) None
    else if (s.startsWith("{")) {
      val node = mapper.readTree(s)
      Option(node.get("latestWkid")).orElse(Option(node.get("wkid")))
        .map(_.asInt)
    } else Some(s.toDouble.toInt)
  }

  /** Full query translation (feature_server.py:224-238). `params` holds the
    * merged URL + form params (ArcPro sends both). */
  def translateQuery(params: Map[String, String], schema: FeatureSchema): QueryParams = {
    def p(name: String): Option[String] =
      params.get(name).map(_.trim).filter(_.nonEmpty)

    val (bbox, wkt) = p("geometry") match {
      case Some(g) =>
        parseGeometry(g, p("geometryType").getOrElse("esriGeometryEnvelope"))
      case None => (None, None)
    }
    val outFields = p("outFields") match {
      case None | Some("*") => Seq("*")
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val orderBy = p("orderByFields").map(_.split(",").toSeq.flatMap { part =>
      part.trim.split("\\s+") match {
        case Array(c) => Some(OrderField(c))
        case Array(c, dir) => Some(OrderField(c, dir.equalsIgnoreCase("DESC")))
        case _ => None
      }
    }).getOrElse(Nil)
    val objectIds = p("objectIds").map(
      _.split(",").map(_.trim.toLong).toSeq)

    QueryParams(
      bbox = bbox,
      geometryWkt = wkt,
      spatialRel = p("spatialRel").map(SpatialRel.fromEsri)
        .getOrElse(SpatialRel.Intersects),
      where = p("where").filterNot(w => w == "1=1" || w == "1 = 1"),
      outFields = outFields,
      returnGeometry = !p("returnGeometry").contains("false"),
      // requested page size clamped to the per-geometry-type serving cap
      // (O5): a client cannot request an unbounded extract via the page API
      limit = Some(FeatureCaps.effectiveLimit(schema,
        p("resultRecordCount").map { s =>
          val n = s.toInt
          // negative/zero page sizes previously reached Spark's limit()
          // and surfaced as a 500 analysis error (round-9 verdict #7)
          require(n > 0, s"resultRecordCount must be positive, got $n")
          n
        })),
      offset = p("resultOffset").map { s =>
        val n = s.toLong
        require(n >= 0, s"resultOffset must be non-negative, got $n")
        n
      }.getOrElse(0L),
      orderBy = orderBy,
      countOnly = p("returnCountOnly").contains("true"),
      idsOnly = p("returnIdsOnly").contains("true"),
      objectIds = objectIds,
      outSr = p("outSR").flatMap(parseOutSr).map(validateOutSr))
  }

  private val NameRe = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /** Namespace/table name guard before any interpolation
    * (api/main.py:28-29,186-188,322-329). */
  def validateName(name: String): String = {
    require(name.split("\\.").forall(p => NameRe.findFirstIn(p).isDefined),
      s"invalid name: $name")
    name
  }
}

/** Service/layer metadata JSON (F7, geoservices/metadata.py:15-117) —
  * pure functions over [[FeatureSchema]]. */
object ServiceMetadata {
  private val mapper = new ObjectMapper()

  def layerJson(schema: FeatureSchema, layerId: Int): String = {
    val o = mapper.createObjectNode()
    o.put("id", layerId)
    o.put("name", schema.table.split("\\.").last)
    o.put("type", "Feature Layer")
    o.put("geometryType", graft.serializers.JsonSerializers.esriGeometryType(
      schema.geometryType.getOrElse("polygon")))
    o.put("objectIdField", "__oid")
    o.put("maxRecordCount", schema.maxRecordCount)
    o.put("supportsPagination", true)
    val adv = mapper.createObjectNode()
    adv.put("supportsPagination", true)
    adv.put("supportsOrderBy", true)
    adv.put("supportsQueryWithResultType", false)
    adv.put("supportsDistinct", false)
    o.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "advancedQueryCapabilities", adv)
    val fields = mapper.createArrayNode()
    val oid = mapper.createObjectNode()
    oid.put("name", "__oid"); oid.put("type", "esriFieldTypeOID")
    oid.put("alias", "OID")
    fields.add(oid)
    schema.fields.foreach { f =>
      val fo = mapper.createObjectNode()
      fo.put("name", f.name)
      fo.put("type", f.dataType match {
        case "int32" => "esriFieldTypeSmallInteger"
        case "int64" => "esriFieldTypeInteger"
        case "float" => "esriFieldTypeSingle"
        case "double" => "esriFieldTypeDouble"
        case "date" | "timestamp" => "esriFieldTypeDate"
        case _ => "esriFieldTypeString"
      })
      fo.put("alias", f.alias)
      fields.add(fo)
    }
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("fields", fields)
    val sr = mapper.createObjectNode(); sr.put("wkid", schema.srid)
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("spatialReference", sr)
    mapper.writeValueAsString(o)
  }

  def serviceJson(layers: Seq[FeatureSchema]): String = {
    val o = mapper.createObjectNode()
    o.put("currentVersion", 11.2)
    o.put("serviceDescription", "graft Spark feature service")
    val arr = mapper.createArrayNode()
    layers.zipWithIndex.foreach { case (s, i) =>
      val lo = mapper.createObjectNode()
      lo.put("id", i); lo.put("name", s.table.split("\\.").last)
      arr.add(lo)
    }
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("layers", arr)
    mapper.writeValueAsString(o)
  }
}

/** OGC API Features provider translation (SURVEY §3.2,
  * pygeoapi_provider/iceberg.py:59-137): OGC params -> the same QueryParams. */
object OgcProvider {
  def translateItems(
      offset: Long = 0, limit: Int = 100,
      bbox: Option[Bbox] = None,
      propertyFilters: Seq[(String, String)] = Nil,
      sortBy: Seq[OrderField] = Nil,
      selectProperties: Seq[String] = Nil,
      skipGeometry: Boolean = false,
      hits: Boolean = false): QueryParams = {
    val where = propertyFilters match {
      case Nil => None
      case fs => Some(fs.map { case (k, v) =>
        s"$k = '${v.replace("'", "''")}'"
      }.mkString(" AND "))
    }
    QueryParams(
      bbox = bbox,
      where = where,
      outFields = if (selectProperties.isEmpty) Seq("*") else selectProperties,
      returnGeometry = !skipGeometry,
      limit = Some(limit),
      offset = offset,
      orderBy = sortBy,
      countOnly = hits)
  }

  /** Single-feature get (iceberg.py:124-137): id equality + limit 1. */
  def translateGetById(idField: String, id: String): QueryParams =
    QueryParams(where = Some(s"$idField = '${id.replace("'", "''")}'"),
      limit = Some(1))
}
