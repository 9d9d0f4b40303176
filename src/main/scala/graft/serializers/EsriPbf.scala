package graft.serializers

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Geometry => JtsGeometry, _}

import graft.engine.FeatureSchema
import graft.geo.GeoIO

/** Esri FeatureCollection PBF encoder (SURVEY.md §2.9 F3) — quantized,
  * delta-encoded protobuf per the public Esri FeatureCollection proto
  * (reference schema: geoservices/proto/FeatureCollection.proto; behavior:
  * serializers/esri_pbf.py:41-425).
  *
  * Encoding semantics reproduced:
  *  - collective bounds -> Transform{scale = range/1e8 (1.0 range when
  *    degenerate), translate = (xmin, ymin)}, lowerLeft origin;
  *  - per vertex q = rint((w - translate)/scale) — rint = half-to-even,
  *    matching Python's round() (SURVEY §7 quantization determinism);
  *  - delta encoding per ring with prev reset to (0,0) each ring;
  *  - flat packed sint64 coords + packed uint32 lengths;
  *  - fields: `__oid` first (esriFieldTypeOID), then present schema
  *    fields; per-feature attribute count must equal field count;
  *  - binary attribute values -> null (engine type demotion);
  *  - count-only and ids-only short forms.
  *
  * Runs driver-side over one page of collected rows (pages are capped at
  * 500/10k by the engine — the same cost model as the reference); the
  * quantization math itself is pure per-geometry and reusable inside
  * mapPartitions for tiled exports.
  */
object EsriPbf {

  val QuantizeResolution: Double = 1e8

  // enum values from the public proto
  private val GeomTypePoint = 0
  private val GeomTypeMultipoint = 1
  private val GeomTypePolyline = 2
  private val GeomTypePolygon = 3
  private val OriginLowerLeft = 1

  private val FieldTypeSmallInt = 0
  private val FieldTypeInteger = 1
  private val FieldTypeSingle = 2
  private val FieldTypeDouble = 3
  private val FieldTypeString = 4
  private val FieldTypeDate = 5
  private val FieldTypeOID = 6

  def geometryTypeEnum(geomType: String): Int = geomType.toLowerCase match {
    case "point" => GeomTypePoint
    case "multipoint" => GeomTypeMultipoint
    case "linestring" | "multilinestring" | "polyline" => GeomTypePolyline
    case "polygon" | "multipolygon" => GeomTypePolygon
    case _ => GeomTypePoint
  }

  private def fieldTypeEnum(dt: DataType): Int = dt match {
    case IntegerType | ShortType => FieldTypeSmallInt
    case LongType => FieldTypeInteger
    case FloatType => FieldTypeSingle
    case DoubleType => FieldTypeDouble
    case DateType | _: TimestampType => FieldTypeDate
    case _ => FieldTypeString
  }

  /** Rings/paths as coordinate arrays (esri_pbf.py:262-290 semantics). */
  private def coordArrays(g: JtsGeometry): Seq[Array[Coordinate]] = g match {
    case p: Point => Seq(p.getCoordinates)
    case mp: MultiPoint =>
      Seq(mp.getCoordinates)
    case l: LineString => Seq(l.getCoordinates)
    case ml: MultiLineString =>
      (0 until ml.getNumGeometries).map(i => ml.getGeometryN(i).getCoordinates)
    case p: Polygon =>
      p.getExteriorRing.getCoordinates +:
        (0 until p.getNumInteriorRing).map(i => p.getInteriorRingN(i).getCoordinates)
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).flatMap { i =>
        val p = mp.getGeometryN(i).asInstanceOf[Polygon]
        p.getExteriorRing.getCoordinates +:
          (0 until p.getNumInteriorRing).map(j => p.getInteriorRingN(j).getCoordinates)
      }
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).flatMap(i => coordArrays(gc.getGeometryN(i)))
  }

  private def writeGeometry(w: ProtoWriter, field: Int, g: JtsGeometry,
      tx: Double, ty: Double, sx: Double, sy: Double): Unit = {
    w.message(field) { gw =>
      gw.enum(1, geometryTypeEnum(g.getGeometryType))
      val rings = coordArrays(g)
      val lengths = rings.map(_.length.toLong)
      val coords = scala.collection.mutable.ArrayBuffer[Long]()
      rings.foreach { ring =>
        var prevX = 0L; var prevY = 0L
        ring.foreach { c =>
          // rint == Python round (banker's rounding at .5)
          val qx = math.rint((c.x - tx) / sx).toLong
          val qy = math.rint((c.y - ty) / sy).toLong
          coords += (qx - prevX) += (qy - prevY)
          prevX = qx; prevY = qy
        }
      }
      gw.packedUint(2, lengths)
      gw.packedSint64(3, coords)
    }
  }

  private def writeValue(w: ProtoWriter, v: Any, dt: DataType): Unit =
    w.message(1) { vw =>
      v match {
        case null => vw.bool(10, v = true)
        case s: String => vw.string(1, s)
        case f: Float => vw.float(2, f)
        case d: Double => vw.double(3, d)
        case i: Int => vw.sint32(4, i)
        case i: Short => vw.sint32(4, i.toInt)
        case l: Long => vw.int64(6, l)
        case b: Boolean => vw.bool(9, b)
        case t: java.sql.Timestamp => vw.int64(6, t.getTime)
        case d: java.sql.Date => vw.int64(6, d.getTime)
        case _: Array[Byte] => vw.bool(10, v = true) // binary -> null
        case other => vw.string(1, String.valueOf(other))
      }
    }

  private def writeFields(w: ProtoWriter, attrFields: Seq[StructField]): Unit = {
    w.message(13) { fw =>
      fw.string(1, "__oid")
      fw.enum(2, FieldTypeOID)
      fw.string(3, "__oid")
    }
    attrFields.foreach { f =>
      w.message(13) { fw =>
        fw.string(1, f.name)
        fw.enum(2, fieldTypeEnum(f.dataType))
        fw.string(3, f.name)
      }
    }
  }

  /** Feature page -> PBF bytes. `rows` must contain `__oid`; geometry
    * column (if present and returnGeometry) holds WKB. */
  def serialize(rows: Seq[Row], schema: StructType, featureSchema: FeatureSchema,
      exceededTransferLimit: Boolean = false,
      maxAllowableOffset: Option[Double] = None): Array[Byte] = {
    val geomCol = featureSchema.geometryColumn.filter(schema.fieldNames.contains)
    val geomIdx = geomCol.map(schema.fieldIndex)
    val oidIdx = schema.fieldIndex("__oid")
    val attrFields = schema.fields.zipWithIndex
      .filter { case (f, i) => !geomIdx.contains(i) && f.name != "__oid" &&
        !f.name.startsWith("__") }

    // pass 1: decode + optional simplify + collective bounds
    val geoms: Array[JtsGeometry] = geomIdx.map { gi =>
      rows.iterator.map { r =>
        val wkb = r.getAs[Array[Byte]](gi)
        if (wkb == null) null
        else {
          var g = GeoIO.fromWkb(wkb)
          maxAllowableOffset.filter(_ > 0).foreach { tol =>
            g = org.locationtech.jts.simplify.TopologyPreservingSimplifier
              .simplify(g, tol)
          }
          if (g.isEmpty) null else g
        }
      }.toArray
    }.getOrElse(Array.empty)

    val env = new Envelope()
    geoms.foreach(g => if (g != null) env.expandToInclude(g.getEnvelopeInternal))
    val hasGeom = !env.isNull
    val (tx, ty, sx, sy) =
      if (!hasGeom) (0.0, 0.0, 1.0, 1.0)
      else {
        val xr = if (env.getMaxX != env.getMinX) env.getWidth else 1.0
        val yr = if (env.getMaxY != env.getMinY) env.getHeight else 1.0
        (env.getMinX, env.getMinY, xr / QuantizeResolution, yr / QuantizeResolution)
      }

    val root = new ProtoWriter
    root.message(2) { qr =>       // QueryResult
      qr.message(1) { fr =>       // FeatureResult
        fr.string(1, "__oid")
        fr.message(2) { u => u.string(1, "__oid"); u.bool(2, v = true) }
        fr.enum(7, featureSchema.geometryType.map(geometryTypeEnum).getOrElse(0))
        fr.message(8) { sr => sr.uint32(1, featureSchema.srid) }
        fr.bool(9, exceededTransferLimit)
        if (hasGeom) {
          fr.message(12) { t =>   // Transform
            t.enum(1, OriginLowerLeft)
            t.message(2) { s => s.double(1, sx); s.double(2, sy) }
            t.message(3) { tr => tr.double(1, tx); tr.double(2, ty) }
          }
        }
        writeFields(fr, attrFields.map(_._1).toSeq)
        rows.iterator.zipWithIndex.foreach { case (row, ri) =>
          fr.message(15) { feat => // Feature
            // OID always serializes as esri int64 (proto field 6): an
            // IntegerType __oid (e.g. a row_number-assigned oid) would
            // otherwise dispatch on its runtime class into sint32 field 4
            // and every decoder keyed on the OID field would drop the row
            writeValue(feat, row.get(oidIdx) match {
              case n: Number => n.longValue()
              case other => other
            }, LongType)
            attrFields.foreach { case (f, i) => writeValue(feat, row.get(i), f.dataType) }
            if (hasGeom && geoms(ri) != null)
              writeGeometry(feat, 2, geoms(ri), tx, ty, sx, sy)
          }
        }
      }
    }
    root.toBytes
  }

  /** Distributed tiled export (F3 at scale, mirroring GeoParquetIO
    * .writeDistributed): every partition runs the SAME [[serialize]] the
    * page path uses — per-tile collective bounds → Transform, quantize,
    * delta-encode — and writes one `part-NNNNN.pbf` tile with no driver
    * collect and no shuffle. Tile = partition: size partitions
    * (repartition / maxPartitionBytes) so one tile's rows fit in task
    * memory — the distributed analogue of the reference's driver-side
    * 10k-row page cap (engine.py:173-174). Each tile carries its own
    * Transform, so tiles decode independently. */
  def writeTilesDistributed(df: org.apache.spark.sql.DataFrame,
      featureSchema: FeatureSchema, outDir: String): Unit = {
    val schema = df.schema
    new java.io.File(outDir).mkdirs()
    df.foreachPartition { (it: Iterator[Row]) =>
      val rows = it.toSeq
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = serialize(rows, schema, featureSchema)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$outDir/part-$pid%05d.pbf"), bytes)
        ()
      }
    }
  }

  /** Decode a point tile produced by [[writeTilesDistributed]] back to
    * (oid, x, y) of each feature's first vertex — the independent read
    * path for the distributed-export gate. Inverse of [[serialize]]:
    * reads the tile's Transform, un-deltas the first coordinate pair,
    * dequantizes with w = translate + q * scale. */
  def decodePointTile(bytes: Array[Byte]): Seq[(Long, Double, Double)] = {
    var sx = 1.0; var sy = 1.0; var tx = 0.0; var ty = 0.0
    val feats = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def readFeature(r: ProtoReader): Unit = {
      var oid = 0L; var sawOid = false
      var qx = 0L; var qy = 0L; var sawGeom = false
      while (r.hasNext) r.readKey() match {
        case (1, 2) => // attribute value; the FIRST one is always __oid
          val vr = r.subReader()
          while (vr.hasNext) vr.readKey() match {
            case (6, 0) =>
              val v = vr.readVarint(); if (!sawOid) { oid = v; sawOid = true }
            case (_, w) => vr.skip(w)
          }
        case (2, 2) => // geometry: packed sint64 coords, first pair only
          val gr = r.subReader()
          while (gr.hasNext) gr.readKey() match {
            case (3, 2) =>
              val pr = gr.subReader()
              if (pr.hasNext) { qx = pr.zigzag(pr.readVarint()) }
              if (pr.hasNext) { qy = pr.zigzag(pr.readVarint()) }
              while (pr.hasNext) pr.readVarint()
              sawGeom = true
            case (_, w) => gr.skip(w)
          }
        case (_, w) => r.skip(w)
      }
      if (sawOid && sawGeom) feats += ((oid, qx, qy))
    }
    def readFeatureResult(r: ProtoReader): Unit =
      while (r.hasNext) r.readKey() match {
        case (12, 2) => // Transform
          val tr = r.subReader()
          while (tr.hasNext) tr.readKey() match {
            case (2, 2) =>
              val s = tr.subReader()
              while (s.hasNext) s.readKey() match {
                case (1, 1) => sx = s.readDouble()
                case (2, 1) => sy = s.readDouble()
                case (_, w) => s.skip(w)
              }
            case (3, 2) =>
              val t = tr.subReader()
              while (t.hasNext) t.readKey() match {
                case (1, 1) => tx = t.readDouble()
                case (2, 1) => ty = t.readDouble()
                case (_, w) => t.skip(w)
              }
            case (_, w) => tr.skip(w)
          }
        case (15, 2) => readFeature(r.subReader())
        case (_, w) => r.skip(w)
      }
    val root = new ProtoReader(bytes)
    while (root.hasNext) root.readKey() match {
      case (2, 2) =>
        val qr = root.subReader()
        while (qr.hasNext) qr.readKey() match {
          case (1, 2) => readFeatureResult(qr.subReader())
          case (_, w) => qr.skip(w)
        }
      case (_, w) => root.skip(w)
    }
    feats.toSeq.map { case (oid, qx, qy) =>
      (oid, tx + qx * sx, ty + qy * sy)
    }
  }

  /** returnCountOnly short form. */
  def serializeCount(count: Long): Array[Byte] = {
    val root = new ProtoWriter
    root.message(2)(_.message(2)(_.int64(1, count)))
    root.toBytes
  }

  /** returnIdsOnly short form. */
  def serializeIds(ids: Seq[Long]): Array[Byte] = {
    val root = new ProtoWriter
    root.message(2) { qr =>
      qr.message(3) { ir =>
        ir.string(1, "__oid")
        ir.packedUint(3, ids)
      }
    }
    root.toBytes
  }
}
