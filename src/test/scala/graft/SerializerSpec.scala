package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.{Bbox, FeatureSchema, FieldDef}
import graft.geo.GeoIO
import graft.serializers._
import graft.sources.{GeoJsonSource, GeoParquetIO}

/** Serializer round-trips mirroring the reference's test style
  * (test_esri_pbf_encoder.py / test_geoarrow_formatter.py): encode, decode
  * with an independent reader, assert counts/fields/transform/delta math.
  */
class SerializerSpec extends SparkFunSuite {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def pt(x: Double, y: Double) = GeoIO.toWkb(GeoIO.point(x, y))

  private val schema = StructType(Seq(
    StructField("__oid", LongType), StructField("name", StringType),
    StructField("temperature", DoubleType), StructField("geometry", BinaryType)))
  private val fs = FeatureSchema("t", Some("geometry"), Some("Point"), 4326,
    Seq(FieldDef("name", "string", "name"),
      FieldDef("temperature", "double", "temperature")), Some("__oid"), 10000)
  private val rows = Seq(
    Row(0L, "a", 20.5, pt(-105.0, 39.7)),
    Row(1L, "b", null, pt(-104.5, 40.1)),
    Row(2L, null, 7.25, null))

  // --- PBF ---------------------------------------------------------------

  /** Minimal decoder for the FeatureResult parts the tests assert on. */
  private case class DecodedPbf(
      oidField: String, wkid: Int, exceeded: Boolean,
      scaleX: Double, scaleY: Double, transX: Double, transY: Double,
      fields: Seq[(String, Long)], features: Seq[(Seq[Any], Option[(Seq[Long], Seq[Long])])])

  private def decodePbf(bytes: Array[Byte]): DecodedPbf = {
    var oidField = ""; var wkid = 0; var exceeded = false
    var sx = 1.0; var sy = 1.0; var tx = 0.0; var ty = 0.0
    val fields = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val feats = scala.collection.mutable.ArrayBuffer[(Seq[Any], Option[(Seq[Long], Seq[Long])])]()

    def readPacked(r: ProtoReader, zig: Boolean): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (r.hasNext) {
        val v = r.readVarint()
        out += (if (zig) r.zigzag(v) else v)
      }
      out.toSeq
    }
    def readGeom(r: ProtoReader): (Seq[Long], Seq[Long]) = {
      var lengths = Seq.empty[Long]; var coords = Seq.empty[Long]
      while (r.hasNext) r.readKey() match {
        case (2, 2) => lengths = readPacked(r.subReader(), zig = false)
        case (3, 2) => coords = readPacked(r.subReader(), zig = true)
        case (_, w) => r.skip(w)
      }
      (lengths, coords)
    }
    def readValue(r: ProtoReader): Any = {
      var v: Any = null
      while (r.hasNext) r.readKey() match {
        case (1, 2) => v = r.readString()
        case (3, 1) => v = r.readDouble()
        case (4, 0) => v = r.zigzag(r.readVarint()).toInt
        case (6, 0) => v = r.readVarint()
        case (9, 0) => v = r.readVarint() == 1
        case (10, 0) => r.readVarint(); v = null
        case (_, w) => r.skip(w)
      }
      v
    }
    def readFeature(r: ProtoReader): Unit = {
      val attrs = scala.collection.mutable.ArrayBuffer[Any]()
      var geom: Option[(Seq[Long], Seq[Long])] = None
      while (r.hasNext) r.readKey() match {
        case (1, 2) => attrs += readValue(r.subReader())
        case (2, 2) => geom = Some(readGeom(r.subReader()))
        case (_, w) => r.skip(w)
      }
      feats += ((attrs.toSeq, geom))
    }
    def readFeatureResult(r: ProtoReader): Unit = {
      while (r.hasNext) r.readKey() match {
        case (1, 2) => oidField = r.readString()
        case (8, 2) =>
          val sr = r.subReader()
          while (sr.hasNext) sr.readKey() match {
            case (1, 0) => wkid = sr.readVarint().toInt
            case (_, w) => sr.skip(w)
          }
        case (9, 0) => exceeded = r.readVarint() == 1
        case (12, 2) =>
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
        case (13, 2) =>
          val f = r.subReader()
          var name = ""; var ft = 0L
          while (f.hasNext) f.readKey() match {
            case (1, 2) => name = f.readString()
            case (2, 0) => ft = f.readVarint()
            case (_, w) => f.skip(w)
          }
          fields += ((name, ft))
        case (15, 2) => readFeature(r.subReader())
        case (_, w) => r.skip(w)
      }
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
    DecodedPbf(oidField, wkid, exceeded, sx, sy, tx, ty, fields.toSeq, feats.toSeq)
  }

  test("PBF round-trip: counts, SR, fields, transform, attr-count invariant") {
    val bytes = EsriPbf.serialize(rows, schema, fs, exceededTransferLimit = true)
    val d = decodePbf(bytes)
    assert(d.oidField === "__oid")
    assert(d.wkid === 4326)
    assert(d.exceeded)
    assert(d.scaleX > 0 && d.scaleY > 0)
    // fields: __oid + name + temperature; every feature has 3 attributes
    assert(d.fields.map(_._1) === Seq("__oid", "name", "temperature"))
    assert(d.fields.head._2 === 6L) // esriFieldTypeOID
    assert(d.features.size === 3)
    d.features.foreach { case (attrs, _) => assert(attrs.size === d.fields.size) }
    // null handling: feature 1 has null temperature, feature 2 null name+geom
    assert(d.features(1)._1(2) === null)
    assert(d.features(2)._1(1) === null && d.features(2)._2.isEmpty)
  }

  test("PBF delta-encoding coordinate math recovers original points") {
    val bytes = EsriPbf.serialize(rows, schema, fs)
    val d = decodePbf(bytes)
    // transform: translate = collective min corner
    assert(d.transX === -105.0 && d.transY === 39.7)
    val Some((lengths, coords)) = d.features.head._2
    assert(lengths === Seq(1L) && coords.size === 2)
    // un-delta + un-quantize first point: must equal the input within scale
    val x = coords(0) * d.scaleX + d.transX
    val y = coords(1) * d.scaleY + d.transY
    assert(math.abs(x - -105.0) <= d.scaleX)
    assert(math.abs(y - 39.7) <= d.scaleY)
    // second feature: delta from (0,0) per-feature (single ring each)
    val Some((_, c2)) = d.features(1)._2
    val x2 = c2(0) * d.scaleX + d.transX
    assert(math.abs(x2 - -104.5) <= d.scaleX)
  }

  test("PBF polygon rings incl. holes; multipolygon ring flattening") {
    val poly = GeoIO.fromWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    val mpoly = GeoIO.fromWkt(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    val pschema = StructType(Seq(StructField("__oid", LongType),
      StructField("geometry", BinaryType)))
    val pfs = fs.copy(geometryType = Some("Polygon"), fields = Seq.empty)
    val bytes = EsriPbf.serialize(
      Seq(Row(0L, GeoIO.toWkb(poly)), Row(1L, GeoIO.toWkb(mpoly))), pschema, pfs)
    val d = decodePbf(bytes)
    val Some((l1, c1)) = d.features(0)._2
    assert(l1 === Seq(5L, 5L)) // shell + hole, closed rings
    assert(c1.size === 20)
    val Some((l2, _)) = d.features(1)._2
    assert(l2 === Seq(5L, 5L)) // two shells flattened
  }

  test("PBF quantization uses half-to-even (Python round parity)") {
    // value engineered to land exactly on .5 in quantized space:
    // scale = range/1e8; pick coords so (w - min)/scale = k + 0.5
    val r0 = Row(0L, "x", 0.0, pt(0.0, 0.0))
    val r1 = Row(1L, "y", 0.0, pt(1.0, 1.0)) // range 1.0 -> scale 1e-8
    val half = 2.5e-8 // (w-0)/1e-8 = 2.5 -> rint -> 2 (even), not 3
    val r2 = Row(2L, "z", 0.0, pt(half, half))
    val bytes = EsriPbf.serialize(Seq(r0, r1, r2), schema, fs)
    val d = decodePbf(bytes)
    val Some((_, c)) = d.features(2)._2
    assert(c(0) === 2L, s"expected banker's rounding, got ${c(0)}")
  }

  test("PBF tiled distributed export: byte-identical to page serializer; tiles decode") {
    val data = (1L to 40L).map(i => (i, pt(-110.0 + i * 0.5, 30.0 + i * 0.25)))
    val df = data.toDF("__oid", "geometry")
    val tfs = fs.copy(fields = Seq.empty)
    // a single sorted partition must produce a tile byte-identical to the
    // driver-side page serializer over the same rows in the same order
    val out1 = Files.createTempDirectory("pbft1").toString
    EsriPbf.writeTilesDistributed(
      df.coalesce(1).sortWithinPartitions("__oid"), tfs, out1)
    val tile = Files.readAllBytes(java.nio.file.Paths.get(s"$out1/part-00000.pbf"))
    val expected = EsriPbf.serialize(
      df.orderBy("__oid").collect().toSeq, df.schema, tfs)
    assert(tile.sameElements(expected))
    // multi-partition: every row decodes from exactly one tile, each tile
    // dequantizing through its OWN Transform
    val out2 = Files.createTempDirectory("pbft2").toString
    EsriPbf.writeTilesDistributed(
      df.repartition(4, org.apache.spark.sql.functions.col("__oid")), tfs, out2)
    val decoded = new java.io.File(out2).listFiles()
      .filter(_.getName.endsWith(".pbf")).sortBy(_.getName)
      .flatMap(f => EsriPbf.decodePointTile(Files.readAllBytes(f.toPath)))
    assert(decoded.length === 40)
    val byOid = decoded.map(t => t._1 -> ((t._2, t._3))).toMap
    data.foreach { case (i, _) =>
      val (x, y) = byOid(i)
      assert(math.abs(x - (-110.0 + i * 0.5)) < 1e-6, s"oid $i x=$x")
      assert(math.abs(y - (30.0 + i * 0.25)) < 1e-6, s"oid $i y=$y")
    }
  }

  test("PBF count-only and ids-only short forms") {
    val cd = new ProtoReader(EsriPbf.serializeCount(12345L))
    val (2, 2) = cd.readKey()
    val qr = cd.subReader()
    val (2, 2) = qr.readKey()
    val cr = qr.subReader()
    val (1, 0) = cr.readKey()
    assert(cr.readVarint() === 12345L)

    val ids = EsriPbf.serializeIds(Seq(3L, 5L, 9L))
    val ir = new ProtoReader(ids)
    val (2, 2) = ir.readKey()
    val q2 = ir.subReader()
    val (3, 2) = q2.readKey()
    val inner = q2.subReader()
    val (1, 2) = inner.readKey()
    assert(inner.readString() === "__oid")
    val (3, 2) = inner.readKey()
    val packed = inner.subReader()
    assert(Seq(packed.readVarint(), packed.readVarint(), packed.readVarint())
      === Seq(3L, 5L, 9L))
  }

  test("PBF golden bytes: count, ids, and a minimal one-feature page") {
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02x").mkString
    // Hand-derived from the public protobuf wire format + the Esri
    // FeatureCollection field numbers (re-derived from the proto contract,
    // not copied): byte-level writer verification independent of our own
    // ProtoReader.
    // count: root{2: QueryResult{2: CountResult{1: 42}}}
    assert(hex(EsriPbf.serializeCount(42L)) === "12041202082a")
    // ids: root{2: {3: IdsResult{1: "__oid", 3: packed [1,2,3]}}}
    assert(hex(EsriPbf.serializeIds(Seq(1L, 2L, 3L))) ===
      "120e1a0c0a055f5f6f69641a03010203")
    // minimal page: one feature, only __oid=7, srid 4326, no geometry:
    //   FeatureResult{1: "__oid", 2: UniqueId{"__oid", true},
    //     8: SR{wkid 4326}, 13: Field{__oid, OID, __oid},
    //     15: Feature{1: Value{6: 7}}}
    val minSchema = StructType(Seq(StructField("__oid", LongType)))
    val minFs = graft.engine.FeatureSchema("t", None, None, 4326,
      Seq.empty, Some("__oid"), 10000)
    val expected = "12310a2f" +
      "0a055f5f6f6964" +                        // objectIdFieldName
      "12090a055f5f6f69641001" +                // uniqueIdField
      "420308e621" +                            // spatialReference 4326
      "6a100a055f5f6f696410061a055f5f6f6964" +  // field __oid, type OID
      "7a040a023007"                            // feature, oid value 7
    assert(hex(EsriPbf.serialize(Seq(Row(7L)), minSchema, minFs)) === expected)
  }

  test("PBF geometry delta golden vectors (quantize/delta contract)") {
    val pschema = StructType(Seq(StructField("__oid", LongType),
      StructField("geometry", BinaryType)))
    def geomOf(wkt: String, gt: String): (Seq[Long], Seq[Long]) = {
      val pfs = fs.copy(geometryType = Some(gt), fields = Seq.empty)
      val bytes = EsriPbf.serialize(
        Seq(Row(0L, GeoIO.toWkb(GeoIO.fromWkt(wkt)))), pschema, pfs)
      decodePbf(bytes).features(0)._2.get
    }
    // line (0 0, 1 0, 1 1): bounds (0,0)-(1,1) -> scale 1e-8, translate
    // (0,0); lowerLeft-origin deltas: (0,0), (+1e8,0), (0,+1e8)
    val (ll, lc) = geomOf("LINESTRING (0 0, 1 0, 1 1)", "LineString")
    assert(ll === Seq(3L))
    assert(lc === Seq(0L, 0L, 100000000L, 0L, 0L, 100000000L))
    // unit box, explicit ring order: closed 5-vertex ring; per-axis delta
    // sums return to the origin
    val (bl, bc) = geomOf("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "Polygon")
    assert(bl === Seq(5L))
    assert(bc === Seq(0L, 0L, 100000000L, 0L, 0L, 100000000L,
      -100000000L, 0L, 0L, -100000000L))
    assert(bc.grouped(2).map(_(0)).sum === 0L)
    assert(bc.grouped(2).map(_(1)).sum === 0L)
    // single point: degenerate bounds quantize to (0,0) with range-1 scale
    val (pl, pc) = geomOf("POINT (10 20)", "Point")
    assert(pl === Seq(1L))
    assert(pc === Seq(0L, 0L))
  }

  test("Esri JSON FeatureSet shape: point {x,y}, nulls, field defs") {
    val json = mapper.readTree(
      JsonSerializers.esriFeatureSet(rows, schema, fs, exceededTransferLimit = false))
    assert(json.get("objectIdFieldName").asText === "__oid")
    assert(json.get("geometryType").asText === "esriGeometryPoint")
    assert(json.get("spatialReference").get("wkid").asInt === 4326)
    assert(json.get("features").size === 3)
    val f0 = json.get("features").get(0)
    assert(f0.get("geometry").get("x").asDouble === -105.0)
    assert(f0.get("attributes").get("name").asText === "a")
    assert(json.get("features").get(1).get("attributes").get("temperature").isNull)
    assert(!json.get("exceededTransferLimit").asBoolean)
  }

  test("GeoJSON FeatureCollection: ids, properties, numberMatched/Returned") {
    val json = mapper.readTree(JsonSerializers.geoJsonFeatureCollection(
      rows, schema, fs, numberMatched = Some(42L)))
    assert(json.get("type").asText === "FeatureCollection")
    assert(json.get("numberMatched").asLong === 42L)
    assert(json.get("numberReturned").asInt === 3)
    val f0 = json.get("features").get(0)
    assert(f0.get("id").asLong === 0L)
    assert(f0.get("geometry").get("type").asText === "Point")
    assert(f0.get("geometry").get("coordinates").get(0).asDouble === -105.0)
    assert(json.get("features").get(2).get("geometry").isNull)
  }

  test("HTML rendering: directory, layer page, result table with escaping") {
    val dir = HtmlRenderer.serviceDirectory("demo", Seq(fs))
    assert(dir.contains("<li>") && dir.contains("Point"))
    val layer = HtmlRenderer.layerPage(fs, 0)
    assert(layer.contains("temperature") && layer.contains("SRID 4326"))
    val evil = Seq(Row(0L, "<script>x&y</script>", 1.0, pt(0, 0)))
    val table = HtmlRenderer.resultTable(evil, schema, fs, Some(1L))
    assert(!table.contains("<script>"))
    assert(table.contains("&lt;script&gt;"))
    assert(table.contains("&lt;wkb 21 bytes&gt;"))
  }

  test("Arrow IPC round-trip") {
    val bytes = ArrowIpc.serialize(rows, schema)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    assert(reader.loadNextBatch())
    val root = reader.getVectorSchemaRoot
    assert(root.getRowCount === 3)
    assert(root.getSchema.getFields.size === 4)
    val names = root.getVector(1).asInstanceOf[org.apache.arrow.vector.VarCharVector]
    assert(new String(names.get(0)) === "a")
    assert(names.isNull(2))
    val temps = root.getVector(2).asInstanceOf[org.apache.arrow.vector.Float8Vector]
    assert(temps.get(0) === 20.5)
    assert(temps.isNull(1))
    reader.close(); alloc.close()
  }

  test("GeoParquet sink: geometry first + geo footer; source reads it back") {
    val dir = Files.createTempDirectory("geopq").toFile
    val path = s"${dir.getPath}/page.parquet"
    GeoParquetIO.writePage(rows, schema, "geometry", path,
      geometryTypes = Seq("Point"), bbox = Some(Bbox(-105, 39.7, -104.5, 40.1)))
    // footer metadata
    val Some((primary, enc)) = GeoParquetIO.readGeoMetadata(path)
    assert(primary === "geometry" && enc === "WKB")
    // readable by Spark; geometry column ordered first
    val df = GeoParquetIO.read(spark, path)
    assert(df.columns.head === "geometry")
    assert(df.count() === 3)
    val wkb = df.filter(org.apache.spark.sql.functions.col("__oid") === 0L)
      .select("geometry").collect()(0).getAs[Array[Byte]](0)
    assert(GeoIO.fromWkb(wkb).getCoordinate.x === -105.0)
  }

  test("distributed GeoParquet export: per-partition files, footers intact") {
    val dir = Files.createTempDirectory("geopq_dist").toString
    val df = operators.GeoSynth.points(spark, sf()).repartition(3)
    GeoParquetIO.writeDistributed(df, "geom", dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length === 3)
    parts.foreach { p =>
      val Some((primary, enc)) = GeoParquetIO.readGeoMetadata(p.getPath)
      assert(primary === "geom" && enc === "WKB")
    }
    val back = GeoParquetIO.read(spark, dir)
    assert(back.count() === df.count())
    assert(back.columns.head === "geom")
  }

  test("GeoJSON source: FeatureCollection -> WKB frame; unify appends") {
    val gj =
      """{"type":"FeatureCollection","features":[
        {"type":"Feature","properties":{"name":"p1","v":1},
         "geometry":{"type":"Point","coordinates":[-105.0,39.7]}},
        {"type":"Feature","properties":{"name":"p2","v":2},
         "geometry":null}]}"""
    val f = Files.createTempFile("fc", ".geojson")
    Files.writeString(f, gj)
    val df = GeoJsonSource.read(spark, f.toString)
    assert(df.columns.head === "geometry")
    assert(df.count() === 2)
    val r = df.filter(org.apache.spark.sql.functions.col("name") === "p1").collect()(0)
    assert(GeoIO.fromWkb(r.getAs[Array[Byte]]("geometry")).getCoordinate.y === 39.7)
    assert(df.filter(org.apache.spark.sql.functions.col("name") === "p2")
      .collect()(0).isNullAt(0))
    // unify: missing columns null-filled
    val extra = Seq(("p3", 3L, "extra")).toDF("name", "v", "note")
    val unified = GeoJsonSource.unify(Seq(df, extra))
    assert(unified.count() === 3)
    assert(unified.columns.contains("note"))
    // incompatible: same column, disjoint type
    val bad = Seq(("p4", true)).toDF("name", "v")
    assertThrows[IllegalArgumentException](GeoJsonSource.unify(Seq(df, bad)))
  }
}
