package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Det
import graft.engine._
import graft.geo.{GeoFunctions => G}

/** The QueryParams->DataFrame pipeline (SURVEY.md §3) under the
  * differential gate: each entry drives the REAL engine (numbering,
  * filters, sanitizer, projection, pagination) and the oracle re-derives
  * the same result with a row_number CTE in SQL.
  */
object EngineQueries {

  private def pointsSchema(s: SparkSession, d: String): (DataFrame, FeatureSchema) = {
    val df = GeoSynth.points(s, d)
    // static schema: geometry probe not needed for these queries, and the
    // Point layer page size (10k) exceeds every page used here
    val schema = FeatureSchema("pts", Some("geom"), Some("Point"), 4326,
      Seq.empty, Some("c_custkey"), 10000)
    (df, schema)
  }

  private def custSchema(s: SparkSession, d: String): (DataFrame, FeatureSchema) = {
    val df = graft.Tables.customer(s, d)
    (df, FeatureSchema("customer", None, None, 4326, Seq.empty,
      Some("c_custkey"), 10000))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full pipeline: bbox ∧ WHERE ∧ order ∧ offset/limit ∧ projection (W1,
    // P1-P4, P2-sanitizer, O1, O2 in one pass).
    "engine_page" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-110, 30, -80, 45)),
        where = Some("c_nationkey IN (1, 2, 3, 4, 5)"),
        outFields = Seq("c_custkey", "c_nationkey", "lat"),
        returnGeometry = false,
        orderBy = Seq(OrderField("lat", descending = true)),
        limit = Some(50), offset = 10),
        countMode = QueryEngine.CountMode.None).df
    }),

    // count-only mode (A1).
    "engine_count" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      val r = QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-100, 35, -95, 40)),
        where = Some("c_nationkey < 10"),
        countOnly = true))
      import s.implicits._
      Seq(r.count.get).toDF("n")
    }),

    // ids-only mode (returnIdsOnly).
    "engine_ids" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-100, 35, -98, 37)), idsOnly = true)).df
    }),

    // objectIds fetch (P7) — the OID round-trip invariant: ids assigned
    // before filters must address the same rows in a different query shape.
    "engine_objectids" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        objectIds = Some(Seq(5L, 6L, 7L, 100L, 101L, 500L)),
        outFields = Seq("c_custkey", "lon", "lat"),
        returnGeometry = false),
        countMode = QueryEngine.CountMode.None).df
    }),

    // WHERE passthrough with an allowlisted function + non-spatial table.
    "engine_where_fn" -> ((s, d) => {
      val (df, sch) = custSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        where = Some("upper(c_mktsegment) = 'BUILDING' AND c_acctbal > 1000.0"),
        outFields = Seq("c_custkey", "c_acctbal", "c_mktsegment"),
        orderBy = Seq(OrderField("c_acctbal", descending = true)),
        limit = Some(100)),
        countMode = QueryEngine.CountMode.None).df
    }),

    // Oid.ById — the 100 TB path: id column as OID, no global window.
    // (Also the engine DEFAULT since round 2; kept as an explicit row so
    // the mode survives under the gate even if defaults move again.)
    "engine_oid_by_id" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-100, 35, -95, 40)),
        outFields = Seq("lon", "lat"),
        returnGeometry = false,
        limit = Some(1000)),
        oidMode = QueryEngine.Oid.ById,
        countMode = QueryEngine.CountMode.None).df
    }),

    // WHERE breadth through the sanitizer: LIKE + BETWEEN + IN in one
    // predicate (the reference's most common client-authored shapes).
    "engine_where_like" -> ((s, d) => {
      val (df, sch) = custSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        where = Some("c_mktsegment LIKE 'BUIL%' AND " +
          "c_acctbal BETWEEN 100.0 AND 5000.0 AND " +
          "c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7)"),
        outFields = Seq("c_custkey", "c_nationkey", "c_acctbal"),
        orderBy = Seq(OrderField("c_custkey")),
        limit = Some(200)),
        countMode = QueryEngine.CountMode.None).df
    }),

    // Keyset pagination (O2 scale path) under the gate: two consecutive
    // keyset pages must equal the oracle's single ORDER BY __oid LIMIT 80
    // — proving page disjointness, ordering, and the `__oid > last`
    // range-predicate contract against SQL.
    "engine_keyset" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      // bbox chosen inside the synthesized lon range AT EVERY SF (lon
      // starts at -120 and only reaches -112.5 at sf0.001)
      val p = QueryParams(bbox = Some(Bbox(-120.0, 20.0, -112.0, 55.0)),
        outFields = Seq("c_custkey", "lat"), returnGeometry = false,
        limit = Some(40))
      val page1 = QueryEngine.keysetPage(df, sch, p, None)
      val lastRow = page1.agg(max(col(QueryEngine.OidCol))).collect()(0)
      val page2 =
        if (lastRow.isNullAt(0)) page1.limit(0)
        else QueryEngine.keysetPage(df, sch, p, Some(lastRow.getLong(0)))
      page1.union(page2).orderBy(col(QueryEngine.OidCol))
    }),

    // outSR applied end-to-end (§1.4): the engine reprojects the output
    // geometry to web mercator before serialization; the oracle computes
    // the same closed-form transform on raw coordinates.
    "engine_outsr" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      val r = QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-110.0, 30.0, -90.0, 45.0)),
        outFields = Seq("c_custkey"),
        returnGeometry = true,
        outSr = Some(3857),
        limit = Some(300)),
        countMode = QueryEngine.CountMode.None)
      require(r.srid == 3857)
      r.df.select(col("__oid"), col("c_custkey"),
        Det.r(G.st_x(col("geom")), 4).as("mx"),
        Det.r(G.st_y(col("geom")), 4).as("my"))
        .orderBy(col("__oid"))
    }),

    // S2 snapshot pinning under the oracle gate: build a versioned table
    // in a scratch catalog, append more rows as v2, read pinned v1
    // (`VERSION AS OF` analogue) — the oracle re-derives v1's content.
    "catalog_pin" -> ((s, d) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_cat_pin_" + new java.io.File(d).getName)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root) // hermetic: versions restart at 1 every run
      val cat = new graft.sources.ParquetCatalog(s, root.getPath)
      val cust = graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      cat.createOrReplace("gate", "cust", cust.filter(col("c_custkey") <= 100))
      cat.append("gate", "cust",
        cust.filter(col("c_custkey") > 100 && col("c_custkey") <= 200))
      cat.loadAt("gate", "cust", 1L).orderBy(col("c_custkey"))
    }),

    // Oid.Sequential — opt-in reference-parity numbering (dense 0-based
    // row_number): the oracle reproduces it with a row_number CTE.
    "engine_oid_seq" -> ((s, d) => {
      val (df, sch) = pointsSchema(s, d)
      QueryEngine.query(df, sch, QueryParams(
        bbox = Some(Bbox(-110, 30, -80, 45)),
        outFields = Seq("c_custkey", "c_nationkey", "lat"),
        returnGeometry = false,
        orderBy = Seq(OrderField("lat", descending = true)),
        limit = Some(50), offset = 10),
        oidMode = QueryEngine.Oid.Sequential,
        countMode = QueryEngine.CountMode.None).df
    }))

  private val numberedCte =
    s"""${GeoSynth.oraclePrelude.trim},
        numbered AS (
          SELECT c_custkey, c_nationkey, lon, lat,
                 row_number() OVER (ORDER BY c_custkey) - 1 AS __oid
          FROM pts)
     """

  def oracleSql: Map[String, String] = Map(
    // Default path is Oid.ById since round 2: __oid == c_custkey.
    "engine_page" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid, c_custkey, c_nationkey, lat FROM pts
          WHERE lon >= -110.0 AND lon <= -80.0 AND lat >= 30.0 AND lat <= 45.0
            AND c_nationkey IN (1, 2, 3, 4, 5)
          ORDER BY lat DESC, __oid LIMIT 50 OFFSET 10""",
    "engine_count" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT count(*) AS n FROM pts
          WHERE lon >= -100.0 AND lon <= -95.0 AND lat >= 35.0 AND lat <= 40.0
            AND c_nationkey < 10""",
    "engine_ids" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid FROM pts
          WHERE lon >= -100.0 AND lon <= -98.0 AND lat >= 35.0 AND lat <= 37.0
          ORDER BY __oid""",
    "engine_objectids" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid, c_custkey, lon, lat FROM pts
          WHERE c_custkey IN (5, 6, 7, 100, 101, 500)
          ORDER BY __oid""",
    "engine_where_fn" ->
      """SELECT c_custkey AS __oid, c_custkey, c_acctbal, c_mktsegment
         FROM customer
         WHERE upper(c_mktsegment) = 'BUILDING' AND c_acctbal > 1000.0
         ORDER BY c_acctbal DESC, __oid LIMIT 100""",
    "engine_oid_by_id" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid, lon, lat FROM pts
          WHERE lon >= -100.0 AND lon <= -95.0 AND lat >= 35.0 AND lat <= 40.0
          ORDER BY __oid LIMIT 1000""",
    "engine_oid_seq" ->
      s"""$numberedCte
          SELECT __oid, c_custkey, c_nationkey, lat FROM numbered
          WHERE lon >= -110.0 AND lon <= -80.0 AND lat >= 30.0 AND lat <= 45.0
          ORDER BY lat DESC, __oid LIMIT 50 OFFSET 10""",
    "catalog_pin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey <= 100 ORDER BY c_custkey""",
    "engine_where_like" ->
      """SELECT c_custkey AS __oid, c_custkey, c_nationkey, c_acctbal
         FROM customer
         WHERE c_mktsegment LIKE 'BUIL%'
           AND c_acctbal BETWEEN 100.0 AND 5000.0
           AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7)
         ORDER BY c_custkey LIMIT 200""",
    "engine_keyset" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid, c_custkey, lat FROM pts
          WHERE lon >= -120.0 AND lon <= -112.0 AND lat >= 20.0 AND lat <= 55.0
          ORDER BY __oid LIMIT 80""",
    "engine_outsr" ->
      s"""${GeoSynth.oraclePrelude}
          SELECT c_custkey AS __oid, c_custkey,
            ${Det.rsql("6378137.0 * (lon * pi() / 180.0)", 4)} AS mx,
            ${Det.rsql("6378137.0 * ln(tan(pi() / 4.0 + (lat * pi() / 180.0) / 2.0))", 4)} AS my
          FROM pts
          WHERE lon >= -110.0 AND lon <= -90.0 AND lat >= 30.0 AND lat <= 45.0
          ORDER BY __oid LIMIT 300""")
}
