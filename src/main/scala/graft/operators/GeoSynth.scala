package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.geo.{GeoFunctions => G}

/** Deterministic geometry synthesized from TPC-H numeric keys.
  *
  * The driver's testdata has no geometry columns, and the DuckDB oracle has
  * no spatial extension — so geo queries derive coordinates from integer
  * keys with arithmetic that is bit-identical in Spark and DuckDB (integer
  * mod, double multiply), build geometries on the Spark side only, and the
  * oracle re-derives the same answers in closed form on the raw
  * coordinates. This makes every ST_* function differentially testable
  * without a spatial oracle.
  *
  * Layouts (all inside the reference's Colorado-ish lon/lat range):
  *  - customer → points: lon ∈ [-120, -70.05] step .05, lat ∈ [25, 49.95]
  *  - supplier → boxes: anchored on a 0.25° lattice, w/h ∈ [0.1, 0.28]
  */
object GeoSynth {
  // SQL fragments for the oracle side (must mirror the Column exprs below).
  // Literals are CAST to DOUBLE: DuckDB otherwise promotes 0.05 to DECIMAL
  // and computes exactly, diverging from Spark's IEEE doubles.
  val ptLonSql = "(CAST(-120.0 AS DOUBLE) + (c_custkey % 1000) * CAST(0.05 AS DOUBLE))"
  val ptLatSql = "(CAST(25.0 AS DOUBLE) + ((c_custkey // 7) % 500) * CAST(0.05 AS DOUBLE))"
  val boxX0Sql = "(CAST(-120.0 AS DOUBLE) + (s_suppkey % 200) * CAST(0.25 AS DOUBLE))"
  val boxY0Sql = "(CAST(25.0 AS DOUBLE) + ((s_suppkey * 13) % 100) * CAST(0.25 AS DOUBLE))"
  val boxWSql  = "(CAST(0.1 AS DOUBLE) + (s_suppkey % 10) * CAST(0.02 AS DOUBLE))"

  def ptLon: Column = lit(-120.0) + (col("c_custkey") % 1000) * 0.05
  def ptLat: Column = lit(25.0) + ((col("c_custkey") / 7).cast("long") % 500) * 0.05
  def boxX0: Column = lit(-120.0) + (col("s_suppkey") % 200) * 0.25
  def boxY0: Column = lit(25.0) + ((col("s_suppkey") * 13) % 100) * 0.25
  def boxW: Column  = lit(0.1) + (col("s_suppkey") % 10) * 0.02

  /** customer ⇒ (c_custkey, c_nationkey, lon, lat, geom: WKB point) */
  def points(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_nationkey"),
      ptLon.as("lon"), ptLat.as("lat"))
      .withColumn("geom", G.st_point(col("lon"), col("lat")))

  /** supplier ⇒ (s_suppkey, s_nationkey, x0, y0, x1, y1, bgeom: WKB box) */
  def boxes(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      col("s_suppkey"), col("s_nationkey"),
      boxX0.as("x0"), boxY0.as("y0"))
      .withColumn("x1", col("x0") + boxW)
      .withColumn("y1", col("y0") + boxW)
      .withColumn("bgeom", G.st_makeenvelope(col("x0"), col("y0"), col("x1"), col("y1")))

  /** Oracle CTE prelude defining the same two synthetic tables in SQL. */
  val oraclePrelude: String =
    s"""WITH pts AS (
          SELECT c_custkey, c_nationkey,
                 $ptLonSql AS lon, $ptLatSql AS lat
          FROM customer),
        boxes AS (
          SELECT s_suppkey, s_nationkey,
                 $boxX0Sql AS x0, $boxY0Sql AS y0,
                 $boxX0Sql + $boxWSql AS x1, $boxY0Sql + $boxWSql AS y1
          FROM supplier)
     """
}
