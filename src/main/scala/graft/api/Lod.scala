package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geo.{GeoFunctions => G}

/** Level-of-detail policy (SURVEY §4 "LOD rewrites"; webmap/src/main.ts:75-84,
  * 217-221 + api/main.py:410-443): zoom-driven server-side geometry
  * simplification and grid-binned centroid aggregation — explicit alternate
  * plans chosen by request params, not optimizer rules.
  */
object Lod {

  /** Douglas-Peucker tolerance per zoom: `360 / (2^zoom * 256)` degrees
    * (one screen pixel), off at zoom >= 12 (main.ts:217-221). */
  def simplifyTolerance(zoom: Int): Option[Double] =
    if (zoom >= 12) None else Some(360.0 / (math.pow(2.0, zoom) * 256.0))

  /** Aggregation-mode resolution ladder: 5/2/0.5/0.1/0.05 degrees at zoom
    * <=3/<=5/<=7/<=9/<=10; feature mode above (main.ts:75-84). Default
    * resolution without zoom is 0.1 (api/main.py:412). */
  def aggregationResolution(zoom: Int): Option[Double] =
    if (zoom <= 3) Some(5.0)
    else if (zoom <= 5) Some(2.0)
    else if (zoom <= 7) Some(0.5)
    else if (zoom <= 9) Some(0.1)
    else if (zoom <= 10) Some(0.05)
    else None

  val DefaultResolution: Double = 0.1

  /** mode=aggregate plan (A6): grid-binned centroid counts at `res`. */
  def aggregate(df: DataFrame, geom: Column, res: Double): DataFrame = {
    val c = G.st_centroid(geom)
    df.withColumn("__cx", G.st_x(c)).withColumn("__cy", G.st_y(c))
      .groupBy(floor(col("__cx") / res).cast("long").as("__gx"),
        floor(col("__cy") / res).cast("long").as("__gy"))
      .agg(count(lit(1)).as("feature_count"))
      .select(
        G.st_point((col("__gx") + 0.5) * res, (col("__gy") + 0.5) * res)
          .as("geometry"),
        col("feature_count"))
      .orderBy(col("feature_count").desc)
  }

  /** Feature-mode plan with zoom-appropriate simplification applied to the
    * geometry column (server-side LOD; api/main.py:368-378). */
  def simplified(df: DataFrame, geomCol: String, zoom: Int): DataFrame =
    simplifyTolerance(zoom) match {
      case Some(tol) =>
        df.withColumn(geomCol, G.st_simplify(col(geomCol), lit(tol)))
      case None => df
    }
}
