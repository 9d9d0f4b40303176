package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{GeoFunctions => G}

/** GeoJSON FeatureCollection source (S4, api/main.py:836-850) and the
  * multi-file ingest path (S6, api/main.py:678-817).
  *
  * Distributed read: `spark.read.json(multiLine)` parses the
  * FeatureCollection, `explode(features)` is the only generator-shaped op
  * the surface needs (SURVEY §2.11), properties are struct-expanded, and
  * geometry re-serializes through `st_geomfromgeojson` to WKB — geometry
  * column first, matching `ST_Read`'s output convention.
  */
object GeoJsonSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", value = true).json(path)
    val features = raw.select(explode(col("features")).as("f"))
    val hasProps = features.schema("f").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("properties")
    val withGeom = features.withColumn("geometry",
      when(col("f.geometry").isNotNull,
        G.st_geomfromgeojson(to_json(col("f.geometry")))).otherwise(lit(null)))
    if (hasProps) withGeom.select(col("geometry"), col("f.properties.*"))
    else withGeom.select(col("geometry"))
  }

  /** S6: unify N frames (schema union with missing columns null-filled) —
    * the upload concat/append semantics. Incompatible same-name columns
    * with different types raise, mirroring the 409 rejection. */
  def unify(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty)
    frames.reduce { (a, b) =>
      val shared = a.schema.fields.flatMap { f =>
        b.schema.fields.find(_.name == f.name).map(g => (f, g))
      }
      shared.foreach { case (f, g) =>
        if (f.dataType != g.dataType &&
            !Seq(f.dataType, g.dataType).forall(_.isInstanceOf[
              org.apache.spark.sql.types.NumericType]))
          throw new IllegalArgumentException(
            s"incompatible schemas: ${f.name} ${f.dataType} vs ${g.dataType}")
      }
      a.unionByName(b, allowMissingColumns = true)
    }
  }
}
