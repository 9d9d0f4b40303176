package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-package registries; each entry is one
  * operator from SURVEY.md §2 (or a north-star pipeline operator), and each
  * SQL-expressible entry has a DuckDB oracle in `oracleSql` with IDENTICAL
  * column names/aliases (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.GeoQueries.queries ++
      operators.EngineQueries.queries ++
      operators.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracleSql ++
      operators.GeoQueries.oracleSql ++
      operators.EngineQueries.oracleSql ++
      operators.PipelineQueries.oracleSql
}
