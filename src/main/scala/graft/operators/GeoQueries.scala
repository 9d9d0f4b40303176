package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
object GeoQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
