package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection entry: `runMain graft.Explain <queryName> [sfDir]` prints
  * the formatted physical plan — the feedback loop for "is this the plan
  * you'd want at 100 TB" (pushed filters, broadcast vs shuffle, codegen
  * spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE hides WholeStageCodegen subtrees in pre-execution explain;
      // disable it here so plan inspection shows the real codegen spans
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.geo.GeoRegistry.install(spark)
    val mode = if (args.length > 2) args(2) else "formatted"
    // comma-separated names run in ONE JVM with per-query markers, so a
    // batch of plan captures doesn't pay 13 session startups
    name.split(',').filter(_.nonEmpty).foreach { q =>
      println(s"=== GRAFT_EXPLAIN $q ===")
      SparkEntry.queries(q)(spark, sfDir).explain(mode)
    }
    spark.stop()
  }
}
