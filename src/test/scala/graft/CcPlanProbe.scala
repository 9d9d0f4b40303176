package graft

import org.apache.spark.sql.functions._

/** Dev-only: prints the physical plan of ONE large-star/small-star CC
  * round in both the round-18 (groupBy+join) form and the round-19
  * (window-min) form over the same edge list — the plan evidence for
  * plans/r19/cc_round_{before,after}.txt, since the round plan lives
  * inside connectedComponentsResult's loop and never appears in a
  * gate's terminal explain. AQE off so exchanges/codegen spans print. */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((5L, 1L), (4L, 2L), (9L, 3L)).toDF("src", "dst")
      .localCheckpoint(true)

    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

    println("=== BEFORE (groupBy-min + join, twice) ===")
    val lsMin = sym.groupBy(col("src")).agg(min(col("dst")).as("__nmin"))
      .select(col("src").as("__u"),
        least(col("__nmin"), col("src")).as("__m"))
    val lsB = sym.join(lsMin, col("src") === col("__u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .distinct()
    val ssMin = lsB.groupBy(col("src")).agg(min(col("dst")).as("__m"))
    val leaves = lsB.join(ssMin, Seq("src"))
      .where(col("dst") =!= col("__m"))
      .select(col("dst").as("src"), col("__m").as("dst"))
    val centers = ssMin.select(col("src"), col("__m").as("dst"))
    leaves.union(centers).distinct().explain("formatted")

    println("=== AFTER (window-min, round 19) ===")
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val lsA = sym
      .withColumn("__m", least(min(col("dst")).over(wSrc), col("src")))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .distinct()
    lsA.withColumn("__m", min(col("dst")).over(wSrc))
      .select(when(col("dst") === col("__m"), col("src"))
          .otherwise(col("dst")).as("src"),
        col("__m").as("dst"))
      .distinct().explain("formatted")
    spark.stop()
  }
}
