package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (object = JVM-wide singleton;
  * suites run sequentially in the forked test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.geo.GeoRegistry.install(s)
    // PLANS.md round 18: canChangeCachedPlanOutputPartitioning=true
    // coalesced memoized edge lists under cached compute-dense consumers
    // (doc_winnow_sound 1.30 -> 4.93 s) and was reverted with
    // measurements. Guard the default so a session-builder edit cannot
    // silently reintroduce it; PlanGuardSpec scans the main builders.
    require(s.conf.get(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning") == "false",
      "cached-plan output partitioning must stay at the default (false)")
    s
  }
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
