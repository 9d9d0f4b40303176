package graft

/** Guards the round-18 AQE lesson as a failing test, not just prose
  * (PLANS.md round 18; round-18 verdict "next round" #8):
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true` let
  * AQE coalesce a memoized 64-partition edge list to 1-2 partitions and
  * serialized the compute-dense certificate re-scoring above the cache
  * (doc_winnow_sound 1.30 -> 4.93 s at sf1); it was reverted with
  * measurements. Cached intermediates feeding compute-dense consumers
  * need their partitioning — so no graft session builder may set the
  * flag, and the shared test session must hold the Spark default.
  */
class PlanGuardSpec extends SparkFunSuite {

  test("cached-plan output partitioning stays at the Spark default") {
    assert(spark.conf.get(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      === "false")
  }

  test("no session builder reintroduces the reverted AQE flag") {
    // Forked test JVM runs with cwd = the sbt base directory; scan every
    // main-source session builder (the mains plus anything that might
    // grow one later) for the flag string. A legitimate future use must
    // delete this guard ALONGSIDE a new PLANS.md measurement showing the
    // round-18 regression no longer applies.
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(srcRoot),
      s"expected to run from the repo root, cwd=${System.getProperty("user.dir")}")
    val offenders = {
      val stream = java.nio.file.Files.walk(srcRoot)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .filter(p => java.nio.file.Files.readString(p)
            .contains("canChangeCachedPlanOutputPartitioning"))
          .map(_.toString).toList
      } finally stream.close()
    }
    assert(offenders.isEmpty,
      s"session builders set the reverted AQE flag: $offenders")
  }
}
