package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only per-query overhead profiler (round 19 optimization): runs
  * selected SparkEntry queries through the noop sink and reports, per
  * query, the number of Spark jobs / stages / tasks and the summed task
  * run time next to wall time. Wall >> Σtask/cores with many stages
  * means the query is paying scheduling/stage-wave latency, not compute
  * — the dominant cost shape at sf0.1 — and the fix is fewer
  * materialization waves, not faster expressions. Test scope, never
  * shipped; mirrors NdProbe. */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.geo.GeoRegistry.install(spark)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val gcNanos = new AtomicLong(0L)
    val trace = sys.env.contains("WAVE_TRACE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) {
          val d = Option(j.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          val cs = Option(j.properties)
            .map(_.getProperty("callSite.short", "")).getOrElse("")
          println(s"  JOB ${j.jobId} stages=${j.stageIds.size} " +
            s"desc=$d site=$cs")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          gcNanos.addAndGet(t.taskMetrics.jvmGCTime * 1000000L)
        }
      }
    })

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.pipeline.Caches.release()
    Thread.sleep(300)
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%8s ${"gc_s"}%7s")
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      // run twice, report the second (warm) run's counters — matches the
      // bench's min-of-2 protocol
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.pipeline.Caches.release()
      Thread.sleep(100)
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
      gcNanos.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Caches.release()
      Thread.sleep(200) // let listener drain
      val r = (name, wall, jobs.get, stages.get, tasks.get,
        taskNanos.get / 1e9, gcNanos.get / 1e9)
      println(f"${r._1}%-28s ${r._2}%7.3f ${r._3}%5d ${r._4}%6d " +
        f"${r._5}%6d ${r._6}%8.3f ${r._7}%7.3f")
      r
    }
    println("== sorted by wall ==")
    rows.sortBy(-_._2).foreach { r =>
      println(f"${r._1}%-28s ${r._2}%7.3f ${r._3}%5d ${r._4}%6d " +
        f"${r._5}%6d ${r._6}%8.3f ${r._7}%7.3f")
    }
    spark.stop()
  }
}
