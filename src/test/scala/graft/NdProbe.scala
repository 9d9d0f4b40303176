package graft

import org.apache.spark.sql.functions._

/** Dev-only phase profiler for doc_neardup_clusters_star (round-17
  * verdict #3). Test scope; not part of the library. */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val docs = Tables.documents(spark, sfDir)
      val cert = t("slice+persist") {
        val c = graft.pipeline.Caches.persistTracked(
          Dedup.slicedById(docs.select(col("doc_id"), col("text")),
            "doc_id", maxRows = 5000L))
        c.count(); c
      }
      val edges = t("starEdges") {
        Dedup.minhashStarEdgesShared(cert, "doc_id", "text",
          numHashes = 64, bands = 8, shingle = 5, threshold = 0.7)
      }
      println(s"edges: ${edges.count()} rows, " +
        s"${edges.rdd.getNumPartitions} partitions")
      val star = t("cc-distributed") {
        val r = Dedup.connectedComponentsResult(edges)
        r.labels.count()
        println(s"  cc rounds: ${r.rounds}")
        r.labels
      }
      t("cc-dist-coalesced") {
        val r = Dedup.connectedComponentsResult(edges.coalesce(1))
        r.labels.count()
      }
      t("cc-dist-noaqe") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val r = Dedup.connectedComponentsResult(edges)
          r.labels.count()
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      val expanded = t("cc-local") {
        val e = Dedup.localComponents(edges); e.count(); e
      }
      t("violations+agg") {
        val joined = star
          .select(col("id").as("__id"), col("comp").as("__cs"))
          .join(expanded.select(col("id").as("__id"), col("comp").as("__ce")),
            Seq("__id"), "full_outer")
          .withColumn("__viol",
            when(col("__cs").isNull || col("__ce").isNull ||
              col("__cs") =!= col("__ce"), 1L).otherwise(0L))
        docs.agg(count(lit(1)).as("n_docs")).crossJoin(
          joined.agg(coalesce(sum(col("__viol")), lit(0L))
            .cast("long").as("n_violations"))).collect()
      }
      t("release") { graft.pipeline.Caches.release() }
    }
    spark.stop()
  }
}
