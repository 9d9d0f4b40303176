package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Streaming semantics driven synchronously: file source + memory sink +
  * processAllAvailable. The tumbling-window stream must agree with the
  * batch plan (q16) on the same data — the merge-compatibility invariant. */
class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("events").toString
    // stage the batch events table as the stream input
    Tables.events(spark, sf("sf0.001")).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed streaming agg == batch q16 on the same files") {
    val dir = eventsDir
    val q = EventStream.windowedCounts(EventStream.source(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("winagg").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000);
    // append mode emits only watermark-closed windows; with AvailableNow the
    // final watermark closes all but the last window(s). Compare the common
    // prefix against the batch computation.
    val streamed = spark.table("winagg")
      .select("win_start", "event_type", "n", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    val batch = operators.RelationalQueries.queries("q16_event_windows")(
      spark, sf("sf0.001"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    assert(streamed.nonEmpty, "stream emitted nothing")
    streamed.foreach { case (k, v) =>
      assert(batch.contains(k), s"window $k not in batch result")
      assert(batch(k) === v, s"window $k mismatch: stream $v batch ${batch(k)}")
    }
    // emitted (closed) windows must be the large majority
    assert(streamed.size >= batch.size - 10,
      s"too few closed windows: ${streamed.size} vs batch ${batch.size}")
  }

  test("streaming as-of lookup == batch AsOfJoin on the same events") {
    val dir = Files.createTempDirectory("asof").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    purchases.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(purchases.schema).parquet(dir)
    val q = EventStream.asofLookup(src, clicks, "user_id", "ts", "ts",
        "event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("asoflk").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("asoflk")
      .select("event_id", "match_id")
      .as[(Long, Option[Long])].collect().toMap
    val batch = graft.joins.AsOfJoin.backward(purchases, clicks,
        "user_id", "ts", "ts",
        Seq(col("event_id").as("match_id"), col("ts").as("match_ts")),
        refTiebreak = col("event_id"))
      .select("event_id", "match_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(batch.nonEmpty && batch.values.exists(_.isDefined),
      "fixture produced no as-of matches")
    assert(streamed === batch)
    assert(q.lastProgress.stateOperators.isEmpty,
      "as-of lookup stream should carry no stateful operators")
  }

  test("sessionization via flatMapGroupsWithState emits gap-split sessions") {
    val dir = Files.createTempDirectory("sess").toString
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    val batch1 = Seq(
      EventStream.Event(1, ts(0), 1L, "view", 1.0),
      EventStream.Event(2, ts(5), 1L, "view", 2.0),
      EventStream.Event(3, ts(60), 1L, "view", 4.0), // gap > 30min -> new session
      EventStream.Event(4, ts(2), 2L, "view", 8.0))
    batch1.toDS().write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(EventStream.eventSchema).parquet(dir)
      .as[EventStream.Event]
    val q = EventStream.sessionize(src, gapMs = 30 * 60000)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val closed = spark.table("sessions")
      .as[EventStream.Session].collect()
    // user 1's first session (2 events, value 3.0) closed by the 60-min event
    assert(closed.exists(s => s.user_id == 1 && s.n_events == 2 &&
      s.total_value === 3.0))
  }

  test("sessionize == batch q19_sessions on the fixture (closed sessions)") {
    // round-15 verdict #4: parity against the BATCH gate, not a toy —
    // every session the stream closes must match a q19 session exactly
    // (user, start, n_events); only each user's FINAL session may stay
    // open in state (NoTimeout: nothing after it ever closes it).
    val dir = Files.createTempDirectory("sessparity").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(EventStream.eventSchema).parquet(dir)
      .as[EventStream.Event]
    val q = EventStream.sessionize(src, gapMs = 1800 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessparity").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("sessparity")
      .select(col("user_id"), col("session_start").cast("long"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val batchAll = operators.RelationalQueries.queries("q19_sessions")(
      spark, sf("sf0.001"))
      .select(col("user_id"), col("start_s"), col("n_events"))
      .as[(Long, Long, Long)].collect()
    val batch = batchAll.toSet
    // each user's last (by start) session is the one the stream may hold
    val lastPerUser = batchAll.groupBy(_._1).values
      .map(_.maxBy(_._2)).toSet
    assert(batch.size > batchAll.map(_._1).distinct.length,
      "fixture must split at least one user into multiple sessions")
    assert(streamed.subsetOf(batch),
      s"stream emitted non-batch sessions: ${(streamed -- batch).take(3)}")
    assert((batch -- lastPerUser).subsetOf(streamed),
      "stream failed to close a non-final batch session: " +
        s"${((batch -- lastPerUser) -- streamed).take(3)}")
  }

  test("windowed agg handles late data: in-watermark counted, " +
      "past-watermark dropped") {
    // round-15 verdict #4's late-data row: two ordered micro-batches.
    // Batch 1 advances the watermark to 12:00 (max 14:00 − 2 h) which
    // closes window 10:00; batch 2 then delivers one row at 10:45
    // (PAST the watermark → dropped from the closed window) and one at
    // 12:30 (late in arrival order but INSIDE the watermark → its
    // still-open window counts it), then 17:00 pushes the watermark to
    // 15:00 closing windows 12:00, 13:00, 14:00.
    val dir = Files.createTempDirectory("latedata").toString
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def ev(id: Long, hourMin: (Int, Int), typ: String = "view") =
      EventStream.Event(id, new java.sql.Timestamp(
        base + (hourMin._1 * 60L + hourMin._2) * 60000L), 1L, typ, 1.0)
    Seq(ev(1, (10, 0)), ev(2, (10, 30)), ev(3, (14, 0)))
      .toDS().write.mode("overwrite").parquet(dir)
    val q = EventStream.windowedCounts(
        spark.readStream.schema(EventStream.eventSchema).parquet(dir),
        window_ = "1 hour", watermark = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("latedata").start()
    q.processAllAvailable()
    Seq(ev(4, (10, 45)), ev(5, (12, 30)), ev(6, (13, 30)), ev(7, (17, 0)))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("latedata")
      .select(col("win_start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toMap
    def winS(hour: Int) = (base + hour * 3600000L) / 1000L
    assert(got(winS(10)) === 2L,
      s"late row past the watermark must be dropped, got ${got(winS(10))}")
    assert(got(winS(12)) === 1L,
      "late-in-arrival row inside the watermark must be counted")
    assert(got(winS(13)) === 1L)
    assert(got(winS(14)) === 1L)
    assert(!got.contains(winS(17)), "unclosed window must not emit")
  }

  test("stream-stream interval join == batch interval join on the same files") {
    val dir = eventsDir
    val src = EventStream.source(spark, dir)
    val q = EventStream.intervalJoin(src, "click", "purchase",
      within = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("ivjoin").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("ivjoin")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // batch twin: same filters and time-range condition on the same files
    val ev = Tables.events(spark, sf("sf0.001"))
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    val batch = l.join(r, col("l_user") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr("INTERVAL 30 minutes"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no joinable pairs")
    // stream side may hold back pairs whose watermark never closed under
    // AvailableNow; every emitted pair must be a batch pair, and the bulk
    // must be emitted
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size * 9 / 10,
      s"stream emitted ${streamed.size} of ${batch.size} pairs")
  }

  test("streaming near-dup candidates == batch simhashPairs on the same docs") {
    val dir = Files.createTempDirectory("neardup").toString
    val base = 1700000000000L
    // the real documents table as the stream, arrival order = doc_id
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    docs.map { case (id, text) =>
      EventStream.Doc(id, new java.sql.Timestamp(base + id * 60000), text) }
      .toSeq.toDS().write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[EventStream.Doc].schema)
      .parquet(dir).as[EventStream.Doc]
    // bucketCap above the corpus size -> the approximation is exact and
    // the stream must reproduce the batch pair set precisely
    val q = EventStream.nearDupCandidates(src, maxHamming = 3,
      bucketCap = docs.length + 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("neardup")
      .select("doc_id", "dup_of").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val batch = graft.pipeline.Dedup.simhashPairs(
      Tables.documents(spark, sf("sf0.001")), "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(batch.nonEmpty, "fixture produced no near-dup pairs")
    assert(streamed === batch)
  }

  test("streaming decontamination == batch overlap on the same corpus") {
    val dir = Files.createTempDirectory("decontam").toString
    // the gate's split: eval = doc_id % 97 == 0, train = the rest
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 97L === 0L)
    docs.filter(col("doc_id") % 97L =!= 0L).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val q = EventStream.contamination(src, evalSet, "doc_id", "text", n = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("decontam").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("decontam")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.pipeline.Decontaminate.overlap(
      docs.filter(col("doc_id") % 97L =!= 0L), evalSet,
      "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no contaminated docs")
    assert(streamed === batch)
    // stateless contract: no state store behind the query — any doc's
    // row is final the micro-batch it arrives in
    assert(q.lastProgress.stateOperators.isEmpty,
      "decontamination stream should carry no stateful operators")
  }

  test("streaming incremental dedup == batch newRows on the same batch") {
    val dir = Files.createTempDirectory("newdocs").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    // batch: half corpus duplicates, half novel variants
    val incoming = docs.select(col("doc_id"),
      when(col("doc_id") % 2L === 0L, col("text"))
        .otherwise(concat(col("text"), lit(" zz"))).as("text"))
    incoming.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(incoming.schema).parquet(dir)
    val q = EventStream.newDocs(src, docs, "text",
        expectedExisting = 10000L, fpp = 0.01, shards = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("newdocs").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("newdocs").select("doc_id")
      .as[Long].collect().toSet
    val batch = graft.pipeline.Bloom.newRows(docs, incoming, col("text"),
        expectedExisting = 10000L, fpp = 0.01, shards = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < incoming.count(),
      "fixture must mix new and duplicate docs")
    assert(streamed === batch)
    // stateless contract: bloom probe + stream-static anti join carry
    // no state store — every row is final on arrival
    assert(q.lastProgress.stateOperators.isEmpty,
      "incremental dedup stream should carry no stateful operators")
  }

  test("streaming dedup drops duplicate event ids") {
    val dir = Files.createTempDirectory("dup").toString
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    (Seq(
      EventStream.Event(1, ts(0), 1, "a", 1.0),
      EventStream.Event(1, ts(1), 1, "a", 1.0), // dup id
      EventStream.Event(2, ts(2), 1, "b", 2.0)))
      .toDS().write.mode("overwrite").parquet(dir)
    val q = EventStream.dedup(
      spark.readStream.schema(EventStream.eventSchema).parquet(dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    assert(spark.table("dedup").count() === 2)
  }

  test("streaming quality rules == batch classify; stateless") {
    val dir = Files.createTempDirectory("qstream").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val q = EventStream.qualityRules(src, "text")
      .select(col("doc_id"), col("reason"))
      .writeStream.outputMode("append").format("memory")
      .queryName("qrules").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("qrules")
      .as[(Long, String)].collect().toSet
    val batch = graft.pipeline.QualityRules.classify(docs, "text")
      .select(col("doc_id"), col("reason"))
      .as[(Long, String)].collect().toSet
    assert(streamed === batch)
    assert(batch.map(_._2).size > 1, "fixture exercises multiple rules")
    assert(q.lastProgress.stateOperators.isEmpty,
      "quality rules must carry no stateful operators")
  }

  test("streaming dsir against static fitted distributions == batch " +
      "hashed weights; unseen text scores with the smoothed default") {
    val dir = Files.createTempDirectory("dsirstream").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("text"))
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val buckets = 1 << 16
    val q = EventStream.dsirScore(src, docs, "doc_id", "text",
        col("source") === lit("src0"), buckets)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsirs").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("dsirs")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
    val batch = graft.pipeline.Dsir.importanceWeights(docs, "doc_id",
        "text", col("source") === lit("src0"),
        hashBuckets = Some(buckets))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
    // every corpus gram's bucket is in the fitted table, so the lifted
    // map replays the batch join bit-exactly — exact equality
    assert(streamed === batch && streamed.nonEmpty)
    assert(q.lastProgress.stateOperators.isEmpty,
      "dsir scoring must carry no stateful operators")
    // a stream doc made of unseen tokens scores n_grams * default (the
    // c=0 Laplace ratio), not a null or a dropped row
    val novel = Seq((999999L, "srcX", "zzzq1 zzzq2"))
      .toDF("doc_id", "source", "text")
    novel.coalesce(1).write.mode("append").parquet(dir)
    val q2 = EventStream.dsirScore(
        spark.readStream.schema(docs.schema).parquet(dir),
        docs, "doc_id", "text", col("source") === lit("src0"), buckets)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsirs2").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.awaitTermination(30000)
    val nov = spark.table("dsirs2").filter(col("doc_id") === 999999L)
      .as[(Long, Long, Long)].collect()
    assert(nov.length === 1)
    val (_, nGrams, w) = nov(0)
    assert(nGrams === 3L) // 2 unigrams + 1 bigram
    assert(w % nGrams === 0L,
      "all-unseen doc must score an integer multiple of the default")
  }

  test("streaming bm25 against static corpus stats == batch score") {
    val dir = Files.createTempDirectory("bm25stream").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val query = Seq("spark", "merge", "window")
    val q = EventStream.bm25(src, docs, "doc_id", "text", query)
      .writeStream.outputMode("append").format("memory")
      .queryName("bm25s").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    val streamed = spark.table("bm25s")
      .as[(Long, Long, Double)].collect()
      .map { case (id, dl, s) => id -> ((dl, s)) }.toMap
    val batch = graft.pipeline.Bm25
      .score(docs, "doc_id", "text", query)
      .as[(Long, Long, Double)].collect()
      .map { case (id, dl, s) => id -> ((dl, s)) }.toMap
    // literal-statistics streaming scores are BIT-identical to the
    // batch broadcast-statistics scores (same operand-order contract
    // the DuckDB oracle relies on) — exact equality, no tolerance
    assert(streamed === batch)
    assert(q.lastProgress.stateOperators.isEmpty,
      "bm25 scoring must carry no stateful operators")
  }

  test("streaming greedy packing == batch packGreedy across micro-batches") {
    // the prep chain's last streaming twin: the per-stratum (bin, fill)
    // recurrence carries across micro-batches as state, so an
    // append-only corpus packs incrementally. Two id-ordered chunks are
    // fed as SEPARATE micro-batches (maxFilesPerTrigger=1) — the second
    // must CONTINUE each stratum's running bin, not restart at 0.
    val dir = Files.createTempDirectory("packstream").toString
    val base = Tables.documents(spark, sf("sf0.001"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(graft.pipeline.Decontaminate.normCol(col("text")),
          " ")).cast("long").as("n_tokens"))
    val mid = base.agg(avg(col("doc_id"))).collect()(0).getDouble(0).toLong
    base.filter(col("doc_id") < mid).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    Thread.sleep(1100) // distinct mtime: the file source orders chunks
    base.filter(col("doc_id") >= mid).coalesce(1)
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStream.packGreedy(src.as[EventStream.PackDoc],
        budget = 512L)
      .writeStream.outputMode("append").format("memory")
      .queryName("packs").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000)
    assert(q.lastProgress.stateOperators.nonEmpty,
      "packing must carry per-stratum state")
    val streamed = spark.table("packs")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = graft.pipeline.Pack.packGreedy(base, "doc_id",
        "n_tokens", "source", budget = 512L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed === batch && streamed.nonEmpty,
      "stream must assign the batch recurrence's exact bins")
    // and some stratum's second chunk must have continued past bin 0 —
    // i.e. the state genuinely crossed the batch boundary
    assert(streamed.exists { case (id, _, _, bin) => id >= mid && bin > 0 },
      "no cross-batch bin continuation observed")
    // bin-stats parity, the aggregate a training job reads
    val sStats = graft.pipeline.Pack.binStats(spark.table("packs"),
        "doc_id", "n_tokens", "source")
      .orderBy(col("source"), col("bin"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val bStats = graft.pipeline.Pack.binStats(
        graft.pipeline.Pack.packGreedy(base, "doc_id", "n_tokens",
          "source", budget = 512L), "doc_id", "n_tokens", "source")
      .orderBy(col("source"), col("bin"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(sStats === bStats)
  }
}
