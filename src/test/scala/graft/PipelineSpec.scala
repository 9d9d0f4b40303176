package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, LangProfiles, Multimodal, Similarity, TextHash}
import graft.pipeline.TextFunctions._

/** Pipeline operators: LSH paths vs brute-force oracles, langid accuracy on
  * real multilingual text, multimodal plumbing, ANN recall. */
class PipelineSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))

  // corpus with planted near-duplicates for the dedup paths
  private lazy val planted = {
    val base = docs.limit(30).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mutated = base.take(10).map { case (id, t) =>
      // light mutation: change one word, add whitespace noise
      (id + 100000L, t.replaceFirst("a", "the") + "  tail")
    }
    (base ++ mutated).toSeq.toDF("doc_id", "text")
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs (threshold .6)") {
    val brute = Dedup.bruteForcePairs(planted, "doc_id", "text", 5, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(planted, "doc_id", "text", 64, 16, 5, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "planted near-dups must be above threshold")
    // LSH refines candidates with exact jaccard, so lsh ⊆ brute always;
    // recall must be high (16 bands x 4 rows at j>=.6 -> ~99%+)
    assert(lsh.subsetOf(brute))
    assert(lsh.size >= brute.size * 9 / 10,
      s"LSH recall too low: ${lsh.size}/${brute.size}")
    // every planted mutation pairs with its source
    val plantedPairs = (0 until 10).map(i => brute.find {
      case (a, b) => b == a + 100000L
    }).count(_.isDefined)
    assert(plantedPairs >= 9)
  }

  test("checkpoint cache entries are exempt from size-bound eviction") {
    import graft.pipeline.Caches
    Caches.release()
    // a checkpointed plan registered OUTSIDE any request generation (gen 0,
    // the 'always evictable' class for persists) must survive a registry
    // flood: localCheckpoint truncates lineage, so a size-evicted
    // checkpoint would make the next action throw instead of recompute
    val cp = spark.range(100).toDF("id").localCheckpoint(true)
    Caches.trackCheckpointed(cp)
    (1 to Caches.maxTracked + 8).foreach { i =>
      Caches.persistTracked(spark.range(i, i + 5).toDF("id")).count()
    }
    assert(cp.count() === 100L)
    Caches.release()
    assert(Caches.trackedCount === 0)
  }

  test("events NTZ (micros corpus) normalization is session-zone independent") {
    val dir = java.nio.file.Files.createTempDirectory("evts").toString
    // Three corpus instants (UTC wall clocks): an ordinary one, one whose
    // New York rendering (01:30 EST, second pass of the repeated hour)
    // is AMBIGUOUS during the 2024-11-03 fall-back overlap, and one whose
    // rendering (02:30) does not EXIST during the 2024-03-10 spring-forward
    // gap. A normalization that round-trips through the session zone's
    // wall clock shifts either of the latter by the DST gap.
    spark.sql(
      """SELECT * FROM VALUES
           (1L, timestamp_ntz'2024-03-01 12:00:00'),
           (2L, timestamp_ntz'2024-11-03 06:30:00.123456'),
           (3L, timestamp_ntz'2024-03-10 07:30:00')
         AS t(event_id, ts)""")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def instants(): Seq[Long] =
      Tables.events(spark, dir).orderBy("event_id").select("ts").collect()
        .toSeq.map(_.getTimestamp(0).getTime)
    val utc = instants()
    val zoneBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(instants() === utc,
        "NTZ events shifted when read under a non-UTC session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", zoneBefore)
    // the fields really were UTC instants, not zone-relative
    assert(utc(0) === java.time.Instant.parse("2024-03-01T12:00:00Z")
      .toEpochMilli)
    assert(utc(1) === java.time.Instant.parse("2024-11-03T06:30:00.123Z")
      .toEpochMilli)
  }

  test("exact jaccard join: prefix-filtered == brute force, both contract paths") {
    // brute force is the ground truth at every threshold — the prefix
    // filter must lose NOTHING (exact triple equality, values included)
    for (t <- Seq(0.4, 0.6, 0.9)) {
      val brute = Dedup.bruteForcePairs(planted, "doc_id", "text", 5, t)
        .as[(Long, Long, Double)].collect().toSet
      val pp = Dedup.jaccardPairs(planted, "doc_id", "text", 5, t,
        Dedup.Contract.Off).as[(Long, Long, Double)].collect().toSet
      assert(pp === brute, s"prefix-filtered join diverged at t=$t")
      if (t <= 0.6) assert(brute.nonEmpty)
    }
    // degenerate texts (normalized shorter than one shingle): empty-set
    // convention pairs them at 1.0 with each other only
    val degen = Seq((1L, "ab"), (2L, "  cd  "), (3L, ""),
      (4L, "a normal length document about prefix filtering"))
      .toDF("doc_id", "text")
    val dp = Dedup.jaccardPairs(degen, "doc_id", "text", 5, 0.7,
      Dedup.Contract.Off).as[(Long, Long, Double)].collect().toSet
    assert(dp === Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)))
    // contraction parity on a clone-heavy corpus: same pair set, and star
    // edges resolve to the same components as the expanded list
    val clones = planted.as[(Long, String)].collect().flatMap {
      case (id, t) => (0 until 8).map(k => (id + 1000000L * k, t))
    }.toSeq.toDF("doc_id", "text")
    val exp = Dedup.jaccardPairs(clones, "doc_id", "text", 5, 0.6,
      Dedup.Contract.Off).as[(Long, Long, Double)].collect().toSet
    val con = Dedup.jaccardPairs(clones, "doc_id", "text", 5, 0.6,
      Dedup.Contract.On).as[(Long, Long, Double)].collect().toSet
    assert(con === exp)
    val expComps = Dedup.connectedComponents(
      Dedup.jaccardPairs(clones, "doc_id", "text", 5, 0.6,
        Dedup.Contract.Off).select("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    val starComps = Dedup.connectedComponents(
      Dedup.jaccardEdges(clones, "doc_id", "text", 5, 0.6,
        Dedup.Contract.On)).as[(Long, Long)].collect().toSet
    assert(starComps === expComps)
  }

  test("simhash near-dup pairs include planted mutations, none below") {
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 10)
      .as[(Long, Long, Long)].collect()
    val plantedHits = pairs.count { case (a, b, _) => b == a + 100000L }
    assert(plantedHits >= 8, s"simhash missed planted dups: $plantedHits/10")
    // verify hamming is honest: recompute from signatures
    pairs.foreach { case (a, b, h) =>
      val txt = planted.filter(col("doc_id").isin(a, b))
        .select("text").as[String].collect()
      val hh = java.lang.Long.bitCount(
        TextHash.simhash(txt(0)) ^ TextHash.simhash(txt(1)))
      assert(hh === h)
    }
  }

  test("exact-dup contraction: contracted pair set equals raw on a 50-clone corpus") {
    // duplicate-HEAVY corpus: one doc cloned 50x (the regime contraction
    // exists for), a near-dup mutation of it, an unrelated doc, a pair of
    // identical SHORT texts (below the shingle length — membership decided
    // by the empty-set Jaccard convention), and null-text rows (must stay
    // singletons). Pair sets — ids AND values — must be identical between
    // the contracted default and the raw path.
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val rows =
      (0 until 50).map(i => (1000L + i, baseText)) ++ Seq(
        (2000L, baseText.replaceFirst("quick", "rapid")),
        (3000L, "entirely unrelated content about parquet shuffles and joins"),
        (4000L, "abc"), (4001L, "abc"),
        (5000L, null.asInstanceOf[String]), (5001L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "text")

    def mset(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet

    val mhRaw = mset(Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 5, 0.6,
      contract = Dedup.Contract.Off)
      .withColumn("jaccard", round(col("jaccard"), 9)))
    // default policy is Auto: on this clone-heavy corpus (7 distinct
    // contents / 56 rows) the probe must choose to contract
    val mhCon = mset(Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 5, 0.6)
      .withColumn("jaccard", round(col("jaccard"), 9)))
    assert(mhCon === mhRaw)
    // forced-On path is the same algebra the probe dispatches to
    val mhOn = mset(Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 5, 0.6,
      contract = Dedup.Contract.On)
      .withColumn("jaccard", round(col("jaccard"), 9)))
    assert(mhOn === mhRaw)
    // the 50-clique alone contributes C(50,2) = 1225 pairs
    assert(mhRaw.size >= 1225, s"clique pairs missing: ${mhRaw.size}")
    // short-text clones must pair (empty shingle sets => jaccard 1.0)...
    assert(mhRaw.exists { case (a, b, _) => a == 4000L && b == 4001L })
    // ...and null-text rows must not appear at all
    assert(mhRaw.forall { case (a, b, _) => a < 5000L && b < 5000L })

    val shRaw = mset(Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 6,
      contract = Dedup.Contract.Off))
    val shCon = mset(Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 6,
      contract = Dedup.Contract.On))
    assert(shCon === shRaw)
    assert(shRaw.size >= 1225)

    // embedding variant: 30 identical vectors + a perturbed one + noise
    val r = new scala.util.Random(7)
    val v0 = Array.fill(64)(r.nextFloat() - 0.5f)
    val vrows = (0 until 30).map(i => (100L + i, v0)) ++ Seq(
      (900L, v0.map(x => x + (r.nextFloat() - 0.5f) * 0.02f)),
      (901L, Array.fill(64)(r.nextFloat() - 0.5f)))
    val vdf = vrows.toDF("vec_id", "embedding")
    val cnRaw = mset(Similarity.cosineNearDupPairs(vdf, "vec_id", "embedding",
      dim = 64, threshold = 0.9, bits = 8, tables = 8,
      contract = Dedup.Contract.Off))
    val cnCon = mset(Similarity.cosineNearDupPairs(vdf, "vec_id", "embedding",
      dim = 64, threshold = 0.9, bits = 8, tables = 8))
    assert(cnCon === cnRaw)
    assert(cnRaw.size >= 435) // C(30,2) within the identical-vector clique
  }

  test("star-edge output: components match the expanded pair path, linear in clones") {
    // Two exact-dup cliques whose reps are near-dups of EACH OTHER (one
    // word apart): the component spans both cliques, so star mode must
    // stitch member→rep stars together with the cross-clique rep pair —
    // the exact topology the expanded path reaches via a 40×25 complete
    // bipartite blow-up. Plus a short-text clique (empty-shingle
    // convention), an unrelated singleton, and null-text rows (must stay
    // out of both outputs).
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val rows =
      (0 until 40).map(i => (1000L + i, baseText)) ++
        (0 until 25).map(i => (2000L + i, baseText.replaceFirst("quick", "rapid"))) ++
        Seq((3000L, "entirely unrelated content about parquet shuffles and joins"),
          (4000L, "abc"), (4001L, "abc"),
          (5000L, null.asInstanceOf[String]), (5001L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "text")

    def labels(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mhPairs = Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 5, 0.6,
      contract = Dedup.Contract.On)
    val mhEdges = Dedup.minhashEdges(df, "doc_id", "text", 64, 16, 5, 0.6,
      contract = Dedup.Contract.On)
    val mhLabels = labels(mhEdges)
    assert(mhLabels === labels(mhPairs))
    // the merged A∪B component labels by the global min id
    assert(mhLabels(2024L) === 1000L)
    // LINEARITY — the point of the mode: the expanded path pays
    // C(40,2) + C(25,2) + 40×25 = 2080 pairs for the two cliques alone;
    // the star output is one edge per clone + one rep pair + the
    // short-text pair
    val nPairs = mhPairs.count()
    val nEdges = mhEdges.count()
    assert(nPairs >= 2080L, s"expanded pair count: $nPairs")
    assert(nEdges <= 67L, s"star edge count not linear: $nEdges")

    // raw (duplicate-light) path: edges mode degrades to the pair list
    val mhRawEdges = Dedup.minhashEdges(df, "doc_id", "text", 64, 16, 5, 0.6,
      contract = Dedup.Contract.Off)
    assert(labels(mhRawEdges) === mhLabels)

    assert(labels(Dedup.simhashEdges(df, "doc_id", "text", maxHamming = 6,
      contract = Dedup.Contract.On)) ===
      labels(Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 6,
        contract = Dedup.Contract.On)))

    // winnow: the fingerprint floor gates short docs out of BOTH outputs
    assert(labels(Dedup.winnowEdges(df, "doc_id", "text",
      contract = Dedup.Contract.On)) ===
      labels(Dedup.winnowPairs(df, "doc_id", "text",
        contract = Dedup.Contract.On)))

    // exact jaccard: star edges (contraction ON) vs the expanded pair
    // list on the RAW path (contraction OFF) — the two legs share no
    // code past the threshold, and the family is deterministic, so the
    // label maps must be equal exactly
    assert(labels(Dedup.jaccardEdges(df, "doc_id", "text", shingle = 5,
      threshold = 0.6, contract = Dedup.Contract.On)) ===
      labels(Dedup.jaccardPairs(df, "doc_id", "text", shingle = 5,
        threshold = 0.6, contract = Dedup.Contract.Off)))

    // embedding family: identical-vector clique + perturbed near-dup
    val r = new scala.util.Random(7)
    val v0 = Array.fill(64)(r.nextFloat() - 0.5f)
    val vrows = (0 until 30).map(i => (100L + i, v0)) ++ Seq(
      (900L, v0.map(x => x + (r.nextFloat() - 0.5f) * 0.02f)),
      (901L, Array.fill(64)(r.nextFloat() - 0.5f)))
    val vdf = vrows.toDF("vec_id", "embedding")
    assert(labels(Similarity.cosineNearDupEdges(vdf, "vec_id", "embedding",
      dim = 64, threshold = 0.9, bits = 8, tables = 8,
      contract = Dedup.Contract.On)) ===
      labels(Similarity.cosineNearDupPairs(vdf, "vec_id", "embedding",
        dim = 64, threshold = 0.9, bits = 8, tables = 8,
        contract = Dedup.Contract.On)))

    // exact-dup star edges: components are exactly the md5 groups > 1
    val exact = Dedup.connectedComponents(
      Dedup.exactDupEdges(df, "doc_id", md5(col("text"))))
      .groupBy(col("comp")).agg(count(lit(1)).as("n"))
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    assert(exact === Set((1000L, 40L), (2000L, 25L), (4000L, 2L)))
  }

  test("winnow df cap counts distinct content on BOTH paths (no recall hole)") {
    // 25 clones of one long doc + 2 distinct docs. With a row-counted cap
    // (rounds <= 7, raw path) every clone fingerprint had df=25 > maxDf=20
    // and the cap dropped ALL copy signal — a recall hole, not a cost
    // issue. The cap now counts df over DISTINCT content (df=1 here) on
    // the raw path too, so both paths recover every clone pair with the
    // rep's exact fingerprint-set size as the shared count, and the
    // contraction decision is purely cost.
    val baseText = ("winnowing detects copied passages by fingerprinting " +
      "every window of shingles and keeping the minimum hash of each " +
      "window across the normalized document text for robust matching")
    val rows = (0 until 25).map(i => (100L + i, baseText)) ++ Seq(
      (900L, "completely different content about broadcast joins and parquet"),
      (901L, "another unrelated document concerning shuffle partitions"))
    val df = rows.toDF("doc_id", "text")
    val expected = 25 * 24 / 2
    for (policy <- Seq[Dedup.Contract](Dedup.Contract.Off, Dedup.Contract.On,
        Dedup.Contract.Auto())) {
      val got = Dedup.winnowPairs(df, "doc_id", "text", contract = policy)
        .select("id_a", "id_b", "shared_fps")
        .as[(Long, Long, Long)].collect()
      assert(got.length === expected, s"policy $policy got ${got.length} pairs")
      // every clone pair shares the identical (rep-level) fingerprint count
      assert(got.map(_._3).distinct.length === 1, s"policy $policy")
      assert(got.forall { case (a, b, n) => a >= 100L && b < 900L && n >= 10 },
        s"policy $policy")
    }
  }

  test("winnow raw path keeps a localized clone group in a distinct-heavy corpus") {
    // The ADVICE round-7 regression case: 30 clones among ~1000 distinct
    // docs. The global distinct ratio (~0.97) is above Auto's 0.95 cutoff,
    // so Auto stays on the raw path — which must STILL emit the clone
    // pairs now that df is counted over distinct content there too.
    val baseText = ("a sufficiently long copied passage that the winnow " +
      "fingerprinting pipeline can index reliably across every window " +
      "position of the normalized text for copy detection purposes")
    val distinct = (0 until 1000).map(i =>
      (i.toLong, s"unique filler document number $i talking about topic " +
        s"${i * 37} with extra distinct content ${i * 101} and more text " +
        s"padding ${i * 13} to clear the minimum shared fingerprint floor"))
    val clones = (0 until 30).map(i => (5000L + i, baseText))
    val df = (distinct ++ clones).toDF("doc_id", "text")
    // sanity: Auto must pick the RAW path here (ratio ~0.97 > 0.95)
    val auto = Dedup.winnowPairs(df, "doc_id", "text")
      .filter(col("id_a") >= 5000L)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(auto.length === 30 * 29 / 2, s"got ${auto.length} clone pairs")
    // and explicitly-raw matches explicitly-contracted on the full output
    val raw = Dedup.winnowPairs(df, "doc_id", "text",
      contract = Dedup.Contract.Off).select("id_a", "id_b", "shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    val con = Dedup.winnowPairs(df, "doc_id", "text",
      contract = Dedup.Contract.On).select("id_a", "id_b", "shared_fps")
      .as[(Long, Long, Long)].collect().toSet
    assert(raw === con)
  }

  test("sliced brute near-dup: exact slice semantics + LSH cross-check on the slice") {
    val r = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(r.nextFloat() - 0.5f)
    val v0 = vec()
    // 1100 rows; ids 0 and 100 are clones (both ≡ 0 mod the step below)
    val rows = Seq((0L, v0), (100L, v0.clone())) ++
      (1L until 1100L).filter(_ != 100L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    // n=1100, maxRows=256 → step = 4; slice = ids ≡ 0 (mod 4)
    val sliced = Similarity.bruteNearDupPairsSliced(df, "vec_id", "embedding",
      threshold = 0.9, maxRows = 256L)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val manual = Similarity.bruteNearDupPairs(
      df.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
      threshold = 0.9)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(sliced === manual)
    assert(sliced.exists { case (a, b, _) => a == 0L && b == 100L })
    // LSH scale path on the SAME slice: sound (subset with equal sims)
    // and recovers the planted clone pair at the near-dup threshold
    val lsh = Similarity.cosineNearDupPairs(df.filter(col("vec_id") % 4 === 0),
      "vec_id", "embedding", dim = 64, threshold = 0.9, bits = 4, tables = 8)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(sliced), s"LSH emitted pairs outside brute: ${lsh.diff(sliced)}")
    assert(lsh.exists { case (a, b, _) => a == 0L && b == 100L })
    // at or below maxRows the slice is the whole corpus
    val small = df.filter(col("vec_id") < 200)
    val wholeSliced = Similarity.bruteNearDupPairsSliced(small, "vec_id",
      "embedding", threshold = 0.9, maxRows = 256L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val whole = Similarity.bruteNearDupPairs(small, "vec_id", "embedding",
      threshold = 0.9).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wholeSliced === whole)
  }

  test("slicedById: identity at/below maxRows, modulo slice above, loud guard") {
    // identity: n <= maxRows returns the input unchanged (no extra jobs)
    val small = spark.range(100).toDF("doc_id")
    assert(Dedup.slicedById(small, "doc_id", 200L).count() === 100L)
    // step path: n=1000, maxRows=250 → step 4 → ids ≡ 0 (mod 4)
    val big = spark.range(1000).toDF("doc_id")
    val got = Dedup.slicedById(big, "doc_id", 250L)
      .as[Long].collect().toSet
    assert(got === (0L until 1000L by 4).toSet)
    // key-shifted clone copies (offsets that are multiples of the step)
    // land uniformly — the slice keeps every copy's residue class
    val shifted = spark.range(1000).toDF("doc_id")
      .union(spark.range(1000).toDF("doc_id")
        .select((col("doc_id") + 100000000L).as("doc_id")))
    val sh = Dedup.slicedById(shifted, "doc_id", 250L).as[Long].collect()
    assert(sh.count(_ >= 100000000L) > 0 && sh.count(_ < 100000000L) > 0)
    // guard: an all-odd id space misses the stride entirely → throws
    // (silent degradation would make the certificate trivially green)
    val odd = spark.range(1000).toDF("doc_id")
      .select((col("doc_id") * 2 + 1).as("doc_id"))
    intercept[IllegalStateException] {
      Dedup.slicedById(odd, "doc_id", 250L)
    }
  }

  test("cosine near-dup: all-zero vectors (NaN sim) are excluded on every path") {
    // Spark orders NaN above every number, so `sim >= threshold` alone
    // would EMIT zero-vector pairs; the explicit !isnan guard must drop
    // them on the raw path and the contraction self-pair path alike.
    val zero = Array.fill(8)(0f)
    val unit = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val df = Seq((1L, zero), (2L, zero), (3L, unit), (4L, unit.map(_ * 2f)))
      .toDF("vec_id", "embedding")
    for (c <- Seq[Dedup.Contract](Dedup.Contract.Off, Dedup.Contract.On)) {
      val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dim = 8, threshold = 0.5, bits = 4, tables = 4, contract = c)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs === Set((3L, 4L)), s"policy $c emitted $pairs")
    }
  }

  test("fingerprint64 is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, " hello\tworld \n"),
      (4L, "hello worlds")).toDF("doc_id", "text")
    val fps = df.select(fingerprint64(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1) && fps(1) === fps(2))
    assert(fps(3) !== fps(0))
  }

  test("langid: script detection + stopword voting on real sentences") {
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and it is not tired."),
      ("de", "Der schnelle braune Fuchs springt über den faulen Hund und ist nicht müde."),
      ("fr", "Le renard brun rapide saute sur le chien paresseux et il n'est pas fatigué dans la forêt."),
      ("es", "El zorro marrón salta sobre el perro perezoso y no está cansado en el bosque."),
      ("pt", "A raposa marrom salta sobre o cão preguiçoso e não está cansada para a floresta."),
      ("zh", "敏捷的棕色狐狸跳过了懒惰的狗，它一点也不累。"),
      ("ja", "素早い茶色のキツネはのろまな犬を飛び越えます、つかれていません。"),
      ("ru", "Быстрая коричневая лиса перепрыгивает через ленивую собаку и не устала."))
    samples.foreach { case (expected, text) =>
      assert(LangProfiles.detect(text) === expected, text)
    }
    // through the Column API too
    val preds = samples.toDF("lang", "text")
      .select(col("lang"), langid(col("text")).as("pred"))
      .filter(col("lang") === col("pred")).count()
    assert(preds === samples.size)
  }

  test("winnow fingerprints: shared substrings share fingerprints") {
    val a = "the common substring that is long enough to matter here"
    val b = "prefix text then the common substring that is long enough to matter here suffix"
    val fa = TextHash.winnow(a, 5, 4).toSet
    val fb = TextHash.winnow(b, 5, 4).toSet
    assert(fa.intersect(fb).size >= fa.size / 2)
    val c = "completely unrelated content with different words entirely"
    assert(TextHash.winnow(c, 5, 4).toSet.intersect(fa).size <= 1)
  }

  test("ANN LSH finds planted high-similarity neighbours (top-1 recall >= 90%)") {
    // iid-random corpus vectors have top-1 cosine ~0.4 where hyperplane LSH
    // has no signal by construction; the operator's contract is the
    // near-duplicate regime. Plant 20 perturbed copies (cosine ~0.99) as
    // queries and require ANN to recover the source among 500 distractors.
    val sources = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val perturbed = sources.toSeq.map { case (id, v) =>
      val r = new scala.util.Random(id)
      (id + 10000L, v.map(x => x + (r.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
    val ann = Similarity.annJoin(perturbed, emb, "vec_id", "embedding",
      dim = 64, k = 1, bits = 12, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = sources.count { case (id, _) => ann.get(id + 10000L).contains(id) }
    assert(hits >= 18, s"ANN top-1 recall $hits/20")
  }

  test("connected components: transitive chains and isolated pairs") {
    // path 1-2-3-4 (diameter 3), pair 7-8, triangle 10-11-12: min-label
    // propagation must close transitively, not just within cliques
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L),
      (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(comp(7L) === 7L && comp(8L) === 7L)
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
  }

  test("connected components: 60-link chain converges in O(log n) rounds") {
    // a duplication chain of diameter 59 — label propagation needs 59
    // rounds (and used to silently split it at maxIter=10); large-star/
    // small-star contraction closes it in a handful of rounds. The worst
    // orientation (descending ids) exercises both star directions.
    val chain = (1 to 59).map(i => (100L - i, 100L - i - 1)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponentsResult(chain, maxIter = 20)
    assert(r.converged, s"not converged after ${r.rounds} rounds")
    assert(r.rounds <= 10, s"took ${r.rounds} rounds for a 60-node chain")
    val comp = r.labels.as[(Long, Long)].collect().toMap
    assert(comp.size === 60)
    assert((40L to 99L).forall(comp(_) == 40L))
  }

  test("soundness-certificate recomputes agree with the custom expressions and catch violations") {
    import graft.operators.PipelineQueries
    // independent built-in shingle Jaccard vs the custom hashed-shingle
    // expression: equal (within collision margin) on near-dups, and the
    // certificate-side value is LOW on unrelated texts — i.e. an unsound
    // emitted pair would be counted as a violation, not waved through
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick  brown fox JUMPS over the lazy dog again and again"),
      (3L, "entirely unrelated content speaking of parquet shuffles only"))
      .toDF("id", "text")
    val a = df.select(col("id").as("ia"), col("text").as("ta"))
    val b = df.select(col("id").as("ib"), col("text").as("tb"))
    val both = PipelineQueries.appendShingleSet(PipelineQueries.appendShingleSet(
        a.crossJoin(b).filter(col("ia") < col("ib")),
        "ta", "sa", 5), "tb", "sb", 5)
      .select(col("ia"), col("ib"),
        PipelineQueries.jaccardFromSets(col("sa"), col("sb")).as("jb"),
        graft.pipeline.TextFunctions.jaccard_shingle(
          col("ta"), col("tb"), 5).as("jc"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    both.values.foreach { case (jb, jc) =>
      assert(math.abs(jb - jc) < 0.01, s"builtin $jb vs custom $jc") }
    assert(both((1L, 2L))._1 > 0.9)
    assert(both((1L, 3L))._1 < 0.2, "certificate must flag unrelated pairs")
    // HOF cosine (zip_with/aggregate) vs the codegen'd CosineSim: same
    // fold order => bit-identical doubles
    val vecs = emb.limit(5).select(col("vec_id"), col("embedding"))
    val va = vecs.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val vb = vecs.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val diffs = va.crossJoin(vb).filter(col("ia") < col("ib"))
      .select(abs(PipelineQueries.hofCosine(col("va"), col("vb")) -
        graft.pipeline.Similarity.cosine(col("va"), col("vb"))).as("d"))
      .agg(max(col("d"))).collect()(0).getDouble(0)
    assert(diffs === 0.0, s"HOF vs codegen cosine diverged by $diffs")
  }

  test("connected components: strict wrapper throws when capped below convergence") {
    val chain = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1)
    }
  }

  test("IVF ANN finds planted high-similarity neighbours (top-1 recall >= 90%)") {
    // same planted-near-duplicate regime as the LSH test: a perturbed
    // copy (cosine ~0.99) lands in the same coarse cell as its source
    // almost surely, and probing nprobe cells covers boundary cases
    val sources = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val perturbed = sources.toSeq.map { case (id, v) =>
      val r = new scala.util.Random(id)
      (id + 10000L, v.map(x => x + (r.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
    val ivf = Similarity.ivfJoin(perturbed, emb, "vec_id", "embedding",
      k = 1, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = sources.count { case (id, _) => ivf.get(id + 10000L).contains(id) }
    assert(hits >= 18, s"IVF top-1 recall $hits/20")
  }

  test("filteredIvfJoin: hits satisfy the predicate; true-predicate ≡ ivfJoin") {
    val qs = emb.filter(col("vec_id") < 10)
    val pred = col("label") === 3
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val hits = Similarity.filteredIvfJoin(qs, emb, "vec_id", "embedding",
      pred, k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(hits.nonEmpty)
    hits.foreach { case (q, n) =>
      assert(labels(n) == 3, s"neighbor $n of query $q violates the predicate")
    }
    // a vacuous predicate must reproduce the unfiltered probe path exactly
    val unf = Similarity.ivfJoin(qs, emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    val vac = Similarity.filteredIvfJoin(qs, emb, "vec_id", "embedding",
      lit(true), k = 5, nlist = 16, nprobe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    assert(vac == unf)
  }

  test("filteredTopKAuto dispatches by the memoized selectivity probe") {
    val qs = emb.filter(col("vec_id") < 5)
    // exact fraction of label=3 rows drives both assertions below
    val n = emb.count()
    val n3 = emb.filter(col("label") === 3).count()
    val sel = Similarity.selectivity(emb, col("label") === 3)
    assert(sel == n3.toDouble / n)
    // broad predicate (~10% > 5% default) -> the IVF post-filter path
    val auto = Similarity.filteredTopKAuto(qs, emb, "vec_id", "embedding",
      col("label") === 3, k = 3).orderBy("query_id", "rank").collect().toSeq
    val ivf = Similarity.filteredIvfJoin(qs, emb, "vec_id", "embedding",
      col("label") === 3, k = 3).orderBy("query_id", "rank").collect().toSeq
    assert(auto == ivf)
    // selective conjunction (~1%) -> the exact pre-filter path
    val narrow = col("label") === 3 && col("vec_id") % 11 === 0
    val auto2 = Similarity.filteredTopKAuto(qs, emb, "vec_id", "embedding",
      narrow, k = 3).orderBy("query_id", "rank").collect().toSeq
    val exact = Similarity.filteredKnnJoin(qs, emb, "vec_id", "embedding",
      narrow, k = 3).orderBy("query_id", "rank").collect().toSeq
    assert(auto2 == exact)
    assert(Similarity.selectivity(emb, narrow) < 0.05)
  }

  test("cosine HOF matches scala computation") {
    val rows = emb.limit(3).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val expected = {
      val a = rows(0)._2.map(_.toDouble); val b = rows(1)._2.map(_.toDouble)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = emb.filter(col("vec_id") === rows(0)._1)
      .crossJoin(emb.filter(col("vec_id") === rows(1)._1)
        .select(col("embedding").as("b")))
      .select(Similarity.cosine(col("embedding"), col("b"))).as[Double]
      .collect()(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("multimodal decode: real PNG via ImageIO — dims, frames, histogram") {
    // generate a real 20x10 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq((1L, "image/png", png),
      (2L, "text/plain", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val decoded = Multimodal.decode(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val real = decoded(1L)
    assert(real.getAs[Int]("width") === 20)
    assert(real.getAs[Int]("height") === 10)
    assert(real.getAs[Int]("n_frames") === 1)
    assert(real.getAs[Long]("n_bytes") === png.length.toLong)
    val hist = real.getSeq[Float](real.fieldIndex("feature"))
    // half black (bin 0), half white (bin 7), nothing in between
    assert(math.abs(hist(0) - 0.5f) < 1e-6)
    assert(math.abs(hist(7) - 0.5f) < 1e-6)
    assert((1 to 6).forall(hist(_) === 0f))
    // non-image payload falls back to the deterministic stub
    val stub = decoded(2L)
    assert(stub.getAs[Int]("width") === "not an image".length % 640)
  }

  test("cosine near-dup pairs: LSH subset of brute, planted recall >= 90%") {
    // plant 20 perturbed copies (cosine ~0.99 with their source) among the
    // 500-vector corpus; at threshold .9 the only qualifying pairs are
    // (source, copy), so brute finds exactly those and LSH must recover
    // nearly all of them
    val sources = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val perturbed = sources.toSeq.map { case (id, v) =>
      val r = new scala.util.Random(id)
      (id + 10000L, v.map(x => x + (r.nextFloat() - 0.5f) * 0.05f))
    }
    val corpus = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val all = (corpus ++ perturbed).toDF("vec_id", "embedding")
    val brute = Similarity.bruteNearDupPairs(all, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size >= 18, s"planted pairs not above threshold: ${brute.size}")
    assert(brute.forall { case (a, b) => b == a + 10000L })
    val lsh = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9, bits = 8, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact refine makes LSH ⊆ brute always; recall is the LSH knob
    assert(lsh.subsetOf(brute))
    assert(lsh.size >= brute.size * 9 / 10,
      s"LSH near-dup recall too low: ${lsh.size}/${brute.size}")
  }

  test("multimodal resize: real image redrawn to fit, stub metadata-only") {
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val stubBytes = ("x" * 700).getBytes("UTF-8") // stub: w=700%640=60, h=700%480=220
    val media = Seq((1L, "image/png", png), (2L, "text/plain", stubBytes))
      .toDF("media_id", "media_type", "payload")
    val resized = Multimodal.resize(Multimodal.decode(media), 8, 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // real image 20x10 fit into 8x8: scale = min(8/20, 8/10, 1) = 0.4 -> 8x4
    val real = resized(1L)
    assert(real.getAs[Int]("out_width") === 8)
    assert(real.getAs[Int]("out_height") === 4)
    val outImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real.getAs[Array[Byte]]("out_payload")))
    assert(outImg.getWidth === 8 && outImg.getHeight === 4)
    // stub 60x220 fit into 8x8: scale = min(8/60, 8/220, 1) = 8/220
    val stub = resized(2L)
    assert(stub.getAs[Int]("out_width") ===
      math.max(1, math.floor(60 * (8.0 / 220)).toInt))
    assert(stub.getAs[Int]("out_height") === 8)
    // stub path keeps the original bytes
    assert(stub.getAs[Array[Byte]]("out_payload").sameElements(stubBytes))
  }

  test("multimodal frame sampling: stride, counts, byte slices") {
    // media_id=9 -> (9%30)+1 = 10 frames; 100-byte payload -> k=10
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val media = Seq((9L, "video/stub", payload))
      .toDF("media_id", "media_type", "payload")
    val frames = Multimodal.sampleFrames(Multimodal.decode(media), stride = 3)
      .collect().map(r => r.getInt(1) -> r.getAs[Array[Byte]](2)).toMap
    // sampled indexes: 0, 3, 6, 9
    assert(frames.keySet === Set(0, 3, 6, 9))
    assert(frames.values.forall(_.length === 10))
    assert(frames(0).sameElements(payload.slice(0, 10)))
    assert(frames(3).sameElements(payload.slice(30, 40)))
    assert(frames(9).sameElements(payload.slice(90, 100)))
  }

  test("multimodal decode: schema contract, null payloads, batch shape") {
    val media = Multimodal.fromDocuments(docs.limit(100))
      .union(Seq((999999L, "image/stub", null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "media_type", "payload"))
    val decoded = Multimodal.decode(media, batchSize = 7) // odd batch size
    assert(decoded.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "payload", "n_bytes", "width", "height",
        "n_frames", "feature"))
    assert(decoded.count() === 101)
    val nullRow = decoded.filter(col("media_id") === 999999L).collect()(0)
    assert(nullRow.getAs[Long]("n_bytes") === 0L)
    assert(nullRow.getAs[Seq[Float]]("feature").forall(_ === 0f))
    // features deterministic: same payload -> same features on re-run
    val f1 = decoded.orderBy("media_id").select("feature").collect()
    val f2 = Multimodal.decode(media, batchSize = 64)
      .orderBy("media_id").select("feature").collect()
    assert(f1.sameElements(f2) ||
      f1.zip(f2).forall { case (a, b) =>
        a.getSeq[Float](0) == b.getSeq[Float](0) })
  }

  test("duplicate-ratio probe memoizes across fresh reads of the same table") {
    val n0 = Dedup.ratioCacheSize
    // two SEPARATE spark.read plans over the same parquet — the probe
    // must run once, not once per DataFrame instance
    Dedup.minhashPairs(Tables.documents(spark, sf("sf0.001")),
      "doc_id", "text").count()
    val n1 = Dedup.ratioCacheSize
    Dedup.minhashPairs(Tables.documents(spark, sf("sf0.001")),
      "doc_id", "text").count()
    val n2 = Dedup.ratioCacheSize
    // <= 1 (not == 1): an earlier test in the suite may already have
    // probed this table, which is itself the memoization working
    assert(n1 - n0 <= 1, s"first call added ${n1 - n0} entries")
    assert(n2 === n1, s"second call over the same table re-probed " +
      s"(cache ${n1} -> ${n2}) — semanticHash unstable across reads")
    // and the cache must actually hold something for the hit to mean
    // anything (guards against the probe silently not running at all)
    assert(n2 >= 1)
  }

  test("duplicate-ratio probe distinguishes same-schema tables at different paths") {
    // Two parquet tables with IDENTICAL schemas but opposite duplicate
    // profiles. LogicalRelation's plan STRING prints only schema+format
    // (never the path), so a key built from the canonicalized plan text
    // alone would deterministically collide and reuse the first table's
    // ratio for the second — mis-picking the contraction path (the
    // round-8 review finding; the key now folds in the leaf relation
    // root paths).
    val dir = java.nio.file.Files.createTempDirectory("ratio").toString
    (0 until 200).map(i => (i.toLong, s"unique document number $i"))
      .toDF("doc_id", "text").write.parquet(s"$dir/distinct")
    (0 until 200).map(i => (i.toLong, "the same cloned text every time"))
      .toDF("doc_id", "text").write.parquet(s"$dir/clones")
    val rDistinct = Dedup.distinctRatio(
      spark.read.parquet(s"$dir/distinct"), col("text"))
    val rClones = Dedup.distinctRatio(
      spark.read.parquet(s"$dir/clones"), col("text"))
    assert(rDistinct > 0.9, s"distinct table probed ratio $rDistinct")
    assert(rClones < 0.1,
      s"clone table probed ratio $rClones — same-schema table at a " +
        "different path reused the first table's memoized ratio")
  }

  test("cache generation propagates to worker threads via runWithGen") {
    import graft.pipeline.Caches
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Caches.withGeneration {
      val g = Caches.capturedGen
      assert(g != null, "generation must be set inside withGeneration")
      // a bare Future thread sees NO generation; runWithGen installs it
      val (bare, propagated) = Await.result(
        Future((Caches.capturedGen, Caches.runWithGen(g)(Caches.capturedGen))),
        Duration.Inf)
      assert(bare == null, "ThreadLocal must not leak to the pool by itself")
      assert(propagated === g, "runWithGen must install the captured gen")
    }
    assert(Caches.capturedGen == null, "generation must clear on exit")
  }

  test("Caches.release evicts every internal persist (serving stability)") {
    // the round-6 #8 contract: a serving session running near-dup queries
    // and releasing at request boundaries must not accumulate cache
    // entries — assert actual storage state, not just tracker behavior
    graft.pipeline.Caches.release() // start clean
    (1 to 3).foreach { _ =>
      Dedup.minhashPairs(docs, "doc_id", "text").count()
      Dedup.simhashPairs(docs, "doc_id", "text").count()
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.95).count()
      graft.pipeline.Caches.release()
    }
    // unpersist(blocking=false) is async; poll briefly for drain
    val deadline = System.currentTimeMillis() + 10000
    def persisted = spark.sparkContext.getPersistentRDDs
    while (persisted.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(persisted.isEmpty,
      s"leaked caches after release: ${persisted.values.map(_.name)}")
  }

  test("winnowPairsShared: memo survives release; invalidateStats evicts") {
    graft.pipeline.Dedup.invalidateStats() // hermetic
    val p1 = Dedup.winnowPairsShared(docs, "doc_id", "text")
    assert(Dedup.winnowPairsShared(docs, "doc_id", "text") eq p1,
      "same plan+params must return the SAME persisted pair list")
    // the memo deliberately outlives the per-query cache release — that
    // is what lets the pairs gate and the _sound certificate share one
    // fingerprint pass across separate queries
    graft.pipeline.Caches.release()
    assert(Dedup.winnowPairsShared(docs, "doc_id", "text") eq p1)
    assert(p1.storageLevel.useMemory || p1.storageLevel.useDisk)
    // rows equal the unshared operator's
    assert(p1.collect().toSet ===
      Dedup.winnowPairs(docs, "doc_id", "text").collect().toSet)
    graft.pipeline.Dedup.invalidateStats()
    assert(p1.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "invalidateStats must unpersist memoized pair lists")
    assert(!(Dedup.winnowPairsShared(docs, "doc_id", "text") eq p1))
    graft.pipeline.Dedup.invalidateStats()
    graft.pipeline.Caches.release()
  }

  test("jaccardBothModesShared: one build feeds both gates; memo lifecycle") {
    graft.pipeline.Dedup.invalidateStats() // hermetic
    val slice = docs.select(col("doc_id"), col("text"))
    val (e1, p1) = Dedup.jaccardBothModesShared(slice, "doc_id", "text")
    val (e2, p2) = Dedup.jaccardBothModesShared(slice, "doc_id", "text")
    assert((e2 eq e1) && (p2 eq p1),
      "same plan+params must return the SAME persisted lists")
    // the memo deliberately outlives the per-query cache release — that
    // is what lets doc_jaccard_pairs and doc_jaccard_clusters_star
    // share one AllPairs candidate pass across separate queries
    graft.pipeline.Caches.release()
    val (e3, p3) = Dedup.jaccardBothModesShared(slice, "doc_id", "text")
    assert((e3 eq e1) && (p3 eq p1))
    assert(p1.storageLevel.useMemory || p1.storageLevel.useDisk)
    assert(e1.storageLevel.useMemory || e1.storageLevel.useDisk)
    // the memoized pair list equals the unshared operator's
    assert(p1.select("id_a", "id_b").collect().toSet ===
      Dedup.jaccardPairs(slice, "doc_id", "text")
        .select("id_a", "id_b").collect().toSet)
    graft.pipeline.Dedup.invalidateStats()
    assert(p1.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "invalidateStats must unpersist memoized pair lists")
    assert(e1.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE)
    assert(!(Dedup.jaccardBothModesShared(slice, "doc_id", "text")._2 eq p1))
    graft.pipeline.Dedup.invalidateStats()
    graft.pipeline.Caches.release()
  }

  test("minhashStarEdgesShared: memo lifecycle (round-17 #3 reuse)") {
    graft.pipeline.Dedup.invalidateStats() // hermetic
    val slice = docs.select(col("doc_id"), col("text"))
    val e1 = Dedup.minhashStarEdgesShared(slice, "doc_id", "text")
    assert(Dedup.minhashStarEdgesShared(slice, "doc_id", "text") eq e1,
      "same plan+params must return the SAME persisted edge list")
    graft.pipeline.Caches.release()
    assert(Dedup.minhashStarEdgesShared(slice, "doc_id", "text") eq e1)
    assert(e1.storageLevel.useMemory || e1.storageLevel.useDisk)
    // different params -> different memo entry, not a stale hit
    val e2 = Dedup.minhashStarEdgesShared(slice, "doc_id", "text", bands = 8)
    assert(!(e2 eq e1))
    graft.pipeline.Dedup.invalidateStats()
    assert(e1.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "invalidateStats must unpersist memoized edge lists")
    graft.pipeline.Dedup.invalidateStats()
    graft.pipeline.Caches.release()
  }

  test("spreadSmall: repartitions unsplittable scans, no-op at full parallelism") {
    import graft.pipeline.Decontaminate
    val oneTask = docs // single parquet file, one row group -> one task
    assert(oneTask.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val spread = Decontaminate.spreadSmall(oneTask, col("doc_id"))
    assert(spread.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(spread.count() === oneTask.count())
    // inputs that already carry their own exchange — an explicit
    // repartition, an aggregate — must come back untouched (same plan
    // object, no shuffle added: the 100 TB contract, and the guard must
    // not probe partitioning via df.rdd, which under AQE would execute
    // the upstream stages)
    val wide = docs.repartition(spark.sparkContext.defaultParallelism)
    assert(Decontaminate.spreadSmall(wide, col("doc_id")) eq wide)
    val derived = docs.groupBy(col("lang")).count()
    assert(Decontaminate.spreadSmall(derived, col("lang")) eq derived)
  }

  test("localComponents: union-find equals distributed CC; admission guard throws") {
    // chains, a clique, isolated pairs, and out-of-order ids
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 11L), (20L, 21L), (30L, 31L),
      (31L, 32L), (32L, 30L), (100L, 7L), (7L, 5L))
      .toDF("id_a", "id_b")
    val local = Dedup.localComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local === dist)
    // min-id labeling: the 5-3-9-11-7-100 chain labels as 3
    assert(local.filter(_._2 == 3L).map(_._1) === Set(3L, 5L, 7L, 9L, 11L, 100L))
    val big = spark.range(10).selectExpr("id AS id_a", "id + 1 AS id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.localComponents(big, maxEdges = 5)
    }
    assert(e.getMessage.contains("bounded certificate slice"))
  }

  test("decontamination: exact gram collisions against a broadcast eval set") {
    import graft.pipeline.Decontaminate
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares one 5-gram
      (2L, "one two three four five six seven"),   // disjoint vocabulary
      (3L, "alpha beta gamma delta epsilon"))      // exactly the gram
      .toDF("doc_id", "text")
    // caps + doubled whitespace: collisions must survive normalization
    val evalSet = Seq((100L, "ALPHA  beta GAMMA delta epsilon tail"))
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(train, evalSet, "doc_id", "text", n = 5)
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: grams {alpha..epsilon, beta..zeta} -> 2 distinct, 1 hit;
    // doc 3: single gram, hit; doc 2: three grams, zero hits -> absent
    assert(got === Map(1L -> ((2L, 1L)), 3L -> ((1L, 1L))))
    // the 100 TB shape: the eval gram set must arrive by broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"eval gram set not broadcast:\n$plan")
    // the hashed probe (8-byte keys, the at-scale variant) must agree
    // with the exact-string form — here and on the real corpus
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(Decontaminate.overlap(train, evalSet, "doc_id", "text",
      n = 5, hashed = true)) === rows(out))
    val de = docs.filter(col("doc_id") % 97L === 0L)
    val dt = docs.filter(col("doc_id") % 97L =!= 0L)
    assert(rows(Decontaminate.overlap(dt, de, "doc_id", "text",
        n = 5, hashed = true)) ===
      rows(Decontaminate.overlap(dt, de, "doc_id", "text", n = 5)))
  }

  test("substring dedup: strided-window attribution matches a scala oracle") {
    import graft.pipeline.Decontaminate
    // non-periodic base text (stride/window shifts never realign it)
    val a = (0 until 100).map(i => ('a' + (i * i + 3 * i) % 26).toChar)
      .mkString
    val corpus = Seq(
      (1L, a),                           // owner
      (2L, a),                           // full clone -> dup_frac 1.0
      (3L, a + "0123456789" * 4),        // clone + unique 40-char tail
      (4L, a.substring(10, 45)),         // 35 shared chars < window: clean
      (5L, "Z" * 39))                    // below one window: no rows at all
      .toDF("doc_id", "text")
    val got = Dedup.substringDup(corpus, "doc_id", "text", 40, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // scala oracle: same window grid, min-id owner per window string
    val texts = Map(1L -> a, 2L -> a, 3L -> (a + "0123456789" * 4),
      4L -> a.substring(10, 45).toLowerCase, 5L -> "z" * 39)
    val wins = texts.toSeq.flatMap { case (id, t) =>
      (1 to (t.length - 39) by 20).map(p => (id, t.substring(p - 1, p + 39)))
    }
    val owner = wins.groupBy(_._2).map { case (w, occ) =>
      w -> occ.map(_._1).min }
    val want = wins.groupBy(_._1).flatMap { case (id, occ) =>
      val dup = occ.count { case (_, w) => owner(w) < id }
      if (dup > 0) Some((id, occ.size.toLong, dup.toLong)) else None
    }.toSet
    assert(got.toSet === want)
    assert(want.map(_._1) === Set(2L, 3L),
      "construction: clone + tail-carrier flagged, owner/short/sub-window clean")
    // the hashed probe (8-byte window keys, the at-scale variant) must
    // agree with the exact-string form — on the fixture and the corpus
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(Dedup.substringDup(corpus, "doc_id", "text", 40, 20,
      hashed = true)) === got.toSet)
    assert(rows(Dedup.substringDup(docs, "doc_id", "text", 40, 20,
        hashed = true)) ===
      rows(Dedup.substringDup(docs, "doc_id", "text", 40, 20)))
  }

  test("pii redaction: categories, order, and the octet-bound edge") {
    import graft.pipeline.Redact
    val rows = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk and x@y.io now"),
      (2L, "host 10.0.0.7 bad 10.0.0.300 also 256.1.1.1"),
      (3L, "ssn 123-45-6789 phone 555-867-5309 dotted 555.867.5309"),
      (4L, "clean text no pii at all"),
      (5L, "digits 1234-56-7890 not ssn; 12-345-6789 neither"))
      .toDF("id", "t")
      .select(col("id"), Redact.redact(col("t")).as("r"),
        Redact.countOf(col("t"), "email").as("ne"),
        Redact.countOf(col("t"), "ip").as("ni"),
        Redact.countOf(col("t"), "ssn").as("ns"),
        Redact.countOf(col("t"), "phone").as("np"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5)))).toMap
    assert(rows(1L) === (("mail <EMAIL> and <EMAIL> now", 2, 0, 0, 0)))
    // 10.0.0.300: no \b between the matched octet prefix and the
    // trailing digit, so NOT an IP (and not partially redacted);
    // 256.1.1.1: first octet out of range, the tail 56.1.1.1 has no
    // left word boundary -> no match
    assert(rows(2L) === (("host <IP> bad 10.0.0.300 also 256.1.1.1",
      0, 1, 0, 0)))
    assert(rows(3L) ===
      (("ssn <SSN> phone <PHONE> dotted <PHONE>", 0, 0, 1, 2)))
    assert(rows(4L) === (("clean text no pii at all", 0, 0, 0, 0)))
    // \b guards: over-long groups match nothing
    assert(rows(5L) ===
      (("digits 1234-56-7890 not ssn; 12-345-6789 neither", 0, 0, 0, 0)))
  }

  test("sampling: hash-threshold determinism, nesting, exact quotas") {
    import graft.pipeline.Sample
    val df = docs.select(col("doc_id"), col("lang"))
    val s10 = Sample.byHash(df, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    // deterministic: same rows on re-evaluation
    assert(Sample.byHash(df, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet === s10)
    // monotone nesting: a smaller fraction is a subset
    val s05 = Sample.byHash(df, col("doc_id"), 0.05)
      .select("doc_id").as[Long].collect().toSet
    assert(s05.subsetOf(s10))
    // binomial band: 10% ± wide slack on the fixture corpus
    val n = df.count().toDouble
    assert(s10.size > n * 0.03 && s10.size < n * 0.25,
      s"kept ${s10.size} of $n at frac 0.1")
    // quota-exact stratified: per-stratum counts hit ceil(frac * n)
    val kept = Sample.stratifiedExact(df, col("lang"), col("doc_id"), 0.2)
      .groupBy(col("lang")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = df.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      assert(kept(lang) === math.ceil(tot * 0.2).toLong,
        s"stratum $lang: ${kept(lang)} of $tot")
    }
    // deterministic under re-evaluation (hash order + key tiebreak)
    val a = Sample.stratifiedExact(df, col("lang"), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sample.stratifiedExact(df, col("lang"), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("pq: reconstruction beats the grand-mean baseline; ADC deterministic") {
    import graft.pipeline.Pq
    val dim = 64
    val model = Pq.train(emb, "vec_id", "embedding", dim, m = 8, k = 16)
    assert(model.books.length === 8 && model.books.forall(_.length === 16))
    // quantization error must beat the trivial 1-centroid quantizer
    // (the grand mean) — the minimum bar for a trained codebook
    def mse(approx: org.apache.spark.sql.Column): Double =
      emb.select(avg(aggregate(zip_with(col("embedding"), approx,
        (x, y) => (x - y) * (x - y)), lit(0.0d), (a, x) => a + x)))
        .collect()(0).getDouble(0)
    val pqMse = mse(Pq.decode(Pq.encode(col("embedding"), model), model))
    val meanVec = emb
      .select(posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy("p").agg(avg(col("x").cast("double")).as("m"))
      .orderBy("p").collect().map(_.getDouble(1).toFloat)
    val baseMse = mse(array(meanVec.map(lit(_)): _*))
    assert(pqMse < baseMse * 0.8,
      s"codebook must beat the grand mean: pq=$pqMse base=$baseMse")
    // deterministic end to end: same training, same codes, same top-k
    val a = Pq.adcTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(3))).toSet
    val b = Pq.adcTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(3))).toSet
    assert(a === b && a.nonEmpty)
    // IVF-PQ with every cell probed degenerates to PQ-flat EXACTLY —
    // the composition adds routing, never changes scoring
    val full = Pq.ivfPqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim, nlist = 8, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full === a, "nprobe = nlist must equal the flat ADC result")
    // ROUTING pinned directly (the rank-percentile certificate cannot:
    // best-of-a-random-quarter still ranks top ~5%): probeCells must
    // return exactly the top-nprobe cells by centroid dot, recomputed
    // here in plain Scala with the lowest-index tie convention
    val cents = graft.pipeline.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", nlist = 8)
    val vecs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val probed = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), graft.pipeline.Similarity.probeCells(
        col("embedding"), cents, nprobe = 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    vecs.foreach { case (id, v) =>
      val want = cents.zipWithIndex.map { case (c, i) =>
        (-c.zip(v).map { case (y, x) => y.toDouble * x }.sum, i)
      }.sorted.take(3).map(_._2).toList
      assert(probed(id) === want, s"probe cells diverge for query $id")
    }
  }

  test("pca: recovers a planted dominant direction; whitening " +
      "normalizes variance; guards fail loudly") {
    import graft.pipeline.Pca
    // planted corpus: x = s·u + ε with s ~ ±{1..n} large and ε tiny —
    // the top principal axis must align with u
    val dim = 16
    val u = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val nu = math.sqrt(u.map(x => x * x).sum)
    val unit = u.map(_ / nu)
    val rows = (1 to 400).map { i =>
      val s = (if (i % 2 == 0) 1 else -1) * (i / 4.0 + 1.0)
      // deterministic tiny noise; the i*j cross term keeps it full rank
      // (plain cos(ai + bj) decomposes into TWO fixed vectors — a rank-2
      // noise floor that left axes >= 3 exactly degenerate)
      val eps = Array.tabulate(dim)(j =>
        0.01 * math.cos(i * 31 + j * 7 + i * j * 0.618))
      (i.toLong, Array.tabulate(dim)(j => (s * unit(j) + eps(j)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, k = 4)
    val cosTop = math.abs(
      (0 until dim).map(j => m.components(0)(j) * unit(j)).sum)
    assert(cosTop > 0.999, s"top axis must align with the planted u: $cosTop")
    // eigenvalues descending, explained cumulative monotone to <= 1
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.explained(0) > 0.99 && m.explained(3) <= 1.0 + 1e-9)
    // orthonormality of the fitted basis
    for (i <- 0 until m.k; j <- 0 until m.k) {
      val dot = (0 until dim).map(r => m.components(i)(r) *
        m.components(j)(r)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"QQt($i,$j) = $dot")
    }
    // in-engine: whitened axes have ~unit variance (the preconditioner
    // contract), projections obey Bessel on every row
    val w = df.select(Pca.whiten(col("embedding"), m).as("w"))
    val vars = w.select((0 until m.k).map(j =>
        avg(element_at(col("w"), j + 1) *
          element_at(col("w"), j + 1)).as(s"v$j")): _*)
      .head()
    (0 until m.k).foreach { j =>
      val v = vars.getDouble(j)
      assert(math.abs(v - 1.0) < 0.05, s"whitened axis $j variance $v")
    }
    // determinism: same data -> identical model (sign pin included)
    val m2 = Pca.fit(df, "embedding", dim, k = 4)
    assert(m2.components.flatten.toSeq === m.components.flatten.toSeq)
    // degenerate axes whiten to exactly 0, never +-Inf: a rank-2 corpus
    // (planted direction + rank-2 noise) has a dead 4th axis
    val rank2 = (1 to 200).map { i =>
      val s = (if (i % 2 == 0) 1 else -1) * (i / 4.0 + 1.0)
      (i.toLong, Array.tabulate(dim)(j =>
        (s * unit(j) + 0.01 * math.cos(i * 31 + j * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val mr = Pca.fit(rank2, "embedding", dim, k = 4)
    val deadVar = rank2.select(Pca.whiten(col("embedding"), mr).as("w"))
      .agg(avg(element_at(col("w"), 4) * element_at(col("w"), 4)))
      .head().getDouble(0)
    assert(deadVar === 0.0, s"degenerate axis must whiten to 0: $deadVar")
    // dim-mismatch fails loudly inside the aggregate
    val ex = intercept[Exception] {
      Pca.fit(df, "embedding", dim = 8, k = 2)
    }
    assert(ex.getMessage != null)
  }

  test("semdedup: one survivor per clone group, lowest-centroid-sim " +
      "keep rule, full partition") {
    import graft.pipeline.Similarity
    // clone vectors 0 and 7 three times each under fresh ids — every
    // clone group must collapse to exactly one kept member
    val clones = emb.filter(col("vec_id").isin(0L, 7L))
      .crossJoin(Seq(1000L, 2000L, 3000L).toDF("__off"))
      .select((col("vec_id") + col("__off")).as("vec_id"),
        col("embedding"), col("label"))
    val corpus = emb.unionByName(clones)
    val sd = Similarity.semDedup(corpus, "vec_id", "embedding",
      threshold = 0.999999, nlist = 4)
    val rows = sd.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getDouble(2), r.getBoolean(3)))
    // partition: every input id exactly once
    assert(rows.map(_._1).sorted.toSeq ===
      corpus.select("vec_id").as[Long].collect().sorted.toSeq)
    // each clone group (4 identical vectors) keeps exactly its min id —
    // identical vectors share cluster and centroid_sim, so the id
    // tiebreak decides
    for (base <- Seq(0L, 7L)) {
      val group = rows.filter(r => r._1 % 1000 == base).sortBy(_._1)
      assert(group.length === 4)
      assert(group.count(_._4) === 1, s"clone group $base: exactly 1 kept")
      assert(group.find(_._4).get._1 === base,
        s"clone group $base must keep the min id")
      assert(group.map(_._2).distinct.length === 1,
        "identical vectors must share a cluster")
    }
    // at a clone-only threshold nothing else is near-identical: all
    // non-clone rows survive
    assert(rows.filter(r => r._1 % 1000 != 0L && r._1 % 1000 != 7L)
      .forall(_._4))
    // keep rule: with distinct near-dups, the LOWER centroid_sim member
    // survives — verified by re-deriving every decision in plain Scala
    val sd2 = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.42, nlist = 4)
    val r2 = sd2.join(emb.select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getBoolean(3), r.getSeq[Float](4).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    r2.foreach { case (id, cl, cs, kept, v) =>
      val dominated = r2.exists { case (id2, cl2, cs2, _, v2) =>
        id2 != id && cl2 == cl && cos(v, v2) >= 0.42 &&
          (cs2 < cs || (cs2 == cs && id2 < id))
      }
      assert(kept === !dominated, s"decision diverges for $id")
    }
    assert(r2.exists(!_._4), "fixture must exercise at least one drop")
  }

  test("sq8: per-dim round-trip error <= step/2; scores track exact dots") {
    import graft.pipeline.Sq
    val dim = 64
    val model = Sq.train(emb, "embedding", dim)
    assert(model.mins.length === dim && model.steps.length === dim)
    assert(model.steps.forall(_ >= 0.0))
    // affine round-trip: |x - (min + step*c)| <= step/2 on EVERY dim of
    // EVERY vector (the defining property of round-to-nearest SQ)
    val mins = array(model.mins.map(lit(_)): _*)
    val steps = array(model.steps.map(lit(_)): _*)
    // indexed form: max_d |x_d - (min_d + step_d*c_d)| - step_d/2 <= 0
    val slack = emb.select(max(aggregate(
      sequence(lit(0), lit(dim - 1)), lit(-1.0d),
      (acc, d) => greatest(acc,
        abs(element_at(col("embedding"), d + 1).cast("double") -
          (element_at(mins, d + 1) + element_at(steps, d + 1) *
            element_at(Sq.encode(col("embedding"), model), d + 1)
              .cast("double"))) -
        element_at(steps, d + 1) / 2.0 - lit(1e-9)))))
      .collect()(0).getDouble(0)
    assert(slack <= 0.0, s"round-trip error exceeds step/2: slack=$slack")
    // zero-width dims: constant column codes to 0 and scores finitely
    val flat = emb.select(col("vec_id"),
      transform(col("embedding"), _ => lit(1.0f)).as("embedding"))
    val m2 = Sq.train(flat, "embedding", dim)
    assert(m2.steps.forall(_ === 0.0))
    val sc = Sq.sqTopK(flat.filter(col("vec_id") < 2), flat, "vec_id",
      "embedding", dim, topK = 3).collect()
    assert(sc.length === 6 && sc.forall(!_.isNullAt(2)))
    // deterministic end to end
    val a = Sq.sqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Sq.sqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b && a.nonEmpty)
    // 8-bit codes lose little: SQ top-1 must sit in the exact top-3
    // (PQ gets a percentile bound; SQ is near-exact by construction)
    val exact = graft.pipeline.Similarity.knnJoin(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val sqTop1 = Sq.sqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id",
      "embedding", dim, topK = 1).select(col("query_id"),
      col("neighbor_id")).as[(Long, Long)].collect()
    sqTop1.foreach { case (q, n) =>
      assert(exact(q).contains(n), s"sq top-1 $n outside exact top-3 for $q")
    }
  }

  test("sq model reuse + ivf-sq flat equivalence + rerank recall") {
    import graft.pipeline.{Pq, Rerank, Sq}
    val dim = 64
    val qs = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // train/search split: a model fitted once serves repeated query
    // batches identically to the one-shot convenience form
    val model = Sq.train(emb, "embedding", dim)
    val once = key(Sq.sqTopKWith(model, qs, emb, "vec_id", "embedding"))
    assert(once === key(Sq.sqTopK(qs, emb, "vec_id", "embedding", dim)))
    assert(once === key(Sq.sqTopKWith(model, qs, emb, "vec_id",
      "embedding")), "model reuse must be deterministic")
    // nprobe = nlist probes every cell: IVF-SQ must equal flat SQ (the
    // Pq ivfPq equivalence discipline)
    assert(key(Sq.ivfSqTopK(qs, emb, "vec_id", "embedding", dim,
      nlist = 8, nprobe = 8)) === once)
    // exact re-rank: output pairs are a subset of the candidates, and
    // ordering follows the exact integer metric
    val cand = Sq.sqTopKWith(model, qs, emb, "vec_id", "embedding",
      topK = 30)
    val rr = Rerank.rerank(cand, qs, emb, "vec_id", "embedding", topK = 10)
    val candSet = cand.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rrRows = rr.collect()
    assert(rrRows.length === 5 * 10)
    rrRows.foreach { r =>
      assert(candSet((r.getLong(0), r.getLong(1))),
        "re-ranked pair not among the first-pass candidates")
    }
    // recall vs the exact top-10 under the SAME metric: the second pass
    // can only help — rerank recall >= the un-reranked first-pass
    // recall, for BOTH the SQ and the PQ front end
    val exact = Rerank.exactTopK(qs, emb, "vec_id", "embedding", 10)
    val exSet = exact.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().count(exSet)
    val sqRecall = recall(cand.filter(col("rank") <= 10))
    val sqRerankRecall = recall(rr)
    assert(sqRerankRecall >= sqRecall,
      s"sq rerank recall $sqRerankRecall < first-pass $sqRecall")
    val adc = Pq.adcTopK(qs, emb, "vec_id", "embedding", dim,
      m = 8, k = 16, topK = 30)
    val adcRerank = Rerank.rerank(adc, qs, emb, "vec_id", "embedding", 10)
    val pqRecall = recall(adc.filter(col("rank") <= 10))
    val pqRerankRecall = recall(adcRerank)
    assert(pqRerankRecall >= pqRecall,
      s"pq rerank recall $pqRerankRecall < first-pass $pqRecall")
    // PQ is coarse on this corpus (16 codes/subspace): the re-rank pass
    // must recover a strict majority of the exact top-10
    assert(pqRerankRecall >= 25,
      s"pq rerank recovers only $pqRerankRecall/50 exact neighbours")
  }

  test("mmr: hand-checkable greedy walk, ties, refuse-not-truncate") {
    import graft.pipeline.Rerank
    // 1 and 2 are near-identical vectors; 3 is orthogonal to both.
    // rel: 1 > 2 > 3, so plain ranking gives (1, 2, 3) but MMR at
    // λ=0.5 must demote 2 behind the diverse 3.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.001f)),
      (3L, Array(0.0f, 1.0f))).toDF("id", "v")
    val cand = Seq((1L, 0.9), (2L, 0.85), (3L, 0.2)).toDF("id", "rel")
    val out = Rerank.mmr(cand, vecs, "id", "rel", "v",
        lam = 0.5, k = 3)
      .orderBy(col("rank")).as[(Long, Double, Int)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 3L, 2L))
    // scores: λ·rel for the first pick; 3 pays ~0 sim, 2 pays ~1
    assert(out(0)._2 === 0.45)
    assert(math.abs(out(1)._2 - 0.1) < 1e-6)
    assert(out(2)._2 < 0.0) // 0.5*0.85 - 0.5*sim(2,1) ≈ -0.075
    // k beyond the pool: stops at pool size
    assert(Rerank.mmr(cand, vecs, "id", "rel", "v", k = 99)
      .count() === 3L)
    // guards: λ range, pool cap refuses, duplicate ids, missing vector
    intercept[IllegalArgumentException] {
      Rerank.mmr(cand, vecs, "id", "rel", "v", lam = 1.5)
    }
    intercept[IllegalArgumentException] {
      Rerank.mmr(cand, vecs, "id", "rel", "v", maxCandidates = 2)
    }
    intercept[IllegalArgumentException] {
      Rerank.mmr(cand.union(cand), vecs, "id", "rel", "v")
    }
    intercept[IllegalArgumentException] {
      Rerank.mmr(cand, vecs.filter(col("id") =!= 3L), "id", "rel", "v")
    }
  }

  test("token_count: run budgets, code points, whitespace class, null") {
    import graft.pipeline.{TextFunctions, TextHash}
    // scheme edges, against hand-computed budgets
    assert(TextHash.tokenCount("") === 0L)
    assert(TextHash.tokenCount(" \t\n\f\r ") === 0L)
    assert(TextHash.tokenCount("hello") === 1L)       // ceil(5/6)
    assert(TextHash.tokenCount("wonderful") === 2L)   // ceil(9/6)
    assert(TextHash.tokenCount("abcdefghijkl") === 2L) // ceil(12/6)
    assert(TextHash.tokenCount("12") === 1L)          // ceil(2/3)
    assert(TextHash.tokenCount("123456") === 2L)      // ceil(6/3)
    assert(TextHash.tokenCount("a1b") === 3L)         // three runs
    assert(TextHash.tokenCount("!!!") === 3L)         // punct: 1/char
    assert(TextHash.tokenCount("Hello, wonderful-world 12345") === 8L)
    // non-ASCII letters break runs and cost 1/code point; an astral
    // pair (2 chars) is ONE code point on both engines
    assert(TextHash.tokenCount("été") === 3L) // é t é
    assert(TextHash.tokenCount("a😀b") === 3L) // a 😀 b
    // vertical tab is NOT in RE2's \s: costs 1, same as the SQL twin
    assert(TextHash.tokenCount("a\u000bb") === 3L)
    // the expression: codegen'd, null-safe, equals the kernel
    val out = Seq(("x", "Hello, wonderful-world 12345"),
      ("y", null)).toDF("k", "t")
      .select(TextFunctions.token_count(col("t")).as("n")).collect()
    assert(out(0).getLong(0) === 8L)
    assert(out(1).isNullAt(0))
  }

  test("ann top-k windows plan as WindowGroupLimit (map-side pre-prune)") {
    import graft.pipeline.{Similarity, Sq}
    // the per-query rank<=k windows in the ANN family must pre-prune
    // each input partition BEFORE the window exchange (Spark 4 rewrites
    // row_number+filter to partial/final WindowGroupLimit) — at corpus
    // scale the exchange otherwise carries every candidate pair
    def assertGroupLimit(df: org.apache.spark.sql.DataFrame,
        name: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val gl = plan.linesIterator.zipWithIndex
        .filter(_._1.contains("WindowGroupLimit")).map(_._2).toSeq
      val ex = plan.linesIterator.zipWithIndex
        .filter(_._1.contains("Exchange")).map(_._2).toSeq
      assert(gl.size >= 2, s"$name: expected partial+final " +
        s"WindowGroupLimit:\n$plan")
      assert(ex.exists(e => gl.exists(_ < e) && gl.exists(_ > e)),
        s"$name: expected WindowGroupLimit on BOTH sides of the " +
          s"exchange:\n$plan")
    }
    val qs = emb.filter(col("vec_id") < 3)
    assertGroupLimit(Similarity.knnJoin(qs, emb, "vec_id", "embedding",
      k = 3), "knnJoin")
    assertGroupLimit(Sq.sqTopK(qs, emb, "vec_id", "embedding", 64,
      topK = 3), "sqTopK")
    assertGroupLimit(graft.pipeline.Pq.adcTopK(qs, emb, "vec_id",
      "embedding", 64, topK = 3), "adcTopK")
  }

  test("unicode normalize: NFC composition, NFKC folding, null, bad form") {
    import graft.pipeline.TextFunctions.unicode_normalize
    // "e<combining acute> <fi ligature>": NFC composes the pair and keeps
    // the ligature; NFKC also folds the ligature to "fi" (escapes, not
    // glyphs — editor normalization must not be able to change the test)
    val df = Seq("e\u0301 \ufb01", null.asInstanceOf[String]).toDF("t")
    val out = df.select(
      unicode_normalize(col("t")).as("nfc"),
      unicode_normalize(col("t"), "NFKC").as("nfkc"),
      length(unicode_normalize(col("t"))).as("n"))
      .collect()
    assert(out(0).getString(0) === "\u00e9 \ufb01")
    assert(out(0).getString(1) === "\u00e9 fi")
    assert(out(0).getInt(2) === 3)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null-intolerant
    intercept[IllegalArgumentException] {
      graft.pipeline.UnicodeNormalize(
        org.apache.spark.sql.graftbridge.expression(col("t")), "NFX")
    }
  }

  test("compression ratio: invariants hold, repetition compresses below prose") {
    import graft.pipeline.TextFunctions.deflate_len
    // planted fixtures: highly repetitive vs word-diverse text of equal length
    val rep = ("ab" * 500)
    val prose = (1 to 100).map(i => s"w${i * 7919}").mkString(" ").take(1000)
    val df = Seq(("rep", rep), ("prose", prose)).toDF("k", "t")
      .select(col("k"), length(col("t")).as("raw"), deflate_len(col("t")).as("z"),
        deflate_len(concat(col("t"), col("t"))).as("z2"))
    val rows = df.collect().map(r =>
      r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    rows.values.foreach { case (raw, z, z2) =>
      assert(z > 0 && z <= raw + 64, s"deflate bound violated: $raw $z")
      assert(z2 < 2 * z + 64, s"sub-additivity violated: $z $z2")
    }
    assert(rows("rep")._2.toDouble / rows("rep")._1 <
      0.5 * rows("prose")._2.toDouble / rows("prose")._1,
      s"repetitive text must compress far below prose: $rows")
    // gate invariant: zero violations over the real corpus
    val gate = graft.operators.PipelineQueries.queries("doc_compress")(
      spark, sf("sf0.001"))
    assert(gate.agg(sum(col("n_violations"))).collect()(0).getLong(0) === 0L)
  }

  test("keepBest: quality argmax, min-id ties, member counts") {
    import graft.pipeline.Dedup
    val df = Seq(
      ("g1", 1L, 10L), // g1: 3 members, best quality 30 -> id 3
      ("g1", 2L, 20L),
      ("g1", 3L, 30L),
      ("g2", 5L, 7L),  // g2: quality tie -> SMALLEST id 4 wins
      ("g2", 4L, 7L),
      ("g3", 9L, 1L)   // singleton keeps itself
    ).toDF("g", "id", "q")
    val out = Dedup.keepBest(df, col("g"), col("q"), col("id"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("g1" -> ((3L, 3L)), "g2" -> ((4L, 2L)),
      "g3" -> ((9L, 1L))))
    // review finding: NULL group keys must stay SINGLETONS (md5(NULL)
    // would otherwise merge all null-text docs into one bogus group)
    val withNulls = Seq((Some("g1"), 1L, 5L), (None, 2L, 5L),
      (None, 3L, 5L)).toDF("g", "id", "q")
    val nout = Dedup.keepBest(withNulls, col("g"), col("q"), col("id"))
      .as[(String, Long, Long)].collect()
    assert(nout.length === 3, s"null keys must not merge: ${nout.toSeq}")
    assert(nout.count(_._3 == 1L) === 3)
  }

  test("mixtureToWeights: hits requested proportions at max feasible size") {
    import graft.pipeline.Sample
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // ask for a 2:1:1 en/de/fr char mixture; en is the largest stratum
    // so de or fr binds (keeps rate 1) and en downsamples toward 2x
    val targets = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.0)
    val kept = Sample.mixtureToWeights(d, col("lang"), col("doc_id"),
      col("n_chars"), targets)
    val w = kept.groupBy(col("lang")).agg(sum(col("n_chars")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.keySet === targets.keySet, s"strata filtered to targets: $w")
    // proportions within a binomial band of 2:1:1 (threshold sampling)
    val perUnit = targets.map { case (k, t) => w(k) / t }
    assert(perUnit.max < perUnit.min * 1.8,
      s"proportions off target: $w (per-unit $perUnit)")
    // the binding stratum keeps everything (rate exactly 1)
    val full = d.filter(col("lang").isin("en", "de", "fr"))
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(targets.keys.exists(k => w(k) === full(k)),
      s"some stratum must bind at rate 1: kept $w of $full")
  }

  test("mixtureTemperature: alpha=1 identity, alpha=0.5 sqrt proportions") {
    import graft.pipeline.Sample
    val d = docs.select(col("doc_id"), col("source"), col("n_chars"))
    // alpha = 1: every rate is (w/wmin)^0 = 1 — nothing dropped
    assert(Sample.mixtureTemperature(d, col("source"), col("doc_id"),
      col("n_chars"), alpha = 1.0).count() === d.count())
    // alpha = 0.5: output weights ∝ sqrt(total); per-sqrt-unit roughly
    // constant across strata (binomial band), smallest stratum binds
    val totals = d.groupBy(col("source")).agg(sum(col("n_chars")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sample.mixtureTemperature(d, col("source"), col("doc_id"),
      col("n_chars"), alpha = 0.5, rateName = Some("rate"))
    val keptW = kept.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perUnit = keptW.map { case (s, w) => w / math.sqrt(totals(s)) }
    assert(perUnit.max < perUnit.min * 1.8,
      s"sqrt proportions off: $keptW vs totals $totals")
    val minSrc = totals.minBy(_._2)._1
    assert(keptW(minSrc) === totals(minSrc),
      "smallest stratum must keep rate 1")
    // rate column carried under the caller's name, internals dropped
    assert(kept.columns.toSeq === d.columns.toSeq :+ "rate")
  }

  test("sampling boundaries: frac=1 identity; null strata excluded from budget") {
    import graft.pipeline.Sample
    val df = docs.select(col("doc_id"), col("lang"))
    assert(Sample.byHash(df, col("doc_id"), 1.0).count() === df.count())
    // a tiny null stratum must not become the balanced budget
    val mixed = docs.select(col("doc_id"),
      when(col("doc_id") === 3L, lit(null).cast("string"))
        .otherwise(col("source")).as("source"), col("n_chars"))
    val kept = Sample.mixtureBalanced(mixed, col("source"), col("doc_id"),
      col("n_chars"))
    // with the null group excluded, rates stay ~balanced: kept count is
    // a large fraction of the corpus, not collapsed toward zero
    assert(kept.count() > docs.count() / 2,
      s"null stratum collapsed the budget: kept ${kept.count()}")
    assert(kept.filter(col("source").isNull).count() === 0)
  }

  test("mixture + cap: balanced budgets, Weyl determinism, group-limit plan") {
    import graft.pipeline.Sample
    // weylHash: in range, deterministic, bijective on a small id block
    val ids = spark.range(0, 1000).select(col("id").as("k"))
    val hs = ids.select(Sample.weylHash(col("k")).as("h"))
    assert(hs.filter(col("h") < 0 || col("h") >= 4294967296L).count() === 0)
    assert(hs.distinct().count() === 1000) // multiplicative bijection
    // mixtureBalanced: smallest stratum keeps ~everything; every
    // stratum's kept weight lands within a binomial band of the
    // smallest stratum's total (balance is the contract)
    val d = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val kept = Sample.mixtureBalanced(d, col("source"), col("doc_id"),
      col("n_chars"))
    val keptW = kept.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minW = d.groupBy(col("source")).agg(sum(col("n_chars")).as("w"))
      .agg(min(col("w"))).collect()(0).getLong(0)
    keptW.values.foreach { w =>
      assert(w <= minW * 1.6 && w >= minW * 0.4,
        s"stratum weight $w vs balanced target $minW")
    }
    // deterministic under re-evaluation
    val k1 = kept.select("doc_id").as[Long].collect().toSet
    val k2 = Sample.mixtureBalanced(d, col("source"), col("doc_id"),
      col("n_chars")).select("doc_id").as[Long].collect().toSet
    assert(k1 === k2)
    // capPerStratum: exact per-stratum counts, deterministic members,
    // and the scale contract — the physical plan pre-prunes each input
    // partition with a WindowGroupLimit BEFORE the exchange
    val capped = Sample.capPerStratum(d, col("source"), col("doc_id"), 3)
    val perSrc = capped.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_ <= 3))
    val plan = capped.queryExecution.executedPlan.toString
    val gl = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("WindowGroupLimit")).map(_._2).toSeq
    val ex = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("Exchange")).map(_._2).toSeq
    assert(gl.size === 2, s"expected partial+final WindowGroupLimit:\n$plan")
    assert(ex.exists(e => gl.exists(_ < e) && gl.exists(_ > e)),
      s"expected a WindowGroupLimit on BOTH sides of the exchange:\n$plan")
  }

  test("sampler hygiene: weylHash fold, no leaked internals, clash refusal") {
    import graft.pipeline.Sample
    // keys >= 2^31 are folded, not overflowed: hash stays in range and
    // equals the hash of the pre-folded key (the documented fold)
    val big = spark.range(0, 100)
      .select((col("id") + lit(2147483648L) * 3 + 7).as("k"))
    val folded = big.select(Sample.weylHash(col("k")).as("h"),
      Sample.weylHash(pmod(col("k"), lit(2147483648L))).as("hf"))
    assert(folded.filter(col("h") < 0 || col("h") >= 4294967296L)
      .count() === 0)
    assert(folded.filter(col("h") =!= col("hf")).count() === 0)
    // default samplers return the INPUT schema — no __rate/__cap_rk leak
    val d = docs.select(col("doc_id"), col("source"), col("n_chars"))
    assert(Sample.mixtureBalanced(d, col("source"), col("doc_id"),
      col("n_chars")).columns.toSeq === d.columns.toSeq)
    assert(Sample.mixtureToWeights(d, col("source"), col("doc_id"),
      col("n_chars"), Map("web" -> 1.0, "books" -> 1.0)).columns.toSeq
      === d.columns.toSeq)
    assert(Sample.capPerStratum(d, col("source"), col("doc_id"), 3)
      .columns.toSeq === d.columns.toSeq)
    // rated/ranked variants add exactly the requested column
    assert(Sample.mixtureBalancedRated(d, col("source"), col("doc_id"),
      col("n_chars"), "rate").columns.toSeq === d.columns.toSeq :+ "rate")
    assert(Sample.capPerStratumRanked(d, col("source"), col("doc_id"), 3,
      "rk").columns.toSeq === d.columns.toSeq :+ "rk")
    // colliding input columns refuse loudly instead of being clobbered
    val clash = d.withColumn("__rate", lit(0.0))
    intercept[IllegalArgumentException] {
      Sample.mixtureBalanced(clash, col("source"), col("doc_id"),
        col("n_chars"))
    }
    intercept[IllegalArgumentException] {
      Sample.capPerStratumRanked(d, col("source"), col("doc_id"), 3,
        "n_chars")
    }
  }

  test("repetition gate: grams guard short docs; micro-sums bounded") {
    import graft.pipeline.Decontaminate
    // the descending-sequence trap: < n words must give [], not [1, 0]
    val grams = Seq(("a b c d", 0)).toDF("t", "i")
      .select(Decontaminate.wordGrams(col("t"), 2).as("g2"),
        Decontaminate.wordGrams(col("t"), 5).as("g5"))
      .collect()(0)
    assert(grams.getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(grams.getSeq[String](1) === Seq.empty)
    val out = operators.PipelineQueries.queries("doc_repetition")(
      spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val eligible = docs.filter(col("text").isNotNull)
      .filter(size(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")) >= 5).count()
    assert(out.map(_.getLong(2)).sum === eligible,
      "every eligible doc lands in exactly one (lang, verdict) cell")
    out.foreach { r =>
      val n = r.getLong(2)
      Seq(3, 4, 5).foreach { i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= n * 1000000L,
          s"micro-sum out of [0, n*1e6]: $r")
      }
    }
  }

  test("pairGate digest form: id_digest is the DuckDB-replayable md5 sum") {
    import spark.implicits._
    val pairs = Seq((12L, 34L, 0.9), (7L, 99L, 0.8),
      (123456789L, 987654321L, 0.7)).toDF("id_a", "id_b", "sim")
    // maxRows = 0 forces the digest row on a hand-checkable pair set
    val row = graft.operators.PipelineQueries.pairGate(pairs, "sim",
      maxRows = 0L).head()
    graft.pipeline.Caches.release()
    assert(row.schema.fieldNames.toSeq ===
      Seq("n_pairs", "pair_digest", "id_digest"))
    assert(row.getLong(0) === 3L)
    // the replayable leg: sum over pairs of the first 15 hex chars of
    // md5("<id_a>:<id_b>") parsed base-16 — computed here from
    // java.security.MessageDigest, the SAME byte-level definition
    // DuckDB's md5() + ('0x'||s)::BIGINT evaluates, so this pin proves
    // the Spark SQL conv/md5 rendering means what the oracle replays
    def leg(a: Long, b: Long): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$a:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16)
    }
    val want = Seq((12L, 34L), (7L, 99L), (123456789L, 987654321L))
      .map { case (a, b) => leg(a, b) }.sum
    assert(BigInt(row.getDecimal(2).toBigInteger) === want)
  }
}
