package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Bloom, BloomKernel, Lines}

/** Bloom-filter incremental dedup and C4-style line dedup. */
class BloomLinesSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("bloom kernel: zero false negatives, fp rate near the sizing bound") {
    val n = 10000
    val bits = BloomKernel.optimalBits(n, 0.01)
    val k = BloomKernel.optimalHashes(bits.toLong, n)
    val buf = new Array[Byte](bits / 8)
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(n)((rnd.nextLong(), rnd.nextLong()))
    keys.foreach { case (a, b) => BloomKernel.set(buf, a, b, k) }
    assert(keys.forall { case (a, b) => BloomKernel.contains(buf, a, b, k) },
      "a bloom filter must never miss an inserted key")
    val probes = Array.fill(n)((rnd.nextLong(), rnd.nextLong()))
    val fp = probes.count { case (a, b) => BloomKernel.contains(buf, a, b, k) }
    assert(fp < n * 0.03, s"fp rate ${fp.toDouble / n} vs sized 0.01")
  }

  test("probeSharded: every existing key reports maybe_seen") {
    val existing = docs.select(col("doc_id"), col("text"))
    val blooms = Bloom.buildSharded(existing, col("text"), shards = 8,
      bitsPerShard = BloomKernel.optimalBits(1000, 0.01), k = 7)
    assert(blooms.count() <= 8)
    val probed = Bloom.probeSharded(existing, col("text"), blooms, 8, 7)
    assert(probed.filter(!col("maybe_seen")).count() === 0,
      "no false negatives across the shard routing")
    // clash refusal on internal names — including the OUTPUT column,
    // which withColumn would otherwise silently replace
    intercept[IllegalArgumentException] {
      Bloom.probeSharded(existing.withColumn("__h1", lit(1L)), col("text"),
        blooms, 8, 7)
    }
    intercept[IllegalArgumentException] {
      Bloom.probeSharded(existing.withColumn("maybe_seen", lit(true)),
        col("text"), blooms, 8, 7)
    }
    intercept[IllegalArgumentException] {
      Bloom.newRows(existing, existing.withColumn("__bk", lit(1)),
        col("text"), 1000L)
    }
    // sizing guards fail early with actionable messages, never wrap
    intercept[IllegalArgumentException] {
      graft.pipeline.BloomKernel.optimalBits(300000000L, 0.01) // > 128 MiB
    }
    assert(graft.pipeline.BloomKernel.optimalBits(100000000L, 0.01) > 0)
  }

  test("newRows == exact anti-join; approx is a subset missing ~fpp only") {
    // batch: half duplicates of the corpus, half novel variants
    val incoming = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
        .otherwise(concat(col("text"), lit(" zz"))).as("text"))
    val expected = incoming.join(docs.select(col("text").as("__t")),
        col("text") === col("__t"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val got = Bloom.newRows(docs, incoming, col("text"),
        expectedExisting = 10000L, fpp = 0.01, shards = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected, "bloom-pruned exact path must equal anti-join")
    // shards = 1 (monolithic) agrees too
    val one = Bloom.newRows(docs, incoming, col("text"),
        expectedExisting = 10000L, fpp = 0.01, shards = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(one === expected)
    // approximate path: never resurrects a duplicate, loses at most a
    // few genuinely-new rows to false positives
    val approx = Bloom.newRows(docs, incoming, col("text"),
        expectedExisting = 10000L, fpp = 0.01, shards = 4, exact = false)
      .select("doc_id").as[Long].collect().toSet
    assert(approx.subsetOf(expected))
    assert(approx.size >= expected.size - math.max(3, expected.size / 20),
      s"approx lost too many: ${approx.size}/${expected.size}")
  }

  test("lineDedup: first occurrence wins, short lines immune, hashed == exact") {
    val d = Seq(
      (1L, "common header\nbody one body one body\nok\ncommon footer"),
      (2L, "common header\nbody two body two body\nok\ncommon footer"),
      (3L, "common header\nrepeat me now\nrepeat me now\nok"),
      (4L, ""),
      (5L, "unique only line here")
    ).toDF("doc_id", "text")
    val out = Lines.lineDedup(d, "doc_id", "text", minLineLen = 5)
      .as[(Long, String)].collect().toMap
    // doc 1 owns both boilerplate lines (min doc_id)
    assert(out(1L) === "common header\nbody one body one body\nok\ncommon footer")
    // doc 2 loses both, keeps its body and the short "ok"
    assert(out(2L) === "body two body two body\nok")
    // within-doc duplicate: first position wins
    assert(out(3L) === "repeat me now\nok")
    assert(out(4L) === "")
    assert(out(5L) === "unique only line here")
    // schema untouched; hashed mode agrees on the fixture
    val hashed = Lines.lineDedup(d, "doc_id", "text", minLineLen = 5,
      hashed = true).as[(Long, String)].collect().toMap
    assert(hashed === out)
    // null text passes through; internal-name clash refused
    val withNull = d.unionByName(Seq((6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val nout = Lines.lineDedup(withNull, "doc_id", "text", minLineLen = 5)
    assert(nout.filter(col("doc_id") === 6L).select("text")
      .collect()(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      Lines.lineDedup(d.withColumn("__ld_drop", lit(1)), "doc_id", "text")
    }
  }

  test("chunkTokens: coverage, stride overlap, edge lengths") {
    import graft.pipeline.Chunk
    val d = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, (1 to 32).map(i => s"x$i").mkString(" ")),  // exactly max
      (3L, (1 to 33).map(i => s"y$i").mkString(" ")),  // one over
      (4L, "solo"),
      (5L, ""),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunk.chunkTokens(d, "doc_id", "text", 32, 8)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 100 tokens, step 24: ceil((100-32)/24)+1 = 4 chunks; starts 0/24/48/72
    assert(out(1L).map(_._3).toSeq === Seq(32L, 32L, 32L, 28L))
    assert(out(1L)(1)._4.startsWith("w25 ") && out(1L)(1)._4.endsWith(" w56"))
    // every token covered, consecutive chunks share exactly 8 tokens
    val c0 = out(1L)(0)._4.split(" "); val c1 = out(1L)(1)._4.split(" ")
    assert(c0.takeRight(8).toSeq === c1.take(8).toSeq)
    assert(out(2L).map(_._3).toSeq === Seq(32L), "exact max: one chunk")
    assert(out(3L).map(_._3).toSeq === Seq(32L, 9L), "one over: short tail")
    assert(out(4L).map(_._4).toSeq === Seq("solo"))
    assert(out(5L).map(_._3).toSeq === Seq(1L), "empty text: one [\"\"] chunk")
    assert(!out.contains(6L), "null text yields no chunks")
    // full reconstruction: dropping each chunk's 8-token overlap prefix
    // (except the first) re-concatenates to the original token stream
    val rebuilt = out(1L).zipWithIndex.flatMap { case ((_, _, _, c), i) =>
      val w = c.split(" "); if (i == 0) w else w.drop(8)
    }
    assert(rebuilt.toSeq === (1 to 100).map(i => s"w$i"))
  }

  test("lineDedup on the corpus: idempotent and boilerplate-mass exact") {
    // derive the gate's multi-line text; after one pass every duplicated
    // eligible line occurs exactly once corpus-wide -> second pass is a
    // no-op (idempotence is the operator's fixed-point contract)
    val derived = docs.select(col("doc_id"),
      concat_ws("\n",
        concat(lit("promo "), col("source")), col("text"),
        concat(lit("legal "), col("lang"))).as("text"))
    val once = Lines.lineDedup(derived, "doc_id", "text", minLineLen = 5)
    val twice = Lines.lineDedup(once, "doc_id", "text", minLineLen = 5)
    assert(once.exceptAll(twice).count() === 0 &&
      twice.exceptAll(once).count() === 0)
    // boilerplate survivors: exactly one promo line per source, one
    // legal line per lang, all bodies intact
    val nSources = docs.select("source").distinct().count()
    val nLangs = docs.select("lang").distinct().count()
    val lines = once.select(explode(split(col("text"), "\n")).as("l"))
    assert(lines.filter(col("l").startsWith("promo ")).count() === nSources)
    assert(lines.filter(col("l").startsWith("legal ")).count() === nLangs)
    assert(lines.filter(!col("l").startsWith("promo ") &&
      !col("l").startsWith("legal ")).count() === docs.count())
  }
}
