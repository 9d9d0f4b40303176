package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity}

/** Duplicate-heavy contraction benchmark (round-6 verdict #1): builds the
  * regime [[Dedup.contractExact]] exists for — every document/embedding
  * cloned `factor`× under shifted ids (clone cliques of size `factor`) —
  * and times each near-dup operator with contraction forced ON vs OFF.
  * Results are committed as the BENCH_NOTES.md round-7 section that
  * Dedup.scala's Scaladoc cites.
  *
  * `runMain graft.DupBench [sfDir] [factor] [mode] [families]` —
  * defaults sf0.1, 40×, mode `both`, all families. Mode `on` skips the
  * contract=Off column: past the regime where Off is a measured DNF
  * (cosine at 40× ran out of disk, BENCH_NOTES round 7), re-running it
  * proves nothing and burns an hour. `families` (comma list of
  * minhash/simhash/cosine/jaccard) measures a subset — e.g. adding a
  * NEW family's 40×/100× rows without re-paying the whole sweep.
  */
object DupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 40
    val runOff = args.length <= 2 || args(2) != "on"
    val families: String => Boolean = args.lift(3) match {
      case Some(list) =>
        val wanted = list.split(",").map(_.trim).toSet
        name => wanted.exists(name.startsWith)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cloned(base: DataFrame, idCol: String): DataFrame =
      (0 until factor).map(i =>
        base.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _).persist()

    val docs = cloned(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      "doc_id")
    val emb = cloned(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      "vec_id")
    // exact jaccard runs on the gate's 1000-doc base slice, cloned: its
    // full-corpus all-pairs cost is the documented reason the LSH rows
    // above are the scale path — what the clone regime measures HERE is
    // contraction collapsing the clique-quadratic candidate stage back to
    // distinct-content cost
    val docsSlice = cloned(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000),
      "doc_id")
    println(s"corpus: docs=${docs.count()} emb=${emb.count()} " +
      s"jaccard_slice=${docsSlice.count()} factor=$factor")

    def time(name: String)(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Caches.release()
      println(f"$name%-24s $t%8.2f s")
      t
    }

    // warmup (JIT/codegen) on the small path
    Dedup.minhashPairs(docs.limit(1000), "doc_id", "text",
      numHashes = 64, bands = 8, threshold = 0.7,
      contract = Dedup.Contract.Off)
      .write.format("noop").mode("overwrite").save()

    val results = Seq(
      ("minhash", (c: Dedup.Contract) => Dedup.minhashPairs(docs, "doc_id",
        "text", numHashes = 64, bands = 8, shingle = 5, threshold = 0.7,
        contract = c)),
      ("simhash", (c: Dedup.Contract) => Dedup.simhashPairs(docs, "doc_id",
        "text", maxHamming = 6, contract = c)),
      ("cosine_neardup", (c: Dedup.Contract) => Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", dim = 64, threshold = 0.42,
        bits = 4, tables = 8, contract = c)),
      ("jaccard_exact", (c: Dedup.Contract) => Dedup.jaccardPairs(docsSlice,
        "doc_id", "text", shingle = 5, threshold = 0.7, contract = c))
    ).filter(r => families(r._1)).map { case (name, fn) =>
      val on = time(s"$name contract=On")(fn(Dedup.Contract.On))
      val off =
        if (runOff) time(s"$name contract=Off")(fn(Dedup.Contract.Off))
        else Double.NaN
      (name, on, off)
    }

    // Star-edge output mode (round-8 verdict #1): same operators, linear
    // (member→rep) output instead of the clique-quadratic expanded pair
    // list. Edge counts are printed alongside wall time — the contract is
    // O(corpus + rep pairs) edges regardless of clone factor, vs
    // C(factor, 2) per clique for the expanded mode timed above.
    val starResults = Seq(
      ("minhash_star", () => Dedup.minhashEdges(docs, "doc_id", "text",
        numHashes = 64, bands = 8, shingle = 5, threshold = 0.7,
        contract = Dedup.Contract.On)),
      ("simhash_star", () => Dedup.simhashEdges(docs, "doc_id", "text",
        maxHamming = 6, contract = Dedup.Contract.On)),
      ("cosine_star", () => Similarity.cosineNearDupEdges(emb, "vec_id",
        "embedding", dim = 64, threshold = 0.42, bits = 4, tables = 8,
        contract = Dedup.Contract.On)),
      ("jaccard_star", () => Dedup.jaccardEdges(docsSlice, "doc_id", "text",
        shingle = 5, threshold = 0.7, contract = Dedup.Contract.On))
    ).filter(r => families(r._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val edges = fn().persist()
      val n = edges.count()
      val t = (System.nanoTime() - t0) / 1e9
      edges.unpersist(blocking = false)
      graft.pipeline.Caches.release()
      println(f"$name%-24s $t%8.2f s  edges=$n")
      (name, t, n)
    }

    // Aggregate-mode representative selection (round-13): keepBest's
    // claim is partials-only shuffle — wall time tracks corpus rows,
    // output rows stay the distinct-content count FLAT in clone factor.
    val keepResults =
      if (!families("keepbest")) Nil
      else {
        val t0 = System.nanoTime()
        val reps = Dedup.keepBest(docs, md5(col("text")),
          length(col("text")), col("doc_id")).persist()
        val n = reps.count()
        val t = (System.nanoTime() - t0) / 1e9
        reps.unpersist(blocking = false)
        println(f"${"keepbest"}%-24s $t%8.2f s  groups=$n")
        List(("keepbest", t, n))
      }

    // Line dedup (round-14): every line of every clone is corpus-
    // duplicated — the worst case for the "losers are a small fraction"
    // broadcast assumption. The contract printed: wall tracks corpus
    // rows, KEPT eligible lines stay the distinct-content count
    // (~bodies + boilerplate groups) FLAT in clone factor.
    val lineResults =
      if (!families("linededup")) Nil
      else {
        val derived = docs.select(col("doc_id"), concat_ws("\n",
          concat(lit("promo "), substring(md5(col("text")), 1, 2)),
          col("text"),
          lit("legal boilerplate line")).as("text"))
        val t0 = System.nanoTime()
        val out = graft.pipeline.Lines.lineDedup(derived, "doc_id", "text",
          minLineLen = 5).persist()
        val kept = out.select(sum(when(length(col("text")) === 0, 0)
          .otherwise(size(split(col("text"), "\n"))))).collect()(0).getLong(0)
        val t = (System.nanoTime() - t0) / 1e9
        out.unpersist(blocking = false)
        graft.pipeline.Caches.release()
        println(f"${"linededup"}%-24s $t%8.2f s  kept_lines=$kept")
        List(("linededup", t, kept))
      }

    // Bloom incremental dedup (round-14): the corpus side scales with
    // the clone factor while the probe batch stays the base slice —
    // wall should track the two corpus SCANS (build + confirm), the
    // new-row count stays flat (half the batch by construction).
    val bloomResults =
      if (!families("bloomnew")) Nil
      else {
        val incoming = Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(2L)) === 0, col("text"))
              .otherwise(concat(col("text"), lit(" zz"))).as("text"))
        val t0 = System.nanoTime()
        val n = graft.pipeline.Bloom.newRows(docs, incoming, col("text"),
          expectedExisting = docs.count(), fpp = 0.01, shards = 32).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.pipeline.Caches.release()
        println(f"${"bloomnew"}%-24s $t%8.2f s  new=$n")
        List(("bloomnew", t, n))
      }

    // Sequence packing (round-14): packing is linear in corpus rows by
    // construction — the contract printed: wall tracks rows, bins track
    // total tokens / budget, and mean bin fill stays FLAT in clone
    // factor (clones add tokens, not fragmentation).
    val packResults =
      if (!families("pack")) Nil
      else {
        val docsSrc = cloned(Tables.documents(spark, sfDir)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"), col("source")), "doc_id")
        val toks = docsSrc.select(col("doc_id"), col("source"),
          size(split(graft.pipeline.Decontaminate.normCol(col("text")),
            " ")).cast("long").as("n_tokens"))
        val t0 = System.nanoTime()
        val stats = graft.pipeline.Pack.binStats(
          graft.pipeline.Pack.packGreedy(toks, "doc_id", "n_tokens",
            "source", budget = 512L),
          "doc_id", "n_tokens", "source").persist()
        val nBins = stats.count()
        val fill = stats.agg(avg(col("bin_tokens"))).head().getDouble(0)
        val t = (System.nanoTime() - t0) / 1e9
        stats.unpersist(blocking = false)
        graft.pipeline.Caches.release()
        println(f"${"pack"}%-24s $t%8.2f s  bins=$nBins fill=$fill%.1f")
        List(("pack", t, nBins))
      }

    println("GRAFT_DUPBENCH")
    results.foreach { case (n, on, off) =>
      if (off.isNaN) println(f"$n%-16s on=$on%.2f s off=skipped (mode=on)")
      else println(f"$n%-16s on=$on%.2f s off=$off%.2f s speedup=${off / on}%.1fx")
    }
    starResults.foreach { case (n, t, e) =>
      println(f"$n%-16s star=$t%.2f s edges=$e")
    }
    keepResults.foreach { case (n, t, g) =>
      println(f"$n%-16s agg=$t%.2f s groups=$g")
    }
    lineResults.foreach { case (n, t, kl) =>
      println(f"$n%-16s t=$t%.2f s kept_lines=$kl")
    }
    bloomResults.foreach { case (n, t, nw) =>
      println(f"$n%-16s t=$t%.2f s new=$nw")
    }
    packResults.foreach { case (n, t, nb) =>
      println(f"$n%-16s t=$t%.2f s bins=$nb")
    }
    spark.stop()
  }
}
