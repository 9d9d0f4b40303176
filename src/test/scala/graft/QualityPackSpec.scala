package graft

import org.apache.spark.sql.functions._

import graft.pipeline.QualityRules

/** C4/Gopher doc-level quality rules (and, below, the packing/BM25/search
  * operators added alongside them in round 14). */
class QualityPackSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("quality rules: first-fail ladder classifies hand-built docs") {
    val fixture = Seq(
      // 60 in-band words incl. stopwords -> keep
      (1L, (Seq.fill(29)("the word") :+ "word end").mkString(" ")),
      // too short -> words (even though it also lacks stopwords)
      (2L, "tiny doc"),
      // 60 words, stopwords present, but every word is 12 chars -> wordlen
      (3L, Seq.fill(60)("abcdefghijkl").mkString(" ")),
      // 60 plain words, zero stopwords -> stop
      (4L, Seq.fill(60)("word").mkString(" ")),
      // stopwords fine, but >20% digit-only words -> alpha
      (5L, (Seq.fill(30)("the word") ++ Seq.fill(25)("123")).mkString(" ")),
      // stopword-bearing prose with >10% '#'-words -> symbol
      (6L, (Seq.fill(30)("the word") ++ Seq.fill(10)("#tag")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = QualityRules.classify(fixture, "text")
      .select(col("doc_id"), col("reason")).as[(Long, String)]
      .collect().toMap
    assert(got === Map(1L -> "keep", 2L -> "words", 3L -> "wordlen",
      4L -> "stop", 5L -> "alpha", 6L -> "symbol"))
  }

  test("quality rules: mean word length uses exact-integer operands") {
    // 50 words of length 2 and 50 of length 4 -> mean exactly 3.0, which
    // must pass the >= 3.0 bound (boundary is inclusive by construction)
    val doc = (Seq.fill(25)("th is") ++ Seq.fill(25)("that word"))
      .mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val m = QualityRules.classify(df, "text").head()
    assert(m.getAs[Long]("n_words") === 100L)
    assert(m.getAs[Long]("sum_word_len") === 300L)
    assert(m.getAs[String]("reason") === "keep")
  }

  test("quality rules: corpus classification is total and keepClean agrees") {
    val c = QualityRules.classify(docs, "text")
    assert(c.count() === docs.filter(col("text").isNotNull).count())
    val byReason = c.groupBy("reason").count().as[(String, Long)]
      .collect().toMap
    // the synthetic corpus must exercise more than one rule
    assert(byReason.contains("keep") && byReason.contains("words"))
    assert(QualityRules.keepClean(docs, "text").count()
      === byReason("keep"))
    // keepClean restores the caller's schema exactly
    assert(QualityRules.keepClean(docs, "text").columns.toSeq
      === docs.columns.toSeq)
  }

  test("bm25: hand-checkable scores on a three-doc corpus") {
    val fixture = Seq(
      (1L, "spark spark join"), // tf(spark)=2, dl=3
      (2L, "spark join scan"),  // tf(spark)=1, dl=3
      (3L, "join scan merge"))  // tf(spark)=0
      .toDF("doc_id", "text")
    val got = graft.pipeline.Bm25
      .score(fixture, "doc_id", "text", Seq("spark"))
      .select(col("doc_id"), col("score")).as[(Long, Double)]
      .collect().toMap
    // N=3, df=2, avgdl=3 -> idf = ln(1 + 1.5/2.5); dl/avgdl = 1 so the
    // length norm collapses to (tf*2.2)/(tf+1.2)
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    assert(math.abs(got(1L) - idf * 2.0 * 2.2 / (2.0 + 1.2)) < 1e-12)
    assert(math.abs(got(2L) - idf * 1.0 * 2.2 / (1.0 + 1.2)) < 1e-12)
    assert(got(3L) === 0.0)
  }

  test("bm25: more matched terms strictly raises the score; topK orders") {
    val fixture = Seq(
      (1L, "spark merge window pad pad pad"),
      (2L, "spark merge scan pad pad pad"),
      (3L, "spark scan scan pad pad pad"),
      (4L, "scan scan scan pad pad pad"))
      .toDF("doc_id", "text")
    val q = Seq("spark", "merge", "window")
    val top = graft.pipeline.Bm25.topK(fixture, "doc_id", "text", q, k = 10)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(top === Seq(1L, 2L, 3L), "zero-score doc excluded, rank by terms")
    intercept[IllegalArgumentException] {
      graft.pipeline.Bm25.score(fixture, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Bm25.score(fixture.withColumn("__dl", lit(1L)),
        "doc_id", "text", q)
    }
  }

  test("bm25: batch topKMany matches the fixed-query scorer in micros") {
    import graft.pipeline.Bm25
    val fixture = Seq(
      (1L, "spark merge window pad pad pad"),
      (2L, "spark merge scan pad pad pad"),
      (3L, "spark scan scan pad pad pad"),
      (4L, "scan scan scan pad pad pad"))
      .toDF("doc_id", "text")
    // single-term query: the batch contribution IS micros(scoreExpr),
    // so ranking and values must match the fixed-query scorer exactly
    val qs = Seq((7L, "spark")).toDF("query_id", "term")
    val batch = Bm25.topKMany(fixture, "doc_id", "text", qs, topK = 10)
      .orderBy(col("rank"))
      .select(col("doc_id"), col("score_micros"))
      .as[(Long, Long)].collect().toSeq
    val fixed = Bm25.score(fixture, "doc_id", "text", Seq("spark"))
      .filter(col("score") > 0)
      .select(col("doc_id"), floor(col("score") * 1e6 + 0.5).cast("long"))
      .as[(Long, Long)].collect()
      .sortBy { case (id, m) => (-m, id) }.toSeq
    assert(batch === fixed)
    // multi-query batch: docs with no query term never appear; each
    // query ranks independently
    val many = Seq((1L, "spark"), (1L, "merge"), (2L, "scan"))
      .toDF("query_id", "term")
    val out = Bm25.topKMany(fixture, "doc_id", "text", many, topK = 10)
      .select(col("query_id"), col("doc_id")).as[(Long, Long)]
      .collect().toSet
    assert(out.filter(_._1 == 1L).map(_._2) === Set(1L, 2L, 3L))
    assert(out.filter(_._1 == 2L).map(_._2) === Set(2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      Bm25.topKMany(fixture, "doc_id", "text",
        many.withColumnRenamed("term", "t"), topK = 10)
    }
    intercept[IllegalArgumentException] {
      Bm25.topKMany(fixture.withColumnRenamed("doc_id", "term"),
        "term", "text", many, topK = 10)
    }
  }

  test("pack: hand-checkable greedy recurrence incl. oversized docs") {
    import graft.pipeline.Pack
    val fixture = Seq(
      // stratum a, budget 10: 4+5 fit bin0; 3 overflows -> bin1; 12 is
      // oversized -> overflows into bin2 alone; 2 -> overflows 12's bin
      (1L, "a", 4L), (2L, "a", 5L), (3L, "a", 3L), (4L, "a", 12L),
      (5L, "a", 2L),
      // stratum b restarts at bin 0; oversized FIRST doc holds bin 0
      (6L, "b", 99L), (7L, "b", 1L))
      .toDF("doc_id", "stratum", "toks")
    val got = Pack.packGreedy(fixture, "doc_id", "toks", "stratum", 10L)
      .select(col("doc_id"), col("bin")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      6L -> 0L, 7L -> 1L))
  }

  test("pack: assignment is independent of input partitioning") {
    import graft.pipeline.Pack
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.packGreedy(df, "doc_id", "toks", "source", 512L)
        .select(col("doc_id"), col("bin")).as[(Long, Long)]
        .collect().toMap
    val a = run(base)
    val b = run(base.repartition(37))
    val c = run(base.repartition(1))
    assert(a === b && a === c)
    // every bin except possibly a stratum's last is filled past the
    // point where the next doc overflows: fill + next > budget
    val stats = Pack.binStats(
      Pack.packGreedy(base, "doc_id", "toks", "source", 512L),
      "doc_id", "toks", "source")
    assert(stats.filter(col("bin_tokens") > 512L &&
      col("n_docs") > 1L).count() === 0,
      "multi-doc bins must respect the budget")
    // null stratum packs as its own group
    val withNull = Seq((1L, null.asInstanceOf[String], 5L),
      (2L, null.asInstanceOf[String], 6L)).toDF("doc_id", "source", "toks")
    val n = Pack.packGreedy(withNull, "doc_id", "toks", "source", 10L)
      .select(col("doc_id"), col("bin")).as[(Long, Long)].collect().toMap
    assert(n === Map(1L -> 0L, 2L -> 1L))
    intercept[IllegalArgumentException] {
      Pack.packGreedy(base.withColumn("bin", lit(1L)), "doc_id", "toks",
        "source", 10L)
    }
    intercept[IllegalArgumentException] {
      Pack.packGreedy(base.withColumn("toks", col("toks").cast("int")),
        "doc_id", "toks", "source", 10L)
    }
  }

  test("search: conjunctive join == doc-local predicate per query") {
    import graft.pipeline.Search
    val qs = Seq((1L, "spark"), (1L, "join"), (2L, "dup"))
      .toDF("query_id", "term")
    val joined = Search.conjunctiveJoin(docs, "doc_id", "text", qs)
      .as[(Long, Long)].collect().toSet
    val q1 = docs.filter(Search.matchesAll(col("text"),
        Seq("spark", "join")))
      .select(col("doc_id")).as[Long].collect().toSet
    val q2 = docs.filter(Search.matchesAll(col("text"), Seq("dup")))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(joined === q1.map((1L, _)) ++ q2.map((2L, _)))
    assert(q1.nonEmpty && q2.nonEmpty, "fixture queries must match")
    // duplicate query rows must not double-count arity
    val dupQs = qs.union(qs)
    assert(Search.conjunctiveJoin(docs, "doc_id", "text", dupQs)
      .as[(Long, Long)].collect().toSet === joined)
    intercept[IllegalArgumentException] {
      Search.conjunctiveJoin(docs, "doc_id", "text",
        qs.withColumnRenamed("term", "t"))
    }
  }

  test("search: RRF fusion — hand-checkable scores, ties, guards") {
    import graft.pipeline.Search
    val legA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val legB = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = Search.rrfFuse(Seq(legA, legB), "doc_id", k0 = 60, k = 10)
      .orderBy(col("rank"))
      .select(col("doc_id"), col("rrf"), col("rank"))
      .as[(Long, Double, Int)].collect().toSeq
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // 20 hits both legs (1/62 + 1/61); singles order by their leg rank
    assert(fused === Seq(
      (20L, r6(1.0 / 62 + 1.0 / 61), 1),
      (10L, r6(1.0 / 61), 2),
      (40L, r6(1.0 / 62), 3),
      (30L, r6(1.0 / 63), 4)))
    // equal rounded rrf -> deterministic id tie-break
    val t = Search.rrfFuse(Seq(Seq((5L, 1)).toDF("doc_id", "rank"),
        Seq((3L, 1)).toDF("doc_id", "rank")), "doc_id")
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(t === Seq(3L, 5L))
    // k truncates the fused list, not the legs
    assert(Search.rrfFuse(Seq(legA, legB), "doc_id", k = 2)
      .count() === 2L)
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq(legA), "doc_id")
    }
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq(legA, legB.withColumnRenamed("rank", "r")),
        "doc_id")
    }
    // asLeg ranks by (score desc, id asc), densely from 1
    val scored = Seq((7L, 2.0), (9L, 2.0), (8L, 3.0))
      .toDF("doc_id", "score")
    assert(Search.asLeg(scored, "doc_id", "score")
      .orderBy(col("rank")).as[(Long, Int)].collect().toSeq ===
      Seq((8L, 1), (7L, 2), (9L, 3)))
  }

  test("pipeline e2e gate: bins account for exactly the kept-deduped docs") {
    val out = SparkEntry.queries("doc_pipeline_e2e")(spark, sf("sf0.001"))
      .collect()
    val binDocs = out.map(_.getAs[Long]("n_docs")).sum
    val binToks = out.map(_.getAs[Long]("bin_tokens")).sum
    // independent recomputation of the survivor set
    val kept = graft.pipeline.QualityRules.keepClean(docs, "text")
    val expected = kept
      .groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id"))
      .count()
    assert(binDocs === expected,
      "every kept-deduped doc lands in exactly one bin")
    assert(binToks > 0 && out.forall(r => r.getAs[Long]("bin_tokens") > 0))
  }

  test("split: disjoint, exhaustive, stable under corpus growth") {
    import graft.pipeline.Sample
    val fracs = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Sample.assignSplits(docs, col("doc_id"), fracs)
      .select(col("doc_id"), col("split")).as[(Long, String)]
      .collect().toMap
    assert(a.size === docs.count())
    val shares = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(shares.keySet === Set("train", "val", "test"))
    assert(shares("train") > shares("val") && shares("train") > shares("test"))
    // growth stability: the same rows keep their split when the corpus
    // doubles (row-number splits break exactly here)
    val grown = docs.union(docs.withColumn("doc_id",
      col("doc_id") + 1000000L))
    val b = Sample.assignSplits(grown, col("doc_id"), fracs)
      .select(col("doc_id"), col("split")).as[(Long, String)]
      .collect().toMap
    assert(a.forall { case (id, s) => b(id) == s })
    intercept[IllegalArgumentException] {
      Sample.assignSplits(docs, col("doc_id"),
        Seq(("a", 0.5), ("b", 0.4))) // does not sum to 1
    }
    intercept[IllegalArgumentException] {
      Sample.assignSplits(docs.withColumn("split", lit("x")),
        col("doc_id"), fracs)
    }
  }

  test("source overlap matrix: hand-checkable pair counts") {
    import graft.pipeline.Decontaminate
    val fixture = Seq(
      (1L, "a", "one two three four five six"),   // grams: 2 five-grams
      (2L, "b", "one two three four five"),       // shares "one..five" with a
      (3L, "c", "one two three four five"),       // and with b
      (4L, "d", "totally different words here now"))
      .toDF("doc_id", "src", "text")
    val got = Decontaminate.sourceOverlapMatrix(
        fixture, "doc_id", "src", "text", n = 5)
      .as[(String, String, Long)].collect().toSet
    // "one two three four five" is shared by a, b, c -> 3 pairs x 1 gram
    assert(got === Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("lm score: hand-checkable unigram surprisal micros") {
    import graft.pipeline.LmScore
    val fixture = Seq((1L, "a a b"), (2L, "b c"))
      .toDF("doc_id", "text")
    val got = LmScore.unigramLogProb(fixture, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    // total 5 tokens: P(a)=2/5, P(b)=2/5, P(c)=1/5
    def m(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    assert(got(1L) === ((3L, 2 * m(2.0 / 5) + m(2.0 / 5))))
    assert(got(2L) === ((2L, m(2.0 / 5) + m(1.0 / 5))))
    // corpus-typical docs (common words) outscore rare-token docs
    val rare = LmScore.unigramLogProb(docs, "doc_id", "text")
    assert(rare.count() === docs.filter(col("text").isNotNull).count())
    intercept[IllegalArgumentException] {
      LmScore.unigramLogProb(fixture.withColumn("__term", lit(1)),
        "doc_id", "text")
    }
  }

  test("bigram lm: hand-checkable interpolated micros") {
    import graft.pipeline.LmScore
    val fixture = Seq((1L, "a b a b"), (2L, "b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = LmScore.bigramLogProb(fixture, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap
    // unigrams over 7 tokens: a=2 b=3 c=1 x=1; bigrams: (a b)=2,
    // (b a)=1, (b c)=1. P(b|a)=0.9*(2/2)+0.1*(3/7), P(a|b)=0.9*(1/3)
    // +0.1*(2/7), P(c|b)=0.9*(1/3)+0.1*(1/7)
    def m(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val pBA = m(0.9 * (2.0 / 2.0) + 0.1 * (3.0 / 7.0))
    val pAB = m(0.9 * (1.0 / 3.0) + 0.1 * (2.0 / 7.0))
    val pCB = m(0.9 * (1.0 / 3.0) + 0.1 * (1.0 / 7.0))
    assert(got(1L) === ((3L, 2 * pBA + pAB)))
    assert(got(2L) === ((1L, pCB)))
    // a single-token doc has no bigram evidence -> absent, not zero
    assert(!got.contains(3L))
    // interpolation keeps every observed bigram finite; lambda bounds
    // and reserved names fail loudly
    intercept[IllegalArgumentException] {
      LmScore.bigramLogProb(fixture, "doc_id", "text", lambda = 1.0)
    }
    intercept[IllegalArgumentException] {
      LmScore.bigramLogProb(fixture.withColumn("__bi", lit(1)),
        "doc_id", "text")
    }
  }

  test("dsir: target-like docs outweigh raw-like docs; hashed variant " +
      "preserves the separation") {
    import graft.pipeline.Dsir
    // target speaks "alpha beta", raw speaks "gamma delta"; doc 5 is
    // target-like raw text, doc 6 is raw-like — DSIR must rank 5 > 6
    val fixture = Seq(
      (1L, true, "alpha beta alpha beta"),
      (2L, true, "beta alpha beta"),
      (3L, false, "gamma delta gamma delta"),
      (4L, false, "delta gamma delta"),
      (5L, false, "alpha beta alpha"),
      (6L, false, "gamma delta gamma"))
      .toDF("doc_id", "tgt", "text")
    val w = Dsir.importanceWeights(fixture, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, wm) => id -> ((n, wm)) }.toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // "alpha beta alpha" = 3 unigrams + 2 bigrams
    assert(w(5L)._1 === 5L)
    assert(w(5L)._2 > w(6L)._2)
    assert(w(1L)._2 > w(3L)._2)
    // the paper's hashed-feature form keeps the ordering (collisions
    // fold counts but cannot invert a strong separation at this size)
    val h = Dsir.importanceWeights(fixture, "doc_id", "text", col("tgt"),
        hashBuckets = Some(1 << 16))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, wm) => id -> wm }.toMap
    assert(h(5L) > h(6L) && h(1L) > h(3L))
    // gumbel-top-k: k bounds the output, selection is deterministic
    val weights = Dsir.importanceWeights(fixture, "doc_id", "text",
      col("tgt"))
    val s1 = Dsir.gumbelTopK(weights, "doc_id", 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = Dsir.gumbelTopK(weights, "doc_id", 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1.length === 3 && s1 === s2)
    // guards fail loudly
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(fixture.withColumn("__g", lit(1)),
        "doc_id", "text", col("tgt"))
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(fixture, "doc_id", "text", col("tgt"),
        hashBuckets = Some(1))
    }
    intercept[IllegalArgumentException] {
      Dsir.gumbelTopK(weights.drop("w_micros"), "doc_id", 3)
    }
  }

  test("hardening: reserved-name and null guards fail loudly") {
    import graft.pipeline.{LmScore, Pack, QualityRules, Search}
    intercept[IllegalArgumentException] {
      QualityRules.classify(docs.withColumn("n_words", lit(1L)), "text")
    }
    intercept[IllegalArgumentException] {
      QualityRules.classify(docs.withColumn("reason", lit("x")), "text")
    }
    intercept[IllegalArgumentException] {
      Search.conjunctiveJoin(docs.withColumnRenamed("doc_id", "term"),
        "term", "text", Seq((1L, "a")).toDF("query_id", "term"))
    }
    intercept[IllegalArgumentException] {
      LmScore.unigramLogProb(
        docs.withColumnRenamed("doc_id", "n_tokens"), "n_tokens", "text")
    }
    // null token count inside the packing walk fails with a message,
    // not an NPE from generated code
    val withNull = Seq((1L, "a", java.lang.Long.valueOf(5L)),
      (2L, "a", null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "src", "toks")
    val ex = intercept[Exception] {
      Pack.packGreedy(withNull, "doc_id", "toks", "src", 10L).collect()
    }
    assert(ex.getMessage != null)
    // streaming bm25 refuses an empty static corpus
    intercept[IllegalArgumentException] {
      graft.streaming.EventStream.bm25(
        docs, docs.filter(lit(false)), "doc_id", "text", Seq("spark"))
    }
  }

  test("quality rules: NULL text is dropped, empty text is measured") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val c = QualityRules.classify(df, "text")
    assert(c.count() === 1)
    val r = c.head()
    assert(r.getAs[Long]("doc_id") === 2L)
    // split("", " ") -> [""]: one zero-length word, fails the word-count
    assert(r.getAs[Long]("n_words") === 1L)
    assert(r.getAs[String]("reason") === "words")
  }
}
