package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}
import graft.pipeline.{Caches, Decontaminate, Dedup, Multimodal, Pq, Redact, Sample, Similarity}
import graft.pipeline.TextFunctions._

/** Training-data pipeline operators over `documents`/`embeddings`
  * (north-star surface): text statistics/quality, token counting, exact +
  * fingerprint + MinHash/SimHash dedup, language ID, embedding similarity.
  * SQL-expressible ops carry DuckDB oracles; LSH/custom-hash ops are gated
  * by ScalaTests against brute-force oracles instead (driver records
  * rows-only checks for them).
  */
object PipelineQueries {

  /** Evaluate the two INDEPENDENT legs of a dual-leg certificate gate
    * concurrently (round-12 verdict #2: the legs share zero code by
    * design, yet ran back-to-back, so the gate paid their sum while the
    * cluster sat mostly idle — tiny certificate stages never fill
    * local[32], let alone a real cluster). Each leg's eager portion (CC
    * fingerprint rounds, the driver union-find collect) submits jobs from
    * its own thread; Spark's scheduler interleaves them. Gate-harness
    * cost only — corpus operators stay single-plan. */
  private def legs[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future, Promise}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // propagate the caller thread's cache generation onto the leg
    // threads (review finding): Caches.currentGen is a ThreadLocal, so
    // without this every leg-internal persist registers as generation 0
    // and loses in-flight eviction protection under a concurrent
    // serving session
    val gen = graft.pipeline.Caches.capturedGen
    // Each leg runs under its own job group so a failure in one can
    // cancel the sibling's in-flight Spark jobs (review finding: the
    // old sequential Await surfaced a fast leg-b failure only after
    // leg a completed — or never, if a hung — and left the sibling's
    // jobs running detached after a failure).
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val tag = "graft-legs-" + java.util.UUID.randomUUID()
    def run[T](side: String)(body: => T): Future[T] = Future {
      sc.setJobGroup(s"$tag-$side", "dual-leg certificate gate",
        interruptOnCancel = true)
      try graft.pipeline.Caches.runWithGen(gen)(body)
      finally sc.clearJobGroup()
    }
    val fa = run("a")(a)
    val fb = run("b")(b)
    // fail-fast: EITHER leg's failure completes the promise immediately
    // (fa.zip(fb) alone would sit on a hung leg a while b's failure
    // waits unobserved). The STICKY cancel variant closes two races a
    // plain cancelJobGroup leaves open (review finding): the sibling
    // may not have submitted its first job yet, and a multi-job leg
    // would re-submit after a one-shot cancel — sticky cancellation
    // also fails every FUTURE submission in the group.
    val p = Promise[(A, B)]()
    fa.failed.foreach { e =>
      sc.cancelJobGroupAndFutureJobs(s"$tag-b"); p.tryFailure(e) }
    fb.failed.foreach { e =>
      sc.cancelJobGroupAndFutureJobs(s"$tag-a"); p.tryFailure(e) }
    p.completeWith(fa.zip(fb))
    Await.result(p.future, Duration.Inf)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text stats per language: whitespace token counting + lengths.
    // Exact-integer outputs only (sum+count instead of avg): integer sums
    // hash identically across engines; rounded doubles do not (VERDICT r1).
    "doc_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("lang"))
    }),

    // BPE-ish regex token counting (word pieces + punctuation).
    // Exact integers (total + doc count; avg is derivable client-side).
    "doc_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_bpe", regexp_count(col("text"), lit("\\w+|[^\\w\\s]")))
        .groupBy(col("source"))
        .agg(sum(col("n_bpe")).as("total_bpe"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    // Quality scoring: punctuation/whitespace/length ratios + thresholds.
    "doc_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_punct",
          length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .withColumn("n_spaces",
          length(col("text")) - length(regexp_replace(col("text"), " ", "")))
        .withColumn("punct_ratio", col("n_punct") / col("n_chars"))
        .withColumn("space_ratio", col("n_spaces") / col("n_chars"))
      docs.withColumn("quality",
        when(col("n_chars") >= 120 && col("space_ratio") > 0.1 &&
          col("punct_ratio") < 0.1, "good").otherwise("poor"))
        .groupBy(col("lang"), col("quality"))
        .agg(count(lit(1)).as("n"),
          Det.r(avg(col("space_ratio")), 6).as("avg_space_ratio"))
        .orderBy(col("lang"), col("quality"))
    }),

    // Exact dedup via content hash (also proves md5 parity with the oracle).
    "doc_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_hash"),
        countDistinct(col("text")).as("n_distinct_text"))
    }),

    // Representative selection (Dedup.keepBest): per exact-dup group,
    // keep the longest member (ties to smallest id) — one max_by
    // aggregate, partials-only shuffle; the oracle recomputes it as a
    // rank window, so two different algorithms must agree on every
    // group. Output is the distinct-text count at ANY clone multiplicity
    // (scale-flat on the key-shifted corpora by construction).
    "doc_dup_canonical" -> ((s, d) =>
      Dedup.keepBest(Tables.documents(s, d).filter(col("text").isNotNull),
          md5(col("text")), col("n_chars"), col("doc_id"))
        .orderBy(col("group_key"))),

    // Normalized dedup: fingerprint64 distinct count == distinct count of
    // whitespace/case-normalized text (differential check of normalization).
    "doc_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fingerprint64(col("text"))).as("n_distinct_fp"))
    }),

    // Duplicate-cluster resolution: exact-dup pairs (same md5) fed through
    // the distributed connected-components operator; components of a
    // same-hash clique are exactly the md5 groups, so the oracle is the
    // closed-form GROUP BY md5 HAVING count > 1. (Transitive, non-clique
    // convergence is asserted separately in PipelineSpec.)
    "doc_dup_clusters" -> ((s, d) => {
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val a = hashes.select(col("doc_id").as("id_a"), col("h"))
      val b = hashes.select(col("doc_id").as("id_b"), col("h").as("h2"))
      val pairs = a.join(b, col("h") === col("h2") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs)
        .groupBy(col("comp")).agg(count(lit(1)).as("n_dups"))
        .orderBy(col("comp"))
    }),

    // Same cluster resolution through the STAR-EDGE output mode (round-8
    // verdict #1): the expanded same-hash pair list above is quadratic in
    // clone multiplicity (C(n,2) edges per n-clique), while exactDupEdges
    // emits one member→rep edge per clone — linear — with provably the
    // same connected components. Shares doc_dup_clusters' closed-form
    // oracle, so the equivalence is hash-certified by DuckDB at every SF
    // (near-dup-family star equivalence is asserted in PipelineSpec).
    "doc_dup_clusters_star" -> ((s, d) => {
      val edges = Dedup.exactDupEdges(Tables.documents(s, d), "doc_id",
        md5(col("text")))
      Dedup.connectedComponents(edges)
        .groupBy(col("comp")).agg(count(lit(1)).as("n_dups"))
        .orderBy(col("comp"))
    }),

    // Language ID heuristic over the corpus (rows-only gate; accuracy is
    // asserted in PipelineSpec on real multilingual sentences).
    "doc_langid" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("pred", langid(col("text")))
        .groupBy(col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("pred"))
    }),

    // MinHash LSH near-dup candidate pairs, Jaccard-refined (rows-only
    // gate; LSH-vs-brute-force equivalence is asserted in PipelineSpec).
    // 8 bands x 8 rows: ~99% recall at j>=0.9 (the planted-dup regime)
    // while keeping low-jaccard candidate pairs ~100x rarer than 16x4 —
    // the LSH knob that matters at corpus scale. Output shape is
    // [[pairGate]]: the full sorted pair list at driver scale, an
    // order-free digest once the pair count outgrows a bounded sort.
    "doc_minhash_dedup" -> ((s, d) => {
      pairGate(
        Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
          numHashes = 64, bands = 8, shingle = 5, threshold = 0.7)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard")),
        "jaccard")
    }),

    // SimHash near-dup pairs (rows-only gate; pairGate output shape).
    "doc_simhash_dedup" -> ((s, d) => {
      pairGate(Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 6), "hamming")
    }),

    // Winnowing copy-detection (rows-only gate): the inverted-index
    // fingerprint join with a stop-fingerprint cap counted over DISTINCT
    // content on both paths (see Dedup.winnowPairs: a row-counted cap
    // LOSES recall, not just time, once clones inflate df past it) and
    // Contract.Auto for cost on clone-heavy corpora. pairGate output.
    // ONE memoized fingerprint/candidate pass feeds this gate and
    // doc_winnow_sound (round-16 verdict #1 — the Shared suffix).
    "doc_winnow_pairs" -> ((s, d) => {
      pairGate(Dedup.winnowPairsShared(Tables.documents(s, d), "doc_id",
        "text", shingle = 12, window = 16, maxDf = 20, minShared = 10),
        "shared_fps")
    }),

    // EXACT n-gram Jaccard similarity join (prefix-filtered AllPairs —
    // the zero-recall-loss member of the dedup family, and the only one
    // with a full hash oracle: deterministic values, no seeded LSH).
    // Gated on a CONSTANT deterministic id-slice (the emb_neardup exact-
    // oracle pattern): exact all-pairs on the single-topic synthetic
    // corpus is candidate-dense by construction — every doc shares the
    // ~20-word vocabulary, so prefix filtering can prune little and the
    // full-corpus exact join costs candidate-quadratic verify time (the
    // measurement that motivates the LSH family: doc_minhash_dedup IS the
    // full-corpus scale path for this measure). Det.r for the portable
    // rounding (see Det.scala).
    "doc_jaccard_pairs" -> ((s, d) => {
      // the slice plan is built EXACTLY as doc_jaccard_clusters_star
      // builds it (projection before filter) so the two gates share ONE
      // memoized AllPairs pass (round-17 verdict #2: this gate
      // recomputed the identical doc_id < 1000 exact pair list the
      // clusters gate had just materialized). The DuckDB full hash
      // oracle is unchanged — it certifies the contracted production
      // path against the expanded raw SQL twin.
      val slice = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000)
      Dedup.jaccardBothModesShared(slice, "doc_id", "text",
        shingle = 5, threshold = 0.7)._2
        .select(col("id_a"), col("id_b"), Det.r(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Near-dup cluster resolution through STAR edges (round-10 verdict
    // #5): `connectedComponents` over star edges — the linear-output
    // path a 100 TB dedup pipeline actually runs — must produce the
    // SAME components as the expanded pair list. The two legs run
    // DIFFERENT cluster-resolution code paths (star: member→rep edges
    // → distributed large/small-star CC; expanded: full clique pairs →
    // driver union-find) above ONE shared banding/candidate pass
    // (minhashBothModes — round-15 verdict #2; contracted-vs-raw pair
    // equality is certified separately). Both label maps use comp = min
    // id, so partition equality is exact (id, comp) equality: violations
    // count full-outer-join rows that disagree or appear on one side
    // only. minhash is seeded, so the oracle is the certificate form —
    // closed-form n_docs anchor + zero violations (PipelineSpec asserts
    // the same equivalence structurally at unit scale; this gate
    // certifies it under the oracle harness at every SF).
    // Above ~sf0.1's corpus size both legs run on a deterministic bounded
    // id-slice (round-11 verdict #2, the emb_neardup sliced-oracle
    // pattern): the certificate's expanded leg is DELIBERATELY quadratic
    // (that is what it certifies against), and at sf10 the full dual-leg
    // form cost 190.9 s — 42% of the soak — to re-prove a property a
    // sliced certificate proves for pennies. The slice spans all
    // key-shifted clone copies (ids ≡ 0 mod step survive the 1e8-multiple
    // shifts), so exact-clone cliques and the contraction machinery stay
    // exercised; at every driver gate SF (≤ 5000 docs) the slice is the
    // whole corpus and the gate is byte-identical to its pre-slice form.
    // PipelineSpec additionally proves full (unsliced) equality at unit
    // scale. The n_docs anchor stays the FULL corpus count.
    "doc_neardup_clusters_star" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // project to the two columns the legs read BEFORE slicing so the
      // one wide scan this gate cannot avoid (a modulo slice hits every
      // row group) reads only (doc_id, text), not the whole row; the
      // slice persist lives INSIDE the shared edge builder now (a memo
      // hit never scans the corpus at all)
      val cert = Dedup.slicedById(docs.select(col("doc_id"), col("text")),
        "doc_id", maxRows = 5000L)
      // ONE banding/candidate pass feeds both legs (round-15 verdict
      // #2), which stay independent strictly ABOVE the persisted edge
      // list: distributed large/small-star CC vs driver union-find (an
      // INDEPENDENT algorithm, zero shared code past the edges),
      // evaluating CONCURRENTLY (see `legs`). The union-find leg
      // consumes rep pairs + clique membership DIRECTLY rather than the
      // expanded clique pairs (round-16 verdict #2): expansion is
      // implied by contraction — a clique's complete graph and its star
      // connect the same vertex set — so it added cost (clone-quadratic,
      // the top of the sf0.1 wall two rounds running), not information.
      // Contracted-vs-raw pair equality is certified separately
      // (doc_jaccard_pairs full hash oracle; PipelineSpec unit proofs
      // for the seeded minhash family, including star ≡ expanded).
      val edges = Dedup.minhashStarEdgesShared(cert, "doc_id", "text",
        numHashes = 64, bands = 8, shingle = 5, threshold = 0.7)
      val (star, expanded) = legs(
        Dedup.connectedComponents(edges)
          .select(col("id"), col("comp")).collect(),
        Dedup.localComponents(edges)
          .select(col("id"), col("comp")).collect())
      // full-outer label equality counted in the DRIVER over the two
      // collected maps: both sides are bounded by the certificate slice
      // (≤ 5000 ids by construction — localComponents already collects
      // its side), and the comparison is harness, not engine path —
      // dropping the full-outer-join job cuts a fixed per-gate Spark
      // round-trip without weakening what the legs certify (round-17
      // verdict #3). The label-producing algorithms stay exactly as
      // before: distributed large/small-star CC vs driver union-find.
      val starMap = star.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expMap = expanded.map(r => r.getLong(0) -> r.getLong(1)).toMap
      // toMap keeps the LAST entry on a duplicate key, which would mask
      // a CC bug emitting one id under two conflicting labels — fail
      // loud instead (each leg must label every id exactly once)
      require(star.length == starMap.size,
        s"connectedComponents emitted duplicate ids: ${star.length} rows, " +
          s"${starMap.size} distinct")
      require(expanded.length == expMap.size,
        s"localComponents emitted duplicate ids: ${expanded.length} rows, " +
          s"${expMap.size} distinct")
      val nViol = (starMap.keySet ++ expMap.keySet).count { id =>
        starMap.get(id) != expMap.get(id) // None != Some also violates
      }.toLong
      docs.agg(count(lit(1)).as("n_docs"))
        .withColumn("n_violations", lit(nViol))
    }),

    // Jaccard-family cluster resolution through STAR edges (round-11
    // verdict #4): `connectedComponents` over star edges vs driver
    // union-find over the expanded pair list — two distinct CC code
    // paths above ONE shared candidate pass (the same equality the
    // minhash certificate proves), but on the family's EXACT member,
    // whose pairs are fully deterministic (no seeded hashes). That makes
    // this the only edges-mode gate with a FULL hash oracle: the per-
    // component rows (comp = min id, n_members) are reproduced in DuckDB
    // by a recursive-CTE transitive closure over the same pair SQL as
    // doc_jaccard_pairs, and the appended n_violations column (star CC vs
    // expanded CC, full-outer equality) is asserted zero. Gate slice
    // doc_id < 1000 as in doc_jaccard_pairs — slice-constant cost at
    // every SF of the key-shifted corpora.
    "doc_jaccard_clusters_star" -> ((s, d) => {
      // the slice plan is built EXACTLY as doc_jaccard_pairs builds it
      // (shared memo key); jaccardBothModesShared persists it for the
      // build — a memo hit never scans the corpus at all
      val slice = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1000)
      // ONE AllPairs candidate pass feeds both legs (round-15 verdict
      // #2; pair list persisted + materialized in jaccardBothModes);
      // legs evaluate CONCURRENTLY and independently ABOVE the pairs —
      // expanded leg via driver union-find (see
      // doc_neardup_clusters_star)
      val (edges, pairs) = Dedup.jaccardBothModesShared(slice,
        "doc_id", "text", shingle = 5, threshold = 0.7)
      val (star, expanded) = legs(
        Dedup.connectedComponents(edges),
        Dedup.localComponents(pairs.select(col("id_a"), col("id_b"))))
      val viol = star.select(col("id").as("__id"), col("comp").as("__cs"))
        .join(expanded.select(col("id").as("__id"), col("comp").as("__ce")),
          Seq("__id"), "full_outer")
        .withColumn("__v",
          when(col("__cs").isNull || col("__ce").isNull ||
            col("__cs") =!= col("__ce"), 1L).otherwise(0L))
        .agg(coalesce(sum(col("__v")), lit(0L)).cast("long")
          .as("n_violations"))
      star.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
        .crossJoin(viol)
        .orderBy(col("comp"))
    }),

    // Train/eval decontamination (Decontaminate.overlap): every 97th doc
    // id stands in for a benchmark corpus, the rest is the training side;
    // flag train docs sharing any word 5-gram with the eval side (n is a
    // knob — published pipelines run 8-13; 5 keeps the gate non-vacuous
    // on this synthetic word-soup corpus, where exact longer-gram
    // collisions only exist between planted clones). Exact strings, no
    // seeds -> full hash oracle. The eval gram set is BROADCAST
    // (benchmark corpora stay small at any train scale).
    "doc_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 97L === 0L)
      val train = docs.filter(col("doc_id") % 97L =!= 0L)
      Decontaminate.overlap(train, evalSet, "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // The 8-byte hashed-gram probe (`hashed = true`) — the declared
    // 100 TB shape of decontamination — under the SAME full hash oracle
    // as the exact gate (round-12 directive #4): an xxhash64 collision
    // can only OVERcount n_hit (never undercount), at ~2^-64 per
    // (train-gram, eval-gram) pair, so at any driver gate scale the
    // hashed result is value-identical to the exact one and the exact
    // DuckDB SQL doubles as its oracle. A collision would surface as a
    // loud hash-mismatch here, not a silent pass.
    "doc_contamination_hashed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 97L === 0L)
      val train = docs.filter(col("doc_id") % 97L =!= 0L)
      Decontaminate.overlap(train, evalSet, "doc_id", "text", n = 5,
        hashed = true)
        .orderBy(col("doc_id"))
    }),

    // Duplicated-substring-span fraction (Dedup.substringDup): strided
    // 40-char windows attributed to their lowest-doc-id owner; a doc's
    // dup_frac is the share of its windows owned by an earlier doc.
    // Exact strings, no seeds -> full hash oracle.
    "doc_substring_dup" -> ((s, d) =>
      Dedup.substringDup(Tables.documents(s, d), "doc_id", "text",
        window = 40, stride = 20)
        .orderBy(col("doc_id"))),

    // Gopher-style repetition quality rules (Rae et al. 2021 §A1.1, as
    // published thresholds' shape over this corpus's word-level signals):
    // per-doc duplicate-word fraction, top word-2-gram occupancy, and
    // duplicate word-5-gram fraction; docs breaching any threshold are
    // 'reject'. The gate aggregates per (lang, verdict) with
    // EXACT-INTEGER micro-sums of the per-doc fractions (floor(x*1e6+.5)
    // as BIGINT): integer sums hash identically across engines in any
    // aggregation order, where a float mean would be at the mercy of
    // summation order (doc_stats precedent, VERDICT r1).
    "doc_repetition" -> ((s, d) => {
      def micros(c: Column): Column =
        floor(c * 1000000.0 + lit(0.5)).cast("long")
      // every metric is doc-LOCAL, so all three are computed with
      // higher-order array functions inside one scan — no gram explode,
      // no per-gram shuffle, no self-joins; the only exchange in the
      // whole plan is the final (lang, verdict) aggregate. The top-gram
      // count sorts the doc's 2-grams and takes the longest equal run
      // (O(n log n) per doc; the transform-filter form was O(distinct x
      // total) string compares — a one-doc straggler on pathological
      // long documents).
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d).filter(col("text").isNotNull), col("doc_id"))
        .select(col("lang"), Decontaminate.normCol(col("text")).as("__norm"))
        .withColumn("__words", split(col("__norm"), " "))
        .withColumn("n_words", size(col("__words")).cast("long"))
        .filter(col("n_words") >= 5L)
        .withColumn("__g2", Decontaminate.wordGrams(col("__norm"), 2))
        .withColumn("__g5", Decontaminate.wordGrams(col("__norm"), 5))
      val per = base
        .withColumn("__dup_word_frac",
          (col("n_words") - size(array_distinct(col("__words"))))
            .cast("double") / col("n_words"))
        .withColumn("__top2", expr(
          """aggregate(array_sort(__g2),
               named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
                            'best', 0L),
               (acc, x) -> named_struct(
                 'prev', x,
                 'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
                 'best', GREATEST(acc.best,
                   IF(x <=> acc.prev, acc.run + 1L, 1L))),
               acc -> acc.best)"""))
        .withColumn("__top2_frac",
          col("__top2").cast("double") / size(col("__g2")))
        .withColumn("__dup5_frac",
          (size(col("__g5")) - size(array_distinct(col("__g5"))))
            .cast("double") / size(col("__g5")))
        .withColumn("verdict",
          when(col("__dup_word_frac") > 0.6 || col("__top2_frac") > 0.2 ||
            col("__dup5_frac") > 0.15, "reject").otherwise("keep"))
      per.groupBy(col("lang"), col("verdict"))
        .agg(count(lit(1)).as("n"),
          sum(micros(col("__dup_word_frac"))).as("sum_dup_word_micros"),
          sum(micros(col("__top2_frac"))).as("sum_top2_micros"),
          sum(micros(col("__dup5_frac"))).as("sum_dup5_micros"))
        .orderBy(col("lang"), col("verdict"))
    }),

    // PII redaction (Redact): the corpus carries no digits or @-signs,
    // so the gate derives a deterministic PII-bearing text from corpus
    // columns (same construction in the oracle SQL — both engines redact
    // the same input) and hash-compares per-category counts AND the md5
    // of the redacted BYTES: the gate certifies that Java and RE2 agree
    // on the whole pattern set over every doc, not just that some regex
    // matched. Patterns are restricted to the engine-identical regex
    // subset (see Redact's scaladoc); the adversarial edge cases (octet
    // bounds, separators) are PipelineSpec-gated with expected outputs.
    "doc_pii" -> ((s, d) => {
      val aug = concat(col("text"),
        lit(" contact "), col("source"), lit("@example.com ip 10."),
        (col("doc_id") % 250).cast("string"), lit(".0."),
        (col("doc_id") % 200).cast("string"),
        lit(" ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" call 555-867-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        when(col("doc_id") % 3 === 0, lit(" cc bob@test.org"))
          .otherwise(lit("")))
      // gate slice doc_id < 10000 (slice-constant on the key-shifted
      // corpora, the doc_jaccard_pairs pattern): 8 regex passes over the
      // FULL corpus is pure gate-harness cost — 10.7 s at sf1, ~100 s
      // projected at sf10 — while the slice certifies the same
      // cross-engine regex agreement at every SF for a flat price. The
      // operator itself is a stateless scan (Redact's scaladoc).
      // spreadSmall (round 19): the regex work is scan-side CPU and the
      // slice reads a handful of row groups — without the spread the 8
      // passes serialized on 4 of 32 cores. The slice filter stays
      // INSIDE the spread argument so it still pushes into the parquet
      // scan (only slice survivors shuffle).
      Decontaminate.spreadSmall(
          Tables.documents(s, d).filter(col("text").isNotNull)
            .filter(col("doc_id") < 10000), col("doc_id"))
        .select(col("doc_id"), aug.as("__t"))
        .select(col("doc_id"),
          Redact.countOf(col("__t"), "email").cast("long").as("n_email"),
          Redact.countOf(col("__t"), "ip").cast("long").as("n_ip"),
          Redact.countOf(col("__t"), "ssn").cast("long").as("n_ssn"),
          Redact.countOf(col("__t"), "phone").cast("long").as("n_phone"),
          md5(Redact.redact(col("__t"))).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC canonicalization (UnicodeNormalize): the corpus is
    // ASCII, so the gate appends a deterministic decomposed sequence
    // (combining acute/grave + a precomposed char) built identically in
    // the oracle via chr() — both engines implement UAX #15, so char
    // counts before/after and the md5 of the normalized BYTES must
    // hash-match on every doc. Same doc_pii slice convention.
    "doc_unicode" -> ((s, d) => {
      // " nfc e<U+0301 combining acute> A<U+0300 combining grave><U+00E9 precomposed>"
      // explicit escapes, NOT glyphs: decomposed-vs-precomposed is
      // exactly what the gate certifies, and raw combining marks in
      // source are one editor-normalization away from silent change
      val aug = concat(col("text"),
        lit(" nfc e\u0301 A\u0300\u00e9"))
      Tables.documents(s, d).filter(col("text").isNotNull)
        .filter(col("doc_id") < 10000)
        .select(col("doc_id"), aug.as("__t"))
        .select(col("doc_id"),
          length(col("__t")).cast("long").as("n_chars_raw"),
          length(unicode_normalize(col("__t"))).cast("long")
            .as("n_chars_nfc"),
          md5(unicode_normalize(col("__t"))).as("nfc_md5"))
        .orderBy(col("doc_id"))
    }),

    // Compression-ratio quality signal (DeflateLen): repetitive text
    // compresses far below prose (Gopher §A1 / RedPajama-v2 ship this
    // as a filter). No SQL engine computes deflate, so the gate is a
    // SELF-CERTIFICATE (the _sound pattern): per-lang exact-integer
    // micro-sums of the ratio plus n_violations over two invariants
    // every correct deflate must satisfy — 0 < len <= raw+64, and
    // doubled text is sub-additive (deflate(t||t) < 2·deflate(t)+64,
    // the back-reference property that makes the ratio a repetition
    // signal at all). PipelineSpec asserts n_violations == 0 and pins
    // ratio ordering on planted repetitive vs prose fixtures. Same
    // doc_pii slice convention; the operator is a stateless scan.
    "doc_compress" -> ((s, d) => {
      def micros(c: Column): Column =
        floor(c * 1000000.0 + lit(0.5)).cast("long")
      // octet_length, not length: deflate_len counts UTF-8 BYTES, and
      // comparing bytes against CHARACTERS would flag correct deflates
      // on any multi-byte text (review finding; dormant on ASCII)
      val per = Tables.documents(s, d).filter(col("text").isNotNull)
        .filter(col("doc_id") < 10000)
        .select(col("doc_id"), col("lang"),
          octet_length(col("text")).cast("long").as("__raw"),
          deflate_len(col("text")).as("__z"),
          deflate_len(concat(col("text"), col("text"))).as("__z2"))
        .withColumn("__ratio",
          col("__z").cast("double") / greatest(col("__raw"), lit(1L)))
        .withColumn("__bad",
          (col("__z") <= 0L || col("__z") > col("__raw") + 64L ||
            col("__z2") >= col("__z") * 2L + 64L).cast("long"))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(micros(col("__ratio"))).as("sum_ratio_micros"),
          sum(col("__bad")).as("n_violations"))
        .orderBy(col("lang"))
    }),

    // Deterministic hash-threshold sampling (Sample.byHash): keep a doc
    // iff the first 8 hex chars of md5(doc_id) sort below the 10%
    // threshold — the stateless, shuffle-free, engine-portable mixture
    // sampler (md5 because Spark and DuckDB agree on it byte-for-byte;
    // the emitted hash key makes the parity explicit). Quota-exact
    // stratified sampling (window form) is PipelineSpec-gated.
    "doc_sample" -> ((s, d) =>
      Sample.byHash(Tables.documents(s, d), col("doc_id"), 0.1)
        .select(col("doc_id"), col("lang"),
          Sample.hashKey(col("doc_id")).as("hk"))
        .orderBy(col("doc_id"))),

    // Budget-balanced mixture (Sample.mixtureBalanced): every source
    // down-sampled to the smallest source's char budget — tiny agg ->
    // broadcast rates -> stateless Weyl-hash threshold scan; no window,
    // no per-stratum shuffle. Gate slice doc_id < 1e8 is a no-op on the
    // base corpus and holds output size flat on the key-shifted scale
    // corpora (rates are scale-invariant there anyway: every source
    // replicates uniformly).
    "doc_mixture" -> ((s, d) =>
      Sample.mixtureBalancedRated(
          Tables.documents(s, d).filter(col("doc_id") < 100000000L),
          col("source"), col("doc_id"), col("n_chars"), "rate")
        .select(col("doc_id"), col("source"), col("rate"))
        .orderBy(col("doc_id"))),

    // Per-source document cap (Sample.capPerStratum): at most 5 docs per
    // source by deterministic Weyl-hash rank. The rank-filter window is
    // exactly what Catalyst rewrites to a WindowGroupLimit — each input
    // partition pre-prunes to its local top-5 per source BEFORE the
    // exchange, so the shuffle moves O(cap x sources x partitions) rows
    // however large or skewed the sources are (plan pinned in
    // PipelineSpec). Same slice convention as doc_mixture.
    "doc_source_cap" -> ((s, d) =>
      Sample.capPerStratumRanked(
          Tables.documents(s, d).filter(col("doc_id") < 100000000L),
          col("source"), col("doc_id"), 5, "cap_rk")
        .select(col("doc_id"), col("source"), col("cap_rk"))
        .orderBy(col("source"), col("cap_rk"))),

    // Temperature (alpha=0.5) mixture sampling (Sample.mixtureTemperature):
    // keep-rate (total_s/total_min)^(alpha-1) lifts low-resource sources —
    // the XLM-R/mC4 rebalancing recipe. Same zero-corpus-shuffle plan as
    // doc_mixture; the emitted rate is Det.r-rounded on both sides
    // because pow (unlike the mixture's division) is not IEEE-exact
    // across engines.
    "doc_mixture_temp" -> ((s, d) =>
      Sample.mixtureTemperature(
          Tables.documents(s, d).filter(col("doc_id") < 100000000L),
          col("source"), col("doc_id"), col("n_chars"), alpha = 0.5,
          rateName = Some("rate"))
        .select(col("doc_id"), col("source"),
          Det.r(col("rate"), 9).as("rate"))
        .orderBy(col("doc_id"))),

    // C4-style duplicate-line removal (Lines.lineDedup). The corpus is
    // single-line bag-of-words text, so the gate derives a deterministic
    // multi-line document from corpus columns (the doc_pii precedent):
    // per-source and per-lang boilerplate lines that repeat across
    // hundreds of docs (removed everywhere but their first occurrence),
    // the unique body (kept), and a 3-char "faq" line below minLineLen
    // (duplicated everywhere yet KEPT — ineligible lines never dedup).
    // Full corpus computed; output sliced to the base ids so it stays
    // flat on the key-shifted scale corpora, where the clones' repeated
    // bodies also dedup toward the in-slice originals.
    "doc_line_dedup" -> ((s, d) => {
      val derived = Tables.documents(s, d).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("subscribe to "), col("source"), lit(" newsletter")),
          col("text"),
          lit("faq"),
          concat(lit("copyright "), col("lang"), lit(" wiki"))).as("text"))
      graft.pipeline.Lines.lineDedup(derived, "doc_id", "text",
          minLineLen = 5)
        .filter(col("doc_id") < 100000000L)
        .select(col("doc_id"),
          when(length(col("text")) === 0, lit(0L))
            .otherwise(size(split(col("text"), "\n")).cast("long"))
            .as("n_kept"),
          md5(col("text")).as("h"))
        .orderBy(col("doc_id"))
    }),

    // Exact incremental dedup via sharded Bloom filters (Bloom.newRows):
    // "is this batch new against the corpus?" without shuffling the
    // corpus. The batch is the base-id slice with ids % 3 == 0 carrying
    // corpus text verbatim (duplicates -> dropped) and the rest a
    // ' novel'-suffixed variant (new -> kept); the EXISTING side is the
    // full corpus, so the probe stays fixed while the corpus scales
    // 100x underneath it. The bloom prunes, the broadcast semi-join
    // confirms, and the final answer is exact — hence the full oracle.
    "doc_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val inc = docs.filter(col("doc_id") < 100000000L)
        .select(col("doc_id"), col("lang"),
          when(pmod(col("doc_id"), lit(3)) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" novel"))).as("text"))
      graft.pipeline.Bloom.newRows(docs, inc, col("text"),
          expectedExisting = 4000000L, fpp = 0.01, shards = 32)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
    }),

    // Corpus-frequency top-k word n-grams (with multiplicity — the
    // corpus-analysis headline list, not the per-doc distinct form the
    // contamination probe uses). Plan: map-side gram explode, partial
    // aggregate on the gram key, TakeOrderedAndProject for the top-k —
    // nothing but gram partials and the k winners ever cross the wire.
    // Ties broken by gram text so the cut is total-ordered. The gram
    // build is scan-side CPU -> spreadSmall unlocks cores on
    // single-row-group inputs (no-op on any real multi-split table).
    "doc_top_ngrams" -> ((s, d) =>
      Decontaminate.spreadSmall(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("doc_id"))
        .select(explode(Decontaminate.wordGrams(
          Decontaminate.normCol(col("text")), 3)).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram")).limit(50)),

    // Context-window token chunking (Chunk.chunkTokens): 32-token
    // windows, 8-token stride overlap — doc-local transform+posexplode,
    // ZERO exchanges before the output sort. Input sliced to the base
    // ids (chunking has no cross-doc interaction, so the slice loses
    // nothing and the gate stays flat on the scale corpora).
    "doc_chunks" -> ((s, d) =>
      graft.pipeline.Chunk.chunkTokens(
          Tables.documents(s, d).filter(col("doc_id") < 100000000L),
          "doc_id", "text", maxTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk")).as("h"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // C4/Gopher document-level quality rules (QualityRules.classify):
    // first-fail classification over exact-integer surface metrics —
    // one scan (spreadSmall-unlocked doc-local HOFs), ONE exchange (the
    // per-(source, reason) aggregate). The id checksum makes the hash
    // oracle certify the exact per-document classification, not just
    // the class sizes.
    "doc_quality_rules" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d), col("doc_id"))
      graft.pipeline.QualityRules.classify(base, "text")
        .groupBy(col("source"), col("reason"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_words")).as("sum_words"),
          sum(col("n_stop_hits")).as("sum_stop_hits"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("source"), col("reason"))
    }),

    // Corpus-unigram surprisal (LmScore.unigramLogProb): CCNet-shaped
    // LM quality signal; per-term logprobs rounded to integer micros
    // ONCE, all sums exact integers (order-free). Corpus-wide
    // frequencies; output sliced to the base ids (doc_pii convention).
    "doc_lm_score" -> ((s, d) =>
      graft.pipeline.LmScore.unigramLogProb(
          Tables.documents(s, d), "doc_id", "text")
        .filter(col("doc_id") < 1000L)
        .orderBy(col("doc_id"))),

    // Interpolated bigram LM scoring (LmScore.bigramLogProb): one
    // Markov order up from doc_lm_score — the CCNet perplexity-filter
    // model class. Scan-side bigram HOF (no token self-join), one
    // reused bigram-key exchange, vocab-sized unigram attachments.
    "doc_lm_bigram" -> ((s, d) =>
      graft.pipeline.LmScore.bigramLogProb(
          Tables.documents(s, d), "doc_id", "text")
        .filter(col("doc_id") < 1000L)
        .orderBy(col("doc_id"))),

    // DSIR importance weights (Dsir.importanceWeights): Laplace-smoothed
    // target/raw log-ratio over unigram+bigram features — domain-targeted
    // data selection (Xie et al. 2023). One gram-key exchange serves the
    // conditional count agg AND the probe join; totals broadcast.
    "doc_dsir" -> ((s, d) =>
      graft.pipeline.Dsir.importanceWeights(
          Tables.documents(s, d), "doc_id", "text",
          col("source") === lit("src0"))
        .filter(col("doc_id") < 1000L)
        .orderBy(col("doc_id"))),

    // DSIR Gumbel-top-k resampling (Dsir.gumbelTopK): deterministic
    // weylHash-derived Gumbel noise on the log-weights, distributed
    // TakeOrderedAndProject top-k — the full select step, oracle-able
    // end to end because the noise stream has a DuckDB twin.
    "doc_dsir_sample" -> ((s, d) =>
      graft.pipeline.Dsir.gumbelTopK(
        graft.pipeline.Dsir.importanceWeights(
            Tables.documents(s, d), "doc_id", "text",
            col("source") === lit("src0")),
        "doc_id", k = 100)
        .orderBy(col("doc_id"))),

    // DSIR hashed-feature batch path (hash64 = full 8-byte xxhash64
    // gram keys — the declared 100 TB shape: longs cross the exchange,
    // never gram strings) under the SAME exact-string oracle, the
    // doc_contamination_hashed argument: a key collision needs ~2^-64
    // per gram pair, so at any gate scale counts, vocabulary size, and
    // therefore every w_micros are value-identical to the exact form —
    // a collision would surface as a loud hash mismatch, not a silent
    // pass. (The fixed-bucket `hashBuckets` form intentionally
    // collides — that one is gated by the streaming ≡ batch twin.)
    "doc_dsir_hashed" -> ((s, d) =>
      graft.pipeline.Dsir.importanceWeights(
          Tables.documents(s, d), "doc_id", "text",
          col("source") === lit("src0"), hash64 = true)
        .filter(col("doc_id") < 1000L)
        .orderBy(col("doc_id"))),

    // Inter-source n-gram overlap matrix
    // (Decontaminate.sourceOverlapMatrix): one gram-key exchange with
    // bounded collect_set partials; pair expansion on single-gram rows.
    "doc_source_overlap" -> ((s, d) =>
      Decontaminate.sourceOverlapMatrix(
          Tables.documents(s, d), "doc_id", "source", "text", n = 5)
        .orderBy(col("source_a"), col("source_b"))),

    // Deterministic train/val/test split (Sample.assignSplits):
    // md5-prefix thresholds — stable under corpus growth, zero
    // exchanges before the gate's aggregate.
    "doc_split" -> ((s, d) =>
      Sample.assignSplits(Tables.documents(s, d), col("doc_id"),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("source"), col("split"))),

    // The corpus-prep chain as ONE composed plan: quality rules (keep
    // only) -> exact dedup keep-first (one window exchange on the text
    // hash) -> greedy packing -> per-bin stats. Three corpus-sized
    // exchanges end to end — the honest shape of the full prep pipeline
    // at any scale — with rule metrics computed once and reused as the
    // packing token counts. The oracle chains the same three stages in
    // SQL (CASE ladder -> QUALIFY-style row_number -> recursive CTE).
    "doc_pipeline_e2e" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d), col("doc_id"))
      val classified = graft.pipeline.QualityRules.classify(base, "text")
        .filter(col("reason") === "keep")
        .select(col("doc_id"), col("source"), col("text"),
          col("n_words").as("n_tokens"))
      val deduped = classified
        .withColumn("__dn", row_number().over(
          Window.partitionBy(md5(col("text").cast("binary")))
            .orderBy(col("doc_id"))))
        .filter(col("__dn") === 1)
        .select(col("doc_id"), col("source"), col("n_tokens"))
      val packed = graft.pipeline.Pack.packGreedy(
        deduped, "doc_id", "n_tokens", "source", budget = 512L)
      graft.pipeline.Pack.binStats(packed, "doc_id", "n_tokens", "source")
        .orderBy(col("source"), col("bin"))
    }),

    // Conjunctive multi-query search (Search.conjunctiveJoin): per-doc
    // distinct terms explode map-side, broadcast query-term semi-join
    // prunes BEFORE the exchange, one (doc, query) arity count — the
    // inverted-index probe; shuffled rows bounded by query-term hits.
    "doc_search" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((1L, "spark"), (1L, "join"), (2L, "merge"),
        (2L, "window"), (2L, "sort"), (3L, "dup"))
        .toDF("query_id", "term")
      graft.pipeline.Search.conjunctiveJoin(
          Decontaminate.spreadSmall(Tables.documents(s, d), col("doc_id")),
          "doc_id", "text", qs)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_matches"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("query_id"))
    }),

    // Greedy sequence packing (Pack.packGreedy): context-budget bin
    // packing of whitespace token counts, per source stratum in doc_id
    // order — ONE stratum-key exchange + a sequential per-partition
    // walk; the per-bin aggregate hash-checks every bin assignment via
    // the id checksum (the oracle replays the same recurrence with a
    // recursive CTE).
    "doc_pack" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("doc_id"))
        .select(col("doc_id"), col("source"),
          size(split(Decontaminate.normCol(col("text")), " "))
            .cast("long").as("n_tokens"))
      val packed = graft.pipeline.Pack.packGreedy(
        base, "doc_id", "n_tokens", "source", budget = 512L)
      graft.pipeline.Pack.binStats(packed, "doc_id", "n_tokens", "source")
        .orderBy(col("source"), col("bin"))
    }),

    // Tokenizer-grade token counting (TokenCountExpr): the
    // subword-budget scheme — letter runs ceil(len/6), digit runs
    // ceil(len/3), other non-whitespace code points 1 — as a codegen'd
    // scan-side expression; exact integer aggregates per source.
    "doc_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tok", token_count(col("text")))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_tokens"))
        .orderBy(col("source"))),

    // Tokenizer-EXACT BPE counting (BpeTokenCountExpr): the committed
    // byte-level merge table (src/main/resources/graft/bpe_merges.txt,
    // trained offline by tools/train_bpe.py) applied per document —
    // budgets in the exact tokens this vocabulary yields. The merge
    // loop is not SQL-expressible, so the FULL hash oracle replays the
    // committed per-text counts (gen_bpe_counts.py — the emb_pca
    // model-as-data pattern, round-17 verdict #4); the live expression
    // stays independently pinned by tools/bpe_oracle.py (a Python
    // tokenizer reimplementation over the same parquet + merge file)
    // and the paired _sound certificate below.
    "doc_tokens_bpe" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tok", bpe_token_count(col("text")))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_tokens"))
        .orderBy(col("source"))),

    // BPE-count soundness certificate (full hash oracle): per document,
    // the BPE count must sit inside the structural byte bounds —
    // ceil(nonws_utf8_bytes / maxTokenBytes) <= n_tok <= nonws_bytes
    // (every token is 1..maxTokenBytes bytes and tokens partition the
    // non-whitespace bytes exactly) — and be 0 iff no non-ws bytes.
    // Violations counted in-gate from the expression's own output; the
    // oracle is the closed-form anchor (count + zero violations), the
    // langid/emb_sq_sound pattern.
    "doc_tokens_bpe_sound" -> ((s, d) => {
      val nonws = octet_length(
        regexp_replace(col("text"), "[ \\t\\n\\f\\r]", ""))
      val lmax = lit(graft.pipeline.Bpe.maxTokenBytes.toLong)
      Tables.documents(s, d).filter(col("text").isNotNull)
        .withColumn("__n", bpe_token_count(col("text")))
        .withColumn("__b", nonws.cast("long"))
        .withColumn("__viol",
          when(col("__n") > col("__b") ||
            col("__n") < ceil(col("__b").cast("double") / lmax) ||
            (col("__n") === 0L) =!= (col("__b") === 0L), 1L)
            .otherwise(0L))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("__viol")), lit(0L)).cast("long")
            .as("n_violations"))
    }),

    // Greedy packing under the BPE budget: the doc_pack_tokens shape
    // with tokenizer-exact counts — the composition a training pipeline
    // runs (counts verified by doc_tokens_bpe_sound + bpe_oracle.py;
    // the greedy walk itself is oracle-proven on doc_pack_tokens).
    "doc_pack_bpe" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("doc_id"))
        .select(col("doc_id"), col("source"),
          bpe_token_count(col("text")).as("n_tokens"))
      val packed = graft.pipeline.Pack.packGreedy(
        base, "doc_id", "n_tokens", "source", budget = 2048L)
      graft.pipeline.Pack.binStats(packed, "doc_id", "n_tokens", "source")
        .orderBy(col("source"), col("bin"))
    }),

    // Greedy packing under the MODEL-token budget (token_count instead
    // of whitespace words) — what a context-window budget actually
    // means in a training pipeline; same recurrence, same oracle shape
    // (the recursive CTE recomputes the token scheme in SQL).
    "doc_pack_tokens" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("doc_id"))
        .select(col("doc_id"), col("source"),
          token_count(col("text")).as("n_tokens"))
      val packed = graft.pipeline.Pack.packGreedy(
        base, "doc_id", "n_tokens", "source", budget = 512L)
      graft.pipeline.Pack.binStats(packed, "doc_id", "n_tokens", "source")
        .orderBy(col("source"), col("bin"))
    }),

    // Okapi BM25 query scoring (Bm25.topK): per-term tf as doc-local
    // HOFs (no explode, no per-term shuffle); N/Σdl/df ride ONE
    // broadcast scalar row; top-k is a TakeOrdered. Exchanges: the
    // scalar aggregate only — the scan-bound retrieval plan for a
    // fixed small query at any corpus size.
    "doc_bm25" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d), col("doc_id"))
      graft.pipeline.Bm25.topK(base, "doc_id", "text",
        query = Seq("spark", "merge", "window"), k = 50)
    }),

    // Arbitrary-vocabulary batch BM25 (Bm25.topKMany): a query TABLE
    // against the corpus in ONE term explode, non-query terms dropped
    // map-side by the broadcast semi-join, per-term contributions
    // rounded to integer micros so the cross-term group sum is exact
    // and order-free (the fixed-query doc_bm25 sums left-associatively
    // instead — that trick does not survive a groupBy).
    "doc_bm25_batch" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((1L, "spark"), (1L, "join"), (2L, "merge"),
        (2L, "window"), (2L, "sort"), (3L, "scan"), (3L, "filter"),
        (3L, "batch"), (3L, "row")).toDF("query_id", "term")
      graft.pipeline.Bm25.topKMany(
          Decontaminate.spreadSmall(Tables.documents(s, d), col("doc_id")),
          "doc_id", "text", qs, topK = 20)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hybrid lexical+vector retrieval via reciprocal-rank fusion
    // (Search.rrfFuse, k0=60): the doc_bm25 top-50 leg and a
    // brute-cosine top-50 leg (query = vector 0; vec_id ≡ doc_id by
    // fixture construction) fused score-free. Leg ranks are positions
    // in each leg's OWN top-50 — the query exemplar (doc 0) is dropped
    // from the lexical leg AFTER ranking (the cosine leg self-excludes),
    // so every contribution equals its already-proven gate's ordering.
    // Both legs are bounded top-n lists: the fusion never re-touches
    // the corpus at any scale.
    "doc_hybrid_search" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d), col("doc_id"))
      val lex = graft.pipeline.Search.asLeg(
        graft.pipeline.Bm25.topK(base, "doc_id", "text",
          query = Seq("spark", "merge", "window"), k = 50),
        "doc_id", "score").filter(col("doc_id") =!= 0L)
      val vec = graft.pipeline.Search.asLeg(
        Similarity.bruteTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", queryId = 0L, k = 50)
          .withColumnRenamed("vec_id", "doc_id"),
        "doc_id", "sim")
      graft.pipeline.Search.rrfFuse(Seq(lex, vec), "doc_id",
          k0 = 60, k = 10)
        .orderBy(col("rank"))
    }),

    // MMR diversification (Rerank.mmr, λ=0.7) of the hybrid fusion's
    // top-30 pool down to 10: retrieval → fusion → diversify, the full
    // serving stack. The pool and its |30|² sim matrix are bounded at
    // any corpus scale; sims are the micros-cosine (exact integer
    // dot/norm micros, then one IEEE division) so the oracle replays
    // them bit-exactly at every scale.
    "doc_mmr_diversify" -> ((s, d) => {
      val base = Decontaminate.spreadSmall(
        Tables.documents(s, d), col("doc_id"))
      val lex = graft.pipeline.Search.asLeg(
        graft.pipeline.Bm25.topK(base, "doc_id", "text",
          query = Seq("spark", "merge", "window"), k = 50),
        "doc_id", "score").filter(col("doc_id") =!= 0L)
      val vec = graft.pipeline.Search.asLeg(
        Similarity.bruteTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", queryId = 0L, k = 50)
          .withColumnRenamed("vec_id", "doc_id"),
        "doc_id", "sim")
      // pool = fused top-30 among candidates that HAVE an embedding
      // (at sf0.1+ the corpus embeds only a prefix of the documents —
      // the realistic partial-coverage case); k=100 ≥ the ≤99 distinct
      // ids two 50-deep legs can produce, so fusion itself never cuts.
      val emb = Tables.embeddings(s, d)
        .withColumnRenamed("vec_id", "doc_id")
      val pool = graft.pipeline.Search.rrfFuse(Seq(lex, vec), "doc_id",
          k0 = 60, k = 100)
        .join(emb.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .orderBy(col("rrf").desc, col("doc_id").asc).limit(30)
        .select(col("doc_id"), col("rrf"))
      graft.pipeline.Rerank.mmr(pool, emb,
        "doc_id", "rrf", "embedding", lam = 0.7, k = 10)
        .orderBy(col("rank"))
    }),

    // Approximate-nearest-neighbor join (rows-only gate): seeded
    // hyperplane-LSH buckets -> candidate equi-join -> exact refine.
    "emb_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64, k = 5, bits = 10, tables = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-flat ANN (rows-only gate; recall is asserted in PipelineSpec):
    // coarse k-means cells as the inverted file, nprobe-cell probing.
    "emb_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Filtered vector search, exact pre-filter path: metadata predicate
    // (label = 3, ~10% selectivity) pushed into the corpus scan, brute
    // top-k over the survivors — full hash oracle (plain SQL WHERE).
    "emb_filtered_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.filteredKnnJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", col("label") === 3, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Filtered vector search, IVF post-filter path: the full-corpus
    // coarse quantizer (shared memo key with emb_ivf — ONE training
    // pass for the whole emb_ivf* family) routes probes; only
    // predicate survivors inside probed cells are refined. The whole
    // chain is the emb_ivf closed-form replay + one label equi-filter,
    // so this carries a FULL hash oracle.
    "emb_ivf_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.filteredIvfJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", col("label") === 3, k = 5,
        nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Filtered-ANN recall vs the exact filtered top-k, per query — the
    // measurement that makes the post-filter recall cliff visible (and
    // the emb_sq_rerank_recall discipline: both legs closed-form, so
    // the recall numbers themselves carry a full hash oracle).
    "emb_filtered_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = Caches.persistTracked(emb.filter(col("vec_id") < 10))
      val pred = col("label") === 3
      val ivf = Similarity.filteredIvfJoin(qs, emb, "vec_id", "embedding",
        pred, k = 5, nlist = 16, nprobe = 4)
      val exact = Caches.persistTracked(Similarity.filteredKnnJoin(
        qs, emb, "vec_id", "embedding", pred, k = 5))
      val hits = ivf.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits_ivf"))
      val nExact = exact.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"))
      qs.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .join(nExact, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits_ivf"), lit(0L)).as("n_hits_ivf"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy(col("query_id"))
    }),

    // Brute-force cosine top-10 for one query vector (exact ANN baseline).
    "emb_cosine_topk" -> ((s, d) => {
      Similarity.bruteTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // k-NN join: top-3 neighbours for the first 20 vectors.
    "emb_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnJoin(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Per-label centroid norms (distributed vector aggregation shape).
    "emb_centroids" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("label"))
        .agg(Det.r(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"),
          count(lit(1)).as("dim"))
        .orderBy(col("label"))
    }),

    // Stopword-ratio quality signal (the third leg of length/punct/
    // stopword scoring): exact integer counts on both sides — stopword
    // tokens and total tokens per source.
    "doc_stopwords" -> ((s, d) => {
      val stop = Seq("the", "a", "an", "of", "and", "to", "in", "is",
        "that", "it", "for", "on", "with", "as")
      Tables.documents(s, d)
        .withColumn("toks",
          filter(split(lower(col("text")), "[^a-z]+"), t => length(t) >= 1))
        .groupBy(col("source"))
        .agg(sum(size(col("toks"))).as("n_tokens"),
          sum(size(filter(col("toks"),
            t => t.isin(stop.map(lit): _*)))).as("n_stopwords"))
        .orderBy(col("source"))
    }),

    // Exact length quantiles per language (type-7 linear interpolation on
    // both engines; floor-rounded for cross-engine hash stability).
    "doc_quantiles" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          Det.r(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
          Det.r(expr("percentile(n_chars, 0.9)"), 4).as("p90"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))
    }),

    // TF-IDF top terms: tokenize -> per-doc term counts (map-side partial
    // agg) -> document frequency -> idf-weighted ranking. The corpus-size
    // scalar rides a broadcast, so the only shuffles are the two term
    // aggregations — the canonical inverted-index build shape at 100 TB.
    "doc_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val terms = docs.select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) >= 3)).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      stats.crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
        .withColumn("tfidf", Det.r(
          col("total_tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .select(col("term"), col("df"), col("total_tf"), col("tfidf"))
        .orderBy(col("tfidf").desc, col("term"))
        .limit(50)
    }),

    // Multimodal stub-decode plumbing: binary payloads -> typed metadata,
    // aggregated per source (deterministic stub => SQL-oracle-checkable).
    "mm_decode" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      Multimodal.decode(media)
        .withColumn("src_bucket", (col("media_id") % 10).cast("int"))
        .groupBy(col("src_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("width")).as("total_width"),
          max(col("n_frames")).as("max_frames"))
        .orderBy(col("src_bucket"))
    }),

    // Embedding-cosine near-duplicate pairs — exact baseline (the fifth
    // dedup family next to exact/fingerprint/minhash/simhash). Threshold
    // sits below the synthetic corpus' max pairwise cosine so the gate is
    // non-empty at every SF; membership compares the Det-rounded sim.
    // Declared O(n²): above ~1000 corpus rows the gate runs on a
    // deterministic id-slice mirrored exactly by the SQL oracle — the
    // oracle's cost is then CONSTANT in corpus size (~0.5M pairs) at
    // every SF instead of half the soak wall (round-7 verdict #2);
    // sf0.01, the driver's correctness gate, still verifies the whole
    // corpus, and emb_neardup_lsh stays the full-corpus scale path.
    // Distributed PCA (Pca.fit): one-pass (n, Σx, Σxxᵀ) custom
    // TypedImperativeAggregate (33 KB partials per task), driver Jacobi
    // eigensolve. Rows-only gate (the eigensolver is iterative — not
    // SQL-replayable); the _sound certificate below re-verifies the
    // model against the corpus in-engine, and PipelineSpec recovers a
    // planted dominant direction.
    // PCA projection replay against the COMMITTED rotation (round-16
    // verdict #6 — the oracle flip): Qᵀ(x−μ) in exact integer micros
    // over a bounded slice. mu/q are the committed micros artifact
    // (resources/graft/pca_rotation.txt, trained by tools/train_pca.py —
    // the bpe_merges model-as-data provenance pattern); x quantizes
    // scan-side with the same floor(x·1e6+0.5) the IVF/SQ family pins,
    // so proj_u2 = Σ (x_u − mu_u)·q_u is order-free BIGINT arithmetic
    // replayed verbatim by the DuckDB oracle. The LIVE fit (driver
    // Jacobi) keeps its certificate in emb_pca_sound: orthonormality,
    // Bessel, and the spectrum re-measured against the corpus at every
    // SF.
    "emb_pca" -> ((s, d) => {
      val (muU, qU) = graft.pipeline.Pca.committedRotationMicros
      val muLit = array(muU.map(lit(_)): _*)
      val xu = transform(col("embedding"),
        e => floor(e.cast("double") * 1000000.0 + 0.5).cast("long"))
      val centered = zip_with(xu, muLit, (a, b) => a - b)
      val projs = array(qU.map { qr =>
        aggregate(zip_with(centered, array(qr.map(lit(_)): _*),
          (c, w) => c * w), lit(0L), (acc, t) => acc + t)
      }.toSeq: _*)
      Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(col("vec_id"), posexplode(projs).as(Seq("axis", "proj_u2")))
        .orderBy(col("vec_id"), col("axis"))
    }),

    // PCA soundness — three independent checks of the fitted model
    // against the corpus it claims to describe: (1) orthonormality of
    // the component matrix (driver-side, max |QQᵀ−I| < 1e-6); (2)
    // Bessel's inequality per row (Σ proj² <= |x−μ|² + 1e-6 — catches a
    // non-orthonormal basis or a mismatched mean on EVERY vector); (3)
    // the eigensolver's variance claim re-MEASURED in-engine:
    // Σ_j E[proj_j²] must equal Σ_j λ_j within 1e-3 of total variance
    // (a transposed component matrix, wrong mean, or broken aggregate
    // all shift the measured spectrum instantly).
    "emb_pca_sound" -> ((s, d) => {
      import graft.pipeline.Pca
      val emb = Tables.embeddings(s, d)
      val m = Pca.fit(emb, "embedding", dim = 64, k = 8)
      val orthoViol = (0 until m.k).flatMap(i => (0 until m.k).map { j =>
        val dot = (0 until m.dim)
          .map(r => m.components(i)(r) * m.components(j)(r)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).count(_ > 1e-6).toLong
      val proj = Pca.project(col("embedding"), m)
      val centered = zip_with(col("embedding"),
        array(m.mean.map(lit(_)): _*), (x, mu) => x.cast("double") - mu)
      val normSq = aggregate(centered, lit(0.0), (a, x) => a + x * x)
      val projSq = aggregate(proj, lit(0.0), (a, x) => a + x * x)
      val claimed = m.eigenvalues.sum
      emb.agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum(when(projSq > normSq + 1e-6, 1L).otherwise(0L)),
            lit(0L)).as("__bessel"),
          avg(projSq).as("__measured"))
        .select(col("n_rows"),
          (col("__bessel") + lit(orthoViol) +
            when(abs(col("__measured") - lit(claimed)) >
              lit(1e-3) * lit(m.totalVariance), 1L).otherwise(0L))
            .cast("long").as("n_violations"))
    }),

    // SemDeDup (Similarity.semDedup): k-means-clustered semantic dedup,
    // paper keep-rule (lowest centroid-sim survives). Sliced gate
    // (vec_id < 200 — constant across SFs, like the ANN query slices);
    // at corpus scale nlist grows with n to bound the per-cluster
    // quadratic. Rows-only gate; decisions re-verified by the _sound
    // certificate below and the clone fixture in PipelineSpec.
    "emb_semdedup" -> ((s, d) => {
      Similarity.semDedup(
        Tables.embeddings(s, d).filter(col("vec_id") < 200),
        "vec_id", "embedding", threshold = 0.42, nlist = 8)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup soundness: BOTH decision directions re-verified with an
    // independent cosine path (the HOF kernel, vs the operator's codegen
    // DotProduct): every dropped row must have a possibly-dominating
    // near-dup (sim >= t - 1e-5 with a lower (centroid_sim, id) key),
    // every kept row must have NO definitely-dominating one
    // (sim >= t + 1e-5) — the tolerance band keeps a 1-ulp divergence
    // between the two cosine kernels from reading as a violation while
    // a wrong keep-rule, broken clustering join, or inverted flag still
    // trips it. Structural partition check rides along.
    "emb_semdedup_sound" -> ((s, d) => {
      val t = 0.42
      val slice = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val sd = Caches.persistTracked(Similarity.semDedup(
        slice, "vec_id", "embedding", threshold = t, nlist = 8))
      val vecs = slice.select(col("vec_id"), col("embedding"))
      val withVec = sd.join(vecs, Seq("vec_id"))
      val b = withVec.select(col("vec_id").as("__idb"),
        col("cluster"), col("centroid_sim").as("__cb"),
        col("embedding").as("__vb"))
      val doms = withVec.join(b, Seq("cluster"))
        .filter(col("__idb") =!= col("vec_id"))
        .filter(col("__cb") < col("centroid_sim") ||
          (col("__cb") === col("centroid_sim") &&
            col("__idb") < col("vec_id")))
        .withColumn("__sim",
          Det.r(hofCosine(col("embedding"), col("__vb")), 6))
        .groupBy(col("vec_id"))
        .agg(sum(when(col("__sim") >= t + 1e-5, 1L).otherwise(0L))
            .as("__strict"),
          sum(when(col("__sim") >= t - 1e-5, 1L).otherwise(0L))
            .as("__loose"))
      val checked = sd.join(doms, Seq("vec_id"), "left")
        .withColumn("__viol", when(
          (col("kept") && coalesce(col("__strict"), lit(0L)) > 0L) ||
            (!col("kept") && coalesce(col("__loose"), lit(0L)) === 0L),
          1L).otherwise(0L))
      slice.agg(count(lit(1)).as("__n")).crossJoin(
        checked.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("__viol")), lit(0L)).cast("long")
            .as("__v1")))
        .select(col("n_rows"),
          (col("__v1") + when(col("__n") =!= col("n_rows"), 1L)
            .otherwise(0L)).cast("long").as("n_violations"))
    }),

    "emb_neardup" -> ((s, d) => {
      Similarity.bruteNearDupPairsSliced(Tables.embeddings(s, d),
        "vec_id", "embedding", threshold = 0.42, maxRows = 1000L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed near-dup variant (rows-only gate; pair-subset and
    // recall vs brute are asserted in PipelineSpec). At this low
    // threshold recall is partial by design — the scale path trades
    // recall for candidate-bounded cost; at real near-dup thresholds
    // (>=0.9) the same knobs give >99%.
    "emb_neardup_lsh" -> ((s, d) => {
      pairGate(Similarity.cosineNearDupPairs(Tables.embeddings(s, d),
        "vec_id", "embedding", dim = 64, threshold = 0.42,
        bits = 4, tables = 8), "sim")
    }),

    // Multimodal resize plumbing: decode -> aspect-preserving fit into
    // 256x256 (real AWT redraw for decodable images, closed-form metadata
    // transform for stub payloads => SQL-oracle-checkable).
    "mm_resize" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      Multimodal.resize(Multimodal.decode(media), 256, 256)
        .withColumn("src_bucket", (col("media_id") % 10).cast("int"))
        .groupBy(col("src_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("out_width")).as("total_out_w"),
          sum(col("out_height")).as("total_out_h"))
        .orderBy(col("src_bucket"))
    }),

    // Multimodal frame sampling: decode -> every-7th-frame sample, frame
    // payload = equal byte slice (generator-shaped flatMap; frame count
    // and slice sizes are closed-form => SQL-oracle-checkable).
    "mm_frames" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      Multimodal.sampleFrames(Multimodal.decode(media), stride = 7)
        .withColumn("src_bucket", (col("media_id") % 10).cast("int"))
        .groupBy(col("src_bucket"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_payload")).cast("long"))
            .as("total_frame_bytes"))
        .orderBy(col("src_bucket"))
    }),

    // ---- soundness certificates (round-3 verdict item #4) --------------
    //
    // The LSH/heuristic families can't hash-match a SQL oracle (seeded
    // hashes, partial recall), but their SOUNDNESS can: each certificate
    // recomputes the emitted pairs' similarity through an INDEPENDENT
    // implementation path (Spark built-in set ops / higher-order
    // functions instead of the custom codegen'd expressions) and emits
    // (closed-form anchor, n_violations) — DuckDB computes the anchor
    // from the base table and asserts violations = 0, certifying zero
    // false positives at every SF. Recall stays ScalaTest-gated.

    // MinHash-LSH soundness: every emitted pair's Jaccard, recomputed
    // from raw text via built-in substring/array_intersect/array_union
    // (no TextHash, no custom expression), must clear the threshold and
    // agree with the emitted value. Margin 0.01 absorbs fnv-collision
    // noise between hashed-shingle and string-shingle set sizes.
    "doc_minhash_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 8, shingle = 5, threshold = 0.7)
      // Bounded certificate: the exact-Jaccard recompute costs O(|text|)
      // per pair and the pair count grows with clone mass (227k pairs on
      // the 10x-cloned sf1 soak corpus vs 25 at sf0.1 — the cert alone
      // was 181 s of the sf1 bench). Verify a deterministic rank-free
      // ~5k-pair sample instead (~1 ms/pair of shingle-set recompute):
      // corpus-stable (not partition-dependent) and includes EVERY pair
      // at driver gate scales — see samplePairs. The (n_docs,
      // n_violations) contract vs the closed-form oracle is unchanged.
      val sampled = samplePairs(pairs, 5000)
      val texts = docs.select(col("doc_id"), col("text"))
      val joined = sampled
        .join(texts.select(col("doc_id").as("id_a"), col("text").as("__ta")),
          Seq("id_a"))
        .join(texts.select(col("doc_id").as("id_b"), col("text").as("__tb")),
          Seq("id_b"))
      val checked = appendShingleSet(
        appendShingleSet(joined, "__ta", "__sa", 5), "__tb", "__sb", 5)
        .withColumn("__jb", jaccardFromSets(col("__sa"), col("__sb")))
        .withColumn("__viol",
          when(col("__jb") < 0.7 - 0.01 ||
            abs(col("__jb") - col("jaccard")) > 0.01, 1L).otherwise(0L))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(
        checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }),

    // SimHash soundness: the hamming distance attached through the
    // banding join must equal bit_count(xor) of freshly recomputed
    // signatures (catches signature misattachment) and respect the cap.
    // The recomputed (id, sig) projection is PERSISTED (tracked, evicted
    // by the runner's Caches.release()): both certificate join legs read
    // it, and unpersisted each leg would recompute simhash64 — a full
    // tokenize+hash pass over the corpus — once more (round-6 verdict
    // #5's re-evaluation hazard, the simhash analogue of the minhash
    // cert's appendShingleSet binding fix).
    "doc_simhash_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      val sims = graft.pipeline.Caches.persistTracked(
        docs.select(col("doc_id"), simhash64(col("text")).as("__s")))
      val checked = pairs
        .join(sims.select(col("doc_id").as("id_a"), col("__s").as("__sa")),
          Seq("id_a"))
        .join(sims.select(col("doc_id").as("id_b"), col("__s").as("__sb")),
          Seq("id_b"))
        .withColumn("__viol",
          when(col("hamming") > 6 ||
            col("hamming") =!= bit_count(col("__sa").bitwiseXOR(col("__sb"))),
            1L).otherwise(0L))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(
        checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }),

    // Winnowing soundness: a pair sharing >= 10 winnow fingerprints must
    // share actual 12-char substrings — verified against GROUND TRUTH
    // built-in 12-gram sets of the normalized texts (a fingerprint is the
    // min shingle-hash of a window, so shared fingerprints are shared
    // shingles up to hash collisions; requiring >= 5 true shared grams
    // leaves margin for collisions while catching any real unsoundness).
    "doc_winnow_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // certify the REAL operator's output (including the contraction
      // path on duplicate-heavy corpora), on the same deterministic
      // rank-free bounded sample as the minhash certificate. The pair
      // list is the SAME memoized pass doc_winnow_pairs consumes
      // (round-16 verdict #1); this certificate's ground-truth shingle
      // check is independent strictly above it.
      val pairs = samplePairs(Dedup.winnowPairsShared(docs, "doc_id",
        "text", shingle = 12, window = 16, maxDf = 20, minShared = 10), 5000)
      val texts = docs.select(col("doc_id"), col("text"))
      val joined = pairs
        .join(texts.select(col("doc_id").as("id_a"), col("text").as("__ta")),
          Seq("id_a"))
        .join(texts.select(col("doc_id").as("id_b"), col("text").as("__tb")),
          Seq("id_b"))
      val checked = appendShingleSet(
        appendShingleSet(joined, "__ta", "__sa", 12), "__tb", "__sb", 12)
        .withColumn("__shared",
          size(array_intersect(col("__sa"), col("__sb"))))
        .withColumn("__viol", when(col("__shared") < 5, 1L).otherwise(0L))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(
        checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }),

    // Language-ID RECALL certificate (round-6 verdict #6):
    // doc_langid_sound bounds false positives only; this plants one
    // known-language sentence per corpus row (cycling 8 languages across
    // both the script-detection and stopword-voting paths — the same
    // sentences PipelineSpec's accuracy test asserts on) and counts
    // misclassifications. Closed form for the oracle: n_planted = the
    // slice row count, n_missed = 0.
    "doc_langid_recall" -> ((s, d) => {
      val planted = Seq(
        "en" -> "The quick brown fox jumps over the lazy dog and it is not tired.",
        "de" -> "Der schnelle braune Fuchs springt über den faulen Hund und ist nicht müde.",
        "fr" -> "Le renard brun rapide saute sur le chien paresseux et il n'est pas fatigué dans la forêt.",
        "es" -> "El zorro marrón salta sobre el perro perezoso y no está cansado en el bosque.",
        "pt" -> "A raposa marrom salta sobre o cão preguiçoso e não está cansada para a floresta.",
        "zh" -> "敏捷的棕色狐狸跳过了懒惰的狗，它一点也不累。",
        "ja" -> "素早い茶色のキツネはのろまな犬を飛び越えます、つかれていません。",
        "ru" -> "Быстрая коричневая лиса перепрыгивает через ленивую собаку и не устала.")
      val langs = array(planted.map(p => lit(p._1)): _*)
      val texts = array(planted.map(p => lit(p._2)): _*)
      val slot = (col("doc_id") % planted.size).cast("int") + 1
      Tables.documents(s, d).filter(col("doc_id") < 400)
        .withColumn("__expected", element_at(langs, slot))
        .withColumn("__pred", langid(element_at(texts, slot)))
        .agg(count(lit(1)).as("n_planted"),
          coalesce(sum(when(col("__pred") =!= col("__expected"), 1L)
            .otherwise(0L)), lit(0L)).cast("long").as("n_missed"))
    }),

    // Language-ID soundness: every document classifies (non-null) into
    // the documented label set — total docs anchors the scan cross-SF.
    "doc_langid_sound" -> ((s, d) => {
      val labels = Seq("en", "de", "fr", "es", "it", "pt",
        "ja", "ko", "zh", "ru", "und")
      Tables.documents(s, d)
        .withColumn("__pred", langid(col("text")))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("__pred").isNull ||
            !col("__pred").isin(labels.map(lit): _*), 1L).otherwise(0L)),
            lit(0L)).cast("long").as("n_violations"))
    }),

    // Embedding near-dup LSH soundness: emitted pairs re-scored with the
    // HOF zip_with/aggregate cosine (independent of the codegen'd
    // CosineSim) must clear the threshold and agree to 1e-6.
    "emb_neardup_lsh_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity.cosineNearDupPairs(emb,
        "vec_id", "embedding", dim = 64, threshold = 0.42,
        bits = 4, tables = 8)
      val vecs = emb.select(col("vec_id"), col("embedding"))
      val checked = pairs
        .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("__va")),
          Seq("id_a"))
        .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("__vb")),
          Seq("id_b"))
        .withColumn("__hof", hofCosine(col("__va"), col("__vb")))
        .withColumn("__viol",
          when(col("__hof") < 0.42 - 1e-5 ||
            abs(Det.r(col("__hof"), 6) - col("sim")) > 1e-6, 1L).otherwise(0L))
      emb.agg(count(lit(1)).as("n_vecs")).crossJoin(
        checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }),

    // Product-quantization ADC top-k (Pq.adcTopK): codebooks trained on
    // the corpus, candidates scored by m table lookups. Rows-only gate
    // (trained model -> no SQL twin); recall is certified by
    // emb_pq_sound below and reconstruction by PipelineSpec.
    "emb_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Pq.adcTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64, m = 8, k = 16, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ composition (Pq.ivfPqTopK): inverted-file probing over PQ
    // codes — the production billion-vector layout; same certificate
    // family as emb_pq_sound below.
    "emb_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Pq.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ soundness: the emb_pq_sound rank-percentile bound over the
    // cell-probed path. Deliberately NOT claimed to catch cell
    // MISROUTING: the best-of-a-random-quarter still ranks top ~5%
    // (review finding), so no rank statistic separates it here —
    // routing correctness is pinned directly in PipelineSpec (probed
    // cells == top-nprobe by centroid dot, plus nprobe = nlist ≡ flat).
    "emb_ivfpq_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      pqRankCertificate(emb,
        Pq.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", dim = 64))
    }),

    // SQ8 scalar quantization (Sq.sqTopK): per-dim min/max affine codes,
    // compressed-domain MIPS — the ONE ANN gate with a FULL hash oracle
    // (closed-form model, so DuckDB replays train+encode+score exactly).
    "emb_sq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.pipeline.Sq.sqTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64, topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SQ8 soundness: the emb_pq_sound rank-percentile bound over the
    // scalar-quantized path — a broken affine fold (transposed dims,
    // step/min swap) scores like chance and trips it instantly.
    "emb_sq_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      pqRankCertificate(emb,
        graft.pipeline.Sq.sqTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", dim = 64, topK = 10))
    }),

    // IVF-SQ composition (Sq.ivfSqTopK): the inverted-file front end
    // over SQ8 codes — same certificate family as emb_ivfpq (trained
    // coarse quantizer -> no SQL twin; recall certified below).
    "emb_ivfsq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.pipeline.Sq.ivfSqTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-SQ soundness: the emb_pq_sound rank-percentile bound over the
    // cell-probed SQ8 path (routing correctness itself is pinned in
    // PipelineSpec, the emb_ivfpq_sound discipline).
    "emb_ivfsq_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      pqRankCertificate(emb,
        graft.pipeline.Sq.ivfSqTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", dim = 64))
    }),

    // SQ8 + exact re-rank (Rerank.rerank over Sq candidates): the
    // two-stage retrieval layout — compressed-domain scan nominates 30
    // candidates/query, ONLY those re-score against full vectors. The
    // whole chain is closed-form, so this gate carries a FULL hash
    // oracle end to end (candidates replayed by the emb_sq SQL,
    // re-scoring by the same per-dim-micros tree).
    "emb_sq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val model = graft.pipeline.Sq.train(emb, "embedding", 64)
      val cand = graft.pipeline.Sq.sqTopKWith(model, qs, emb,
        "vec_id", "embedding", topK = 30)
      graft.pipeline.Rerank.rerank(cand, qs, emb, "vec_id", "embedding",
        topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Re-rank recall vs the EXACT top-10 under the same integer MIPS
    // metric, per query, next to the un-reranked SQ overlap — the gate
    // that shows what the second pass buys (n_hits_rerank >=
    // n_hits_sq); fully SQL-expressible, full hash oracle.
    "emb_sq_rerank_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = Caches.persistTracked(emb.filter(col("vec_id") < 10))
      val model = graft.pipeline.Sq.train(emb, "embedding", 64)
      val sq = Caches.persistTracked(graft.pipeline.Sq.sqTopKWith(
        model, qs, emb, "vec_id", "embedding", topK = 30))
      val rr = graft.pipeline.Rerank.rerank(sq, qs, emb,
        "vec_id", "embedding", topK = 10)
      val exact = Caches.persistTracked(graft.pipeline.Rerank.exactTopK(
        qs, emb, "vec_id", "embedding", topK = 10))
      def hits(sel: DataFrame, as: String): DataFrame =
        sel.select(col("query_id"), col("neighbor_id"))
          .join(exact.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(as))
      qs.select(col("vec_id").as("query_id"))
        .join(hits(rr, "n_hits_rerank"), Seq("query_id"), "left")
        .join(hits(sq.filter(col("rank") <= 10), "n_hits_sq"),
          Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits_rerank"), lit(0L)).as("n_hits_rerank"),
          coalesce(col("n_hits_sq"), lit(0L)).as("n_hits_sq"))
        .orderBy(col("query_id"))
    }),

    // Model persist/load round-trip (Models.save*/load*): the
    // train-once/serve-many contract — every fitted ANN artifact (IVF
    // centroids, PQ codebooks, SQ mins/steps) written as a small
    // parquet table and reloaded must be BIT-FOR-BIT the trained model
    // (raw IEEE bits compared, not ==, so a float->double->float or
    // text round-trip sneaking into the path fails loudly; NaN bit
    // patterns too). Output is a constant table iff the round-trip is
    // exact, so this carries a FULL hash oracle (a VALUES twin): any
    // nonzero mismatch count diverges the hash (round-15 verdict #1).
    "emb_model_reuse" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ivf = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val sq = graft.pipeline.Sq.train(emb, "embedding", 64)
      val pq = Pq.train(emb, "vec_id", "embedding", 64)
      val dir = java.nio.file.Files.createTempDirectory("graft_models")
      try {
        val base = dir.toString
        graft.pipeline.Models.saveIvf(s, s"$base/ivf", ivf)
        graft.pipeline.Models.saveSq(s, s"$base/sq", sq)
        graft.pipeline.Models.savePq(s, s"$base/pq", pq)
        val ivf2 = graft.pipeline.Models.loadIvf(s, s"$base/ivf")
        val sq2 = graft.pipeline.Models.loadSq(s, s"$base/sq")
        val pq2 = graft.pipeline.Models.loadPq(s, s"$base/pq")
        def bitsF(a: Array[Float], b: Array[Float]): Long =
          a.zip(b).count { case (x, y) =>
            java.lang.Float.floatToRawIntBits(x) !=
              java.lang.Float.floatToRawIntBits(y) }.toLong
        def bitsD(a: Array[Double], b: Array[Double]): Long =
          a.zip(b).count { case (x, y) =>
            java.lang.Double.doubleToRawLongBits(x) !=
              java.lang.Double.doubleToRawLongBits(y) }.toLong
        val ivfMm =
          if (ivf2.length != ivf.length) -1L
          else ivf.zip(ivf2).map { case (a, b) => bitsF(a, b) }.sum
        val sqMm =
          if (sq2.dim != sq.dim) -1L
          else bitsD(sq.mins, sq2.mins) + bitsD(sq.steps, sq2.steps)
        val pqMm =
          if (pq2.dim != pq.dim || pq2.m != pq.m || pq2.k != pq.k) -1L
          else (for (i <- 0 until pq.m; j <- 0 until pq.k)
            yield bitsF(pq.books(i)(j), pq2.books(i)(j))).sum
        import s.implicits._
        Seq(("ivf", ivf2.length.toLong, ivfMm),
            ("pq", (pq2.m * pq2.k).toLong, pqMm),
            ("sq", sq2.dim.toLong, sqMm))
          .toDF("model", "n_entries", "n_mismatch")
          .orderBy(col("model"))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir.toFile)
      }
    }),

    // Fitted-model lifecycle ACROSS snapshots (round-16 verdict #5):
    // with the Models artifact store enabled, an APPEND must serve the
    // stored codebook (train-once / assign-many — the production shape;
    // see the staleness contract in Models) rather than retraining.
    // Proven by raw-bit equality of the pre-append and post-append
    // served models, with a retrain CONTROL — a fresh train on the
    // appended corpus after disabling the store — showing the appended
    // off-manifold vector genuinely moves centroids, so the equality
    // cannot be vacuous.
    "emb_model_lifecycle" -> ((s, d) => {
      import s.implicits._
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_model_lc_" + new java.io.File(d).getName)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp) // hermetic: fresh catalog + store every run
      val cat = new graft.sources.ParquetCatalog(s,
        new java.io.File(tmp, "cat").getPath)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 400) // bounded: scale-constant gate cost
      cat.createOrReplace("gate", "emb", emb)
      graft.pipeline.Models.setStore(
        Some(new java.io.File(tmp, "store").getPath))
      try {
        val before = Similarity.ivfCentroids(
          cat.load("gate", "emb"), "vec_id", "embedding", 8)
        // an off-manifold append that WOULD move centroids under retrain
        cat.append("gate", "emb",
          Seq((10000000L, Seq.fill(64)(1000.0f)))
            .toDF("vec_id", "embedding"))
        // new snapshot -> new plan -> the JVM memo misses; the STORE
        // must hit (snapshot-stable key) and serve the fitted model
        val served = Similarity.ivfCentroids(
          cat.load("gate", "emb"), "vec_id", "embedding", 8)
        // control: fresh train on the appended corpus, store disabled
        graft.pipeline.Models.setStore(scala.None)
        graft.pipeline.Models.invalidate()
        val retrained = Similarity.ivfCentroids(
          cat.load("gate", "emb"), "vec_id", "embedding", 8)
        def mism(a: Array[Array[Float]], b: Array[Array[Float]]): Long =
          if (a.length != b.length) -1L
          else a.zip(b).map { case (x, y) =>
            x.zip(y).count { case (p, q) =>
              java.lang.Float.floatToRawIntBits(p) !=
                java.lang.Float.floatToRawIntBits(q) }.toLong }.sum
        Seq((before.length.toLong, mism(before, served),
            if (mism(before, retrained) > 0L) 1L else 0L))
          .toDF("n_centroids", "n_reuse_mismatch", "retrain_differs")
      } finally {
        graft.pipeline.Models.setStore(scala.None)
        cat.dropNamespace("gate")
        rm(tmp)
      }
    }),

    // PQ + exact re-rank: the same second pass over ADC candidates
    // (trained codebooks -> certificate gate, emb_pq_rerank_sound).
    "emb_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val cand = Pq.adcTopK(qs, emb, "vec_id", "embedding",
        dim = 64, m = 8, k = 16, topK = 30)
      graft.pipeline.Rerank.rerank(cand, qs, emb, "vec_id", "embedding",
        topK = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Re-ranked-PQ soundness: the rank-percentile certificate over the
    // two-stage output — re-ranking can only RAISE the bound's margin
    // (exact ordering within candidates), so a regression in either
    // stage trips it.
    "emb_pq_rerank_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      pqRankCertificate(emb,
        graft.pipeline.Rerank.rerank(
          Pq.adcTopK(qs, emb, "vec_id", "embedding",
            dim = 64, m = 8, k = 16, topK = 30),
          qs, emb, "vec_id", "embedding", topK = 10))
    }),

    // PQ soundness — a rank-percentile bound, robust to the corpus's
    // distribution: for every query, the MEAN exact-dot rank (computed
    // in-gate by a brute window over FULL vectors — an independent
    // scoring path) of the 10 ADC-selected neighbours must sit in the
    // top fifth of the corpus (measured here: top 3–13%; chance = 50%).
    // True-NN recall and top-10 set overlap are deliberately NOT the
    // metric: this synthetic corpus is isotropic, the exact top-10's
    // margins are ~1 rank apart, and a correct quantizer legitimately
    // misses them — while a BROKEN one (wrong codebook indexing, table
    // transposed, slice misaligned) scores like chance and trips the
    // bound instantly. Structural checks (rank in [1,10], no
    // self-match) ride along.
    "emb_pq_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      pqRankCertificate(emb,
        Pq.adcTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", dim = 64, m = 8, k = 16, topK = 10))
    }),

    // Hyperplane-LSH ANN soundness: every emitted neighbour's similarity
    // re-verified via the HOF cosine, rank within [1, k], no self-match.
    "emb_ann_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ann = Similarity.annJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64, k = 5, bits = 10, tables = 4)
      val vecs = emb.select(col("vec_id"), col("embedding"))
      val checked = ann
        .join(vecs.select(col("vec_id").as("query_id"),
          col("embedding").as("__vq")), Seq("query_id"))
        .join(vecs.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("__vn")), Seq("neighbor_id"))
        .withColumn("__viol",
          when(abs(Det.r(hofCosine(col("__vq"), col("__vn")), 6)
              - col("sim")) > 1e-6 ||
            col("rank") < 1 || col("rank") > 5 ||
            col("query_id") === col("neighbor_id"), 1L).otherwise(0L))
      emb.filter(col("vec_id") < 10).agg(count(lit(1)).as("n_queries"))
        .crossJoin(checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }),

    // IVF-flat ANN soundness: same certificate over the nprobe-bucketed
    // path (catches centroid-assignment or probe-join misattachment).
    "emb_ivf_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val ivf = Similarity.ivfJoin(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      val vecs = emb.select(col("vec_id"), col("embedding"))
      val checked = ivf
        .join(vecs.select(col("vec_id").as("query_id"),
          col("embedding").as("__vq")), Seq("query_id"))
        .join(vecs.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("__vn")), Seq("neighbor_id"))
        .withColumn("__viol",
          when(abs(Det.r(hofCosine(col("__vq"), col("__vn")), 6)
              - col("sim")) > 1e-6 ||
            col("rank") < 1 || col("rank") > 5 ||
            col("query_id") === col("neighbor_id"), 1L).otherwise(0L))
      emb.filter(col("vec_id") < 10).agg(count(lit(1)).as("n_queries"))
        .crossJoin(checked.agg(coalesce(sum(col("__viol")), lit(0L))
          .cast("long").as("n_violations")))
    }))

  /** Bounded deterministic output for the no-oracle PAIR gates (round-8
    * verdict #3). At driver scales (pair count within `maxRows`) the full
    * pair list is emitted under the historical (id_a, id_b) sort, so
    * sf0.1/sf1 outputs are byte-identical to prior rounds. Past the bound
    * a global sort makes the gate measure its own harness — at sf10
    * doc_minhash_dedup spent 235 s range-sampling + sorting ~25 M
    * expanded pairs against a 32 s bare operator (BENCH_NOTES round 8) —
    * so the gate instead emits ONE order-free row: the pair count plus a
    * commutative xor-of-xxhash64 digest over (id_a, id_b, value). The
    * digest is partitioning-independent (xor is commutative/associative;
    * pairs are distinct by construction so cancellation can't occur) and
    * engine-portable, preserving a deterministic rows>0 gate with no
    * sort, no single-partition collect, and O(1) output at any SF.
    *
    * The pair set is persisted at the gate boundary either way (the
    * count action + the output both read it; tracked in [[Caches]],
    * evicted by the runner's release()). */
  private[graft] def pairGate(pairs: DataFrame, valueCol: String,
      maxRows: Long = 1000000L): DataFrame = {
    val p = graft.pipeline.Caches.persistTracked(pairs)
    if (p.count() <= maxRows) p.orderBy(col("id_a"), col("id_b"))
    else p.agg(count(lit(1)).as("n_pairs"),
      expr(s"bit_xor(xxhash64(id_a, id_b, $valueCol))").as("pair_digest"),
      // id_digest is the ORACLE-REPLAYABLE leg (round-18 verdict #5):
      // xxhash64 has no DuckDB twin, so pair_digest pins values only
      // across same-engine dumps, leaving digest-scale records count-
      // verified. md5 is bit-identical in both engines and the hex
      // prefix parses exactly on both sides (Spark conv(s,16,10),
      // DuckDB ('0x'||s)::BIGINT — 15 hex chars = 60 bits, no sign
      // risk), so a commutative SUM of per-pair 60-bit md5 values is
      // a value hash of the ID PAIR SET the oracle can recompute at
      // any scale, riding the same sharded pass as the count.
      // Distinct-by-construction pairs make collisions the only false-
      // pass mode (~n^2/2^60 birthday bound - negligible at 285M pairs).
      expr("sum(cast(conv(substring(md5(concat(cast(id_a as string), " +
        "':', cast(id_b as string))), 1, 15), 16, 10) " +
        "as decimal(38,0)))").as("id_digest"))
  }

  /** Deterministic bounded pair sample WITHOUT a total ordering (round-7
    * verdict #1: `orderBy(xxhash64).limit(n)` mid-plan is planned as a
    * range-partitioning exchange + global sort + single-partition limit —
    * including range-sampling's extra job — not TakeOrdered, which Spark
    * only substitutes for a terminal collect). The pair set is persisted
    * (it is tiny post-agg; tracked, evicted by the runner's release()),
    * counted once, and either passed through WHOLE (n <= max — every pair
    * verified, the driver-gate regime) or filtered to a rank-free
    * hash-modulus slice of ~max expected pairs. Sample membership never
    * reaches the output — certificates emit only (anchor, n_violations) —
    * so the sampled fraction (~max/n once n > max) affects coverage, not
    * values, and one violation in any sampled pair still fails the gate. */
  private def samplePairs(pairs: DataFrame, max: Int): DataFrame = {
    val p = graft.pipeline.Caches.persistTracked(pairs)
    val n = p.count()
    if (n <= max) p
    else p.filter(pmod(xxhash64(col("id_a"), col("id_b")),
      lit(math.max(1L, n / max))) === 0L)
  }

  /** Shared PQ-family certificate: per query, the MEAN exact-dot rank
    * of the selected neighbours (brute full-vector window — an
    * independent scoring path) must sit in the top fifth of the corpus
    * (chance = 50%), plus structural checks AND a completeness check —
    * the operator must emit EXACTLY topK rows per query (review
    * finding: without it, an operator regression that emits nothing
    * would zero both violation legs and pass the pinned (n, 0) oracle
    * vacuously). The emitted row is (n_queries, n_violations). */
  private def pqRankCertificate(emb: DataFrame, pqRaw: DataFrame,
      topK: Int = 10): DataFrame = {
    val pq = Caches.persistTracked(pqRaw) // three legs read it once
    val qs = emb.filter(col("vec_id") < 10)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id").asc)
    val ranked = qs.select(col("vec_id").as("query_id"),
        col("embedding").as("__vq"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__vn")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__dot", Det.r(Pq.dotCol(col("__vq"), col("__vn")), 6))
      .withColumn("__rk", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("__rk"))
    val structural = pq.agg(coalesce(sum(
      when(col("rank") < 1 || col("rank") > topK ||
        col("query_id") === col("neighbor_id"), 1L).otherwise(0L)),
      lit(0L)).as("__s"))
    val completeness = qs.select(col("vec_id").as("query_id"))
      .join(pq.groupBy(col("query_id")).agg(count(lit(1)).as("__k")),
        Seq("query_id"), "left")
      .agg(coalesce(sum(when(coalesce(col("__k"), lit(0L)) =!= topK, 1L)
        .otherwise(0L)), lit(0L)).as("__c"))
    val rankQuality = pq.join(ranked, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(avg(col("__rk")).as("__meanrk"))
      .crossJoin(emb.agg(count(lit(1)).as("__n")))
      .agg(coalesce(sum(when(col("__meanrk") > col("__n") / 5.0, 1L)
        .otherwise(0L)), lit(0L)).as("__r"))
    qs.agg(count(lit(1)).as("n_queries"))
      .crossJoin(structural).crossJoin(completeness).crossJoin(rankQuality)
      .select(col("n_queries"),
        (col("__s") + col("__c") + col("__r")).cast("long")
          .as("n_violations"))
  }

  /** Normalized text the way TextHash.normalize does it (lowercase,
    * whitespace runs collapsed, trimmed) — built-ins only, for the
    * soundness certificates' independent recompute path. */
  private[graft] def builtinNorm(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Appends `out` = distinct character n-gram set of the normalized text
    * column `src` — the certificate-side mirror of the custom shingle
    * hashing (operates on STRINGS, not hashes, so a hash collision in the
    * operator under test cannot hide here).
    *
    * The normalization and the shingle array are bound as REAL columns,
    * not inlined subtrees: a `transform()` lambda that references the
    * normalization expression re-evaluates the regex for every array
    * element (~n_chars regex passes per row — measured 2.5 ms/row on
    * 300-char docs, 16 ms/row once Jaccard duplicated the set four times).
    * As multi-referenced non-cheap aliases they survive CollapseProject,
    * so each is evaluated once per row. */
  private[graft] def appendShingleSet(df: DataFrame, src: String,
      out: String, n: Int): DataFrame = {
    val nrm = out + "_nrm"
    // char_windows(…, n, 1) IS the shingle stream (one codegen'd offset
    // pass, round 19) — the transform(sequence…substr) HOF it replaces
    // re-ran an interpreted lambda per shingle; values including the
    // < n chars → empty and null → null edges are identical
    df.withColumn(nrm, builtinNorm(col(src)))
      .withColumn(out, array_distinct(char_windows(col(nrm), n, 1)))
      .drop(nrm)
  }

  /** Exact Jaccard from two already-bound shingle-set columns (both-empty
    * => 1.0, matching TextHash.jaccard). Callers must pass ATTRIBUTES
    * produced by [[appendShingleSet]] — passing expression trees here
    * would re-evaluate them per reference. */
  private[graft] def jaccardFromSets(sa: Column, sb: Column): Column =
    when(size(sa) === 0 && size(sb) === 0, lit(1.0))
      .otherwise(size(array_intersect(sa, sb)).cast("double") /
        size(array_union(sa, sb)).cast("double"))

  /** Cosine via built-in higher-order functions (zip_with + aggregate),
    * left-to-right fold like VectorOps.cosine — the independent
    * implementation the embedding certificates compare against. */
  private[graft] def hofCosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y),
      lit(0.0), (s, v) => s + v)
    val na = aggregate(ad, lit(0.0), (s, v) => s + v * v)
    val nb = aggregate(bd, lit(0.0), (s, v) => s + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** The emb_ivf oracle's Lloyd-replay CTE chain (nlist=16, two
    * unrolled iterations, exact integer-micros assignment scores and
    * micros-sum centroid updates) through the final assignment `af`
    * and the nprobe=4 probe table `qp` for the vec_id<10 query slice —
    * shared by the emb_ivf_filtered / emb_filtered_recall oracles so
    * the filtered-search twins cannot drift from the trainer replay.
    * (The emb_ivf / emb_ivfsq / emb_semdedup entries predate this
    * constant and carry the same chain inline; their hashes are
    * validated at three scales, so they stay byte-frozen.) */
  private val IvfLloydCtes16: String =
    """WITH c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                  embedding AS c
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         s1 AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c0 cl),
         a1 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s1) t WHERE rn = 1),
         u1p AS (
           SELECT a1.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a1 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a1.cluster, i.i),
         u1 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u1p GROUP BY cluster),
         c1 AS (
           SELECT c0.cluster, coalesce(u1.c, c0.c) AS c
           FROM c0 LEFT JOIN u1 USING (cluster)),
         s2 AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c1 cl),
         a2 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s2) t WHERE rn = 1),
         u2p AS (
           SELECT a2.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a2 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a2.cluster, i.i),
         u2 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u2p GROUP BY cluster),
         c2 AS (
           SELECT c1.cluster, coalesce(u2.c, c1.c) AS c
           FROM c1 LEFT JOIN u2 USING (cluster)),
         sf AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c2 cl),
         af AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM sf) t WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn
             FROM sf WHERE vec_id < 10) t WHERE rn <= 4)"""

  /** The doc_bm25 oracle's CTE pipeline through the scored table `sc`
    * — shared verbatim by the doc_hybrid_search oracle's lexical leg so
    * the two entries cannot drift apart. */
  private val Bm25ScoredCtes: String =
    """WITH d AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         m AS (
           SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
             CAST(len(list_filter(ws, w -> w = 'spark')) AS BIGINT) AS tf0,
             CAST(len(list_filter(ws, w -> w = 'merge')) AS BIGINT) AS tf1,
             CAST(len(list_filter(ws, w -> w = 'window')) AS BIGINT) AS tf2
           FROM d),
         s AS (
           SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS df2
           FROM m),
         sc AS (
           SELECT doc_id, dl,
             floor(((
               ln(1.0 + (CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                 / (CAST(df0 AS DOUBLE) + 0.5))
                 * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25
                     + (CAST(dl AS DOUBLE) * 0.75)
                       / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))
               + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                 / (CAST(df1 AS DOUBLE) + 0.5))
                 * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25
                     + (CAST(dl AS DOUBLE) * 0.75)
                       / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
               + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                 / (CAST(df2 AS DOUBLE) + 0.5))
                 * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25
                     + (CAST(dl AS DOUBLE) * 0.75)
                       / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
               * 1000000.0 + 0.5) / 1000000.0 AS score
           FROM m, s)"""

  /** The doc_hybrid_search oracle through the fused table `f` —
    * shared by the doc_mmr_diversify oracle, which diversifies the
    * same fusion's top-30 pool. */
  private val HybridFusedCtes: String =
    Bm25ScoredCtes + """,
         bm AS (
           SELECT doc_id, dl, score FROM sc WHERE score > 0.0
           ORDER BY score DESC, doc_id LIMIT 50),
         bmr AS (
           SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
             AS rank_0
           FROM bm),
         lex AS (SELECT doc_id, rank_0 FROM bmr WHERE doc_id <> 0),
         q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
         cos AS (
           SELECT vec_id AS doc_id,
             floor((list_cosine_similarity(embedding::DOUBLE[],
               qvec::DOUBLE[])) * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM embeddings, q WHERE vec_id <> 0
           ORDER BY sim DESC, vec_id LIMIT 50),
         vr AS (
           SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id)
             AS rank_1
           FROM cos),
         f AS (
           SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             floor((coalesce(1.0 / (60.0 + CAST(l.rank_0 AS DOUBLE)), 0.0)
                  + coalesce(1.0 / (60.0 + CAST(v.rank_1 AS DOUBLE)), 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS rrf,
             l.rank_0 AS rank_0, v.rank_1 AS rank_1
           FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id)"""

  /** The committed per-text BPE token counts as a VALUES list (round-17
    * verdict #4 — the emb_pca model-as-data pattern): derived offline by
    * the committed tools/gen_bpe_counts.py from the committed merge
    * table via the twin's independent tokenizer, keyed by a 64-bit
    * md5(text) prefix so the key survives the key-shifted scale corpora
    * (texts are copied verbatim; tools/scale_testdata.py). An unmatched
    * text nulls the joined count and FAILS the gate — coverage gaps
    * cannot silently pass. */
  private lazy val bpeCountsValues: String = {
    val in = getClass.getResourceAsStream("/graft/bpe_counts.tsv")
    require(in != null, "missing committed BPE count table " +
      "(src/main/resources/graft/bpe_counts.tsv; tools/gen_bpe_counts.py)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val t = l.split("\t")
      require(t.length == 2 && t(0).matches("[0-9a-f]{16}"),
        s"malformed bpe_counts line: $l")
      s"('${t(0)}',${t(1).toLong})"
    }.mkString(",")
    finally src.close()
  }

  /** doc_tokens_bpe oracle: per-source aggregates replayed over the
    * committed counts. LEFT JOIN so null texts aggregate exactly as the
    * live expression's null (counted in n_docs, skipped by sum/max). */
  private def docTokensBpeOracleSql: String =
    s"""WITH c(h, n) AS (VALUES $bpeCountsValues)
       SELECT source,
         CAST(sum(c.n) AS BIGINT) AS total_tokens,
         count(*) AS n_docs,
         CAST(max(c.n) AS BIGINT) AS max_tokens
       FROM documents d LEFT JOIN c ON substr(md5(d.text), 1, 16) = c.h
       GROUP BY source ORDER BY source"""

  /** doc_pack_bpe oracle: the doc_pack_tokens greedy-packing recursive
    * CTE, with per-doc counts read from the committed table instead of
    * recomputed (the merge loop is not SQL-expressible), budget 2048. */
  private def docPackBpeOracleSql: String =
    s"""WITH RECURSIVE c(h, n) AS (VALUES $bpeCountsValues),
         d AS (
           SELECT doc_id, source, CAST(c.n AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn
           FROM documents JOIN c ON substr(md5(text), 1, 16) = c.h
           WHERE text IS NOT NULL),
         p AS (
           SELECT source, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens > 2048 THEN p.bin + 1
                  ELSE p.bin END AS bin,
             CASE WHEN p.fill + d.n_tokens > 2048 THEN d.n_tokens
                  ELSE p.fill + d.n_tokens END AS fill
           FROM p JOIN d ON d.source IS NOT DISTINCT FROM p.source
             AND d.rn = p.rn + 1)
         SELECT source, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM p GROUP BY 1, 2 ORDER BY source, bin"""

  /** emb_pca oracle, generated from the SAME committed rotation resource
    * the gate loads (tools/train_pca.py provenance): mu/q inlined as
    * VALUES, the projection replayed in exact bigint micros. */
  private def embPcaOracleSql: String = {
    val (muU, qU) = graft.pipeline.Pca.committedRotationMicros
    val muVals = muU.zipWithIndex
      .map { case (v, i) => s"($i,$v)" }.mkString(",")
    val qVals = (for (j <- qU.indices; i <- qU(j).indices)
      yield s"($j,${i},${qU(j)(i)})").mkString(",")
    s"""WITH mu(pos, mu_u) AS (VALUES $muVals),
         q(axis, pos, q_u) AS (VALUES $qVals),
         x AS (
           SELECT vec_id, i.i AS pos,
             CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0 + 0.5)
               AS BIGINT) AS x_u
           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) i
           WHERE vec_id < 200)
       SELECT x.vec_id, q.axis,
         CAST(sum((x.x_u - mu.mu_u) * q.q_u) AS BIGINT) AS proj_u2
       FROM x JOIN mu USING (pos) JOIN q USING (pos)
       GROUP BY 1, 2 ORDER BY vec_id, axis"""
  }

  def oracleSql: Map[String, String] = Map(
    "doc_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens,
         max(len(string_split_regex(trim(text), '\s+'))) AS max_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "doc_tokens" ->
      """SELECT source,
         CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT)
           AS total_bpe,
         count(*) AS n_docs
         FROM documents GROUP BY source ORDER BY source""",
    "doc_quality" ->
      """WITH q AS (
           SELECT lang, n_chars,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
               / CAST(n_chars AS DOUBLE) AS punct_ratio,
             (length(text) - length(replace(text, ' ', '')))
               / CAST(n_chars AS DOUBLE) AS space_ratio
           FROM documents)
         SELECT lang,
           CASE WHEN n_chars >= 120 AND space_ratio > 0.1
                 AND punct_ratio < 0.1 THEN 'good' ELSE 'poor' END AS quality,
           count(*) AS n,
           floor((avg(space_ratio)) * 1000000.0 + 0.5) / 1000000.0
             AS avg_space_ratio
         FROM q GROUP BY 1, 2 ORDER BY lang, quality""",
    "doc_exact_dedup" ->
      """SELECT count(*) AS n_docs,
         count(DISTINCT md5(text)) AS n_distinct_hash,
         count(DISTINCT text) AS n_distinct_text
         FROM documents""",
    "doc_fingerprint" ->
      """SELECT count(*) AS n_docs,
         count(DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
           AS n_distinct_fp
         FROM documents""",
    // Representative selection as a rank window (the Spark side is a
    // max_by aggregate — independent algorithms, same answer).
    "doc_dup_canonical" ->
      """SELECT group_key, keep_id, n_members FROM (
           SELECT md5(text) AS group_key, doc_id AS keep_id,
             row_number() OVER (PARTITION BY md5(text)
               ORDER BY n_chars DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY md5(text)) AS n_members
           FROM documents WHERE text IS NOT NULL) t
         WHERE rn = 1 ORDER BY group_key""",
    // Exact Jaccard twin: inverted-index intersection counts over DISTINCT
    // character 5-shingles of the normalized text (same normalization as
    // doc_fingerprint), jaccard = |I| / (|A| + |B| - |I|); documents whose
    // normalized text is shorter than one shingle pair at 1.0 with each
    // other (the empty-set convention). Floor-rounding twin of Det.r.
    "doc_jaccard_pairs" ->
      """WITH docs AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL AND doc_id < 1000
         ),
         sh AS (
           SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS g
           FROM docs, unnest(range(1, greatest(length(norm) - 4, 0) + 1))
             AS t(i)
         ),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
           FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         ),
         scored AS (
           SELECT ia, ib, i * 1.0 / (sa.sz + sb.sz - i) AS jac
           FROM inter
           JOIN sizes sa ON sa.doc_id = ia
           JOIN sizes sb ON sb.doc_id = ib
         ),
         empties AS (
           SELECT a.doc_id AS ia, b.doc_id AS ib, 1.0 AS jac
           FROM docs a JOIN docs b ON a.doc_id < b.doc_id
           WHERE length(a.norm) < 5 AND length(b.norm) < 5
         )
         SELECT ia AS id_a, ib AS id_b,
           floor(jac * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         FROM (SELECT * FROM scored WHERE jac >= 0.7
               UNION ALL SELECT * FROM empties)
         ORDER BY id_a, id_b""",
    // Full-oracle components over the exact-jaccard pair graph: the same
    // pair CTEs as doc_jaccard_pairs, then a recursive transitive closure
    // (reach is bounded by sum of component sizes squared — components on
    // the gate slice are small) labels each node with its min reachable
    // id. n_violations is the Spark-side star-vs-expanded CC equality,
    // asserted zero here as a literal.
    "doc_jaccard_clusters_star" ->
      """WITH RECURSIVE docs AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL AND doc_id < 1000
         ),
         sh AS (
           SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS g
           FROM docs, unnest(range(1, greatest(length(norm) - 4, 0) + 1))
             AS t(i)
         ),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
           FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2
         ),
         scored AS (
           SELECT ia, ib, i * 1.0 / (sa.sz + sb.sz - i) AS jac
           FROM inter
           JOIN sizes sa ON sa.doc_id = ia
           JOIN sizes sb ON sb.doc_id = ib
         ),
         empties AS (
           SELECT a.doc_id AS ia, b.doc_id AS ib, 1.0 AS jac
           FROM docs a JOIN docs b ON a.doc_id < b.doc_id
           WHERE length(a.norm) < 5 AND length(b.norm) < 5
         ),
         pairs AS (
           SELECT ia, ib FROM scored WHERE jac >= 0.7
           UNION ALL SELECT ia, ib FROM empties
         ),
         edges AS (
           SELECT ia AS a, ib AS b FROM pairs
           UNION SELECT ib, ia FROM pairs
         ),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         ),
         labels AS (
           SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a
         )
         SELECT comp, count(*) AS n_members,
           CAST(0 AS BIGINT) AS n_violations
         FROM labels GROUP BY comp ORDER BY comp""",
    // Decontamination: distinct word 5-grams per doc over the normalized
    // text; eval = doc_id % 97 == 0, train = the rest; per-train-doc
    // distinct-gram count + how many collide with the eval gram set.
    "doc_contamination" ->
      """WITH d AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL
         ),
         w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM d),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(ws[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
               AS gram
           FROM w, unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)
         ),
         e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
         tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
         SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
         FROM tr LEFT JOIN e ON tr.gram = e.gram
         GROUP BY tr.doc_id
         HAVING sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
         ORDER BY tr.doc_id""",
    // Hashed probe: same result as the exact form at gate scale (see the
    // Spark twin's comment), so the exact SQL is its oracle verbatim.
    "doc_contamination_hashed" ->
      """WITH d AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL
         ),
         w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM d),
         g AS (
           SELECT DISTINCT doc_id,
             array_to_string(ws[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
               AS gram
           FROM w, unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)
         ),
         e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
         tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
         SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
         FROM tr LEFT JOIN e ON tr.gram = e.gram
         GROUP BY tr.doc_id
         HAVING sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
         ORDER BY tr.doc_id""",
    // PII redaction over the derived PII-bearing text — same patterns
    // verbatim (the engine-identical regex subset), counts on the
    // original, md5 over the redacted bytes, email->ip->ssn->phone
    // application order.
    "doc_pii" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' contact ' || source || '@example.com ip 10.' ||
               CAST(doc_id % 250 AS VARCHAR) || '.0.' ||
               CAST(doc_id % 200 AS VARCHAR) || ' ssn 123-45-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' call 555-867-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               CASE WHEN doc_id % 3 = 0 THEN ' cc bob@test.org'
                    ELSE '' END AS t
           FROM documents WHERE text IS NOT NULL AND doc_id < 10000
         )
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(t,
             '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b'))
             AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t,
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(t,
             '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS BIGINT)
             AS n_phone,
           md5(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                   '\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b',
                   '<IP>', 'g'),
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
               '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'))
             AS redacted_md5
         FROM aug ORDER BY doc_id""",
    // Unicode NFC: identical decomposed sequence built via chr(); both
    // engines implement UAX #15, so lengths and normalized-bytes md5
    // must agree exactly.
    "doc_unicode" ->
      """WITH aug AS (
           SELECT doc_id, text || ' nfc ' || chr(101) || chr(769) || ' ' ||
             chr(65) || chr(768) || chr(233) AS t
           FROM documents WHERE text IS NOT NULL AND doc_id < 10000)
         SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars_raw,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_nfc,
           md5(nfc_normalize(t)) AS nfc_md5
         FROM aug ORDER BY doc_id""",
    // Hash-threshold sample: md5-prefix order below the 10% threshold;
    // the emitted hk column asserts hash parity directly.
    "doc_sample" ->
      """SELECT doc_id, lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk
         FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
         ORDER BY doc_id""",
    // Budget-balanced mixture: per-source char totals -> rate =
    // min(total)/total -> Weyl-hash threshold. Integer hash and IEEE
    // double rate are bit-identical across engines (no regex, no string
    // hash), so the rate column itself is hash-compared.
    "doc_mixture" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 100000000),
         tot AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
                 FROM d GROUP BY source),
         r AS (SELECT source,
                 CAST((SELECT min(w) FROM tot) AS DOUBLE) / w AS rate
               FROM tot)
         SELECT d.doc_id, d.source, r.rate
         FROM d JOIN r USING (source)
         WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296
               < rate * 4294967296.0
         ORDER BY d.doc_id""",
    // Per-source cap: row_number over the Weyl-hash order, keep rank<=5.
    "doc_source_cap" ->
      """SELECT doc_id, source, cap_rk FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296,
                 doc_id)
               AS cap_rk
           FROM documents WHERE doc_id < 100000000) t
         WHERE cap_rk <= 5
         ORDER BY source, cap_rk""",
    // Temperature mixture: per-source rate (w/wmin)^(-0.5), Weyl-hash
    // threshold keep; the rate column rounded identically on both sides.
    "doc_mixture_temp" ->
      s"""WITH d AS (SELECT * FROM documents WHERE doc_id < 100000000),
         tot AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
                 FROM d GROUP BY source),
         r AS (SELECT source,
                 pow(CAST(w AS DOUBLE) /
                     (SELECT CAST(min(w) AS DOUBLE) FROM tot), -0.5) AS rate
               FROM tot)
         SELECT d.doc_id, d.source,
           ${graft.Det.rsql("r.rate", 9)} AS rate
         FROM d JOIN r USING (source)
         WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296
               < r.rate * 4294967296.0
         ORDER BY d.doc_id""",
    // Duplicate-line removal over the same derived multi-line text:
    // lines >= 5 trimmed chars partition by their content ('e:' prefix)
    // and keep only the (doc_id, pos)-first occurrence when duplicated;
    // shorter lines get a per-occurrence unique key ('u:') and always
    // survive. Rebuild via ORDER BY pos string_agg, md5-compared.
    "doc_line_dedup" ->
      """WITH d0 AS (
           SELECT doc_id, concat_ws(chr(10),
             'subscribe to ' || source || ' newsletter',
             text,
             'faq',
             'copyright ' || lang || ' wiki') AS t
           FROM documents),
         l AS (SELECT doc_id,
                 unnest(string_split(t, chr(10))) AS line,
                 generate_subscripts(string_split(t, chr(10)), 1) AS pos
               FROM d0),
         x AS (SELECT doc_id, line, pos,
                 CASE WHEN length(trim(line)) >= 5 THEN 'e:' || line
                      ELSE 'u:' || doc_id || ':' || pos END AS k
               FROM l),
         f AS (SELECT doc_id, line, pos,
                 count(*) OVER (PARTITION BY k) AS c,
                 row_number() OVER (PARTITION BY k
                   ORDER BY doc_id, pos) AS rn
               FROM x),
         kept AS (SELECT doc_id, line, pos FROM f WHERE c = 1 OR rn = 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(line, chr(10) ORDER BY pos)) AS h
         FROM kept WHERE doc_id < 100000000
         GROUP BY doc_id ORDER BY doc_id""",
    // Incremental dedup: the exact anti-join the bloom-pruned plan must
    // reproduce — batch rows whose text is nowhere in the corpus.
    "doc_incremental_dedup" ->
      """WITH inc AS (
           SELECT doc_id, lang,
             CASE WHEN doc_id % 3 = 0 THEN text
                  ELSE text || ' novel' END AS t
           FROM documents WHERE doc_id < 100000000)
         SELECT doc_id, lang FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM documents dd WHERE dd.text = inc.t)
         ORDER BY doc_id""",
    // Corpus top-k word 3-grams with multiplicity; ties broken by gram.
    "doc_top_ngrams" ->
      """WITH d AS (
           SELECT trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL),
         w AS (SELECT string_split(norm, ' ') AS ws FROM d),
         g AS (
           SELECT array_to_string(ws[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
             AS gram
           FROM w, unnest(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i))
         SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g
         GROUP BY gram ORDER BY n DESC, gram LIMIT 50""",
    // Context-window chunking: same window arithmetic — 1 chunk when
    // n <= 32, else ceil((n-32)/24)+1, chunk i = tokens [i*24+1, +32].
    "doc_chunks" ->
      """WITH d AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL AND doc_id < 100000000),
         c AS (SELECT doc_id, ws,
                 CASE WHEN len(ws) <= 32 THEN 1
                      ELSE CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT) + 1
                 END AS k
               FROM d),
         e AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                 ws[CAST(i*24 + 1 AS INT):CAST(i*24 + 32 AS INT)] AS cw
               FROM c, unnest(range(0, k)) AS t(i))
         SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_tokens,
           md5(array_to_string(cw, ' ')) AS h
         FROM e ORDER BY doc_id, chunk_id""",
    // C4/Gopher doc-level rules: same first-fail ladder over the same
    // exact-integer metrics; ratio thresholds divide identical integer
    // operands on both engines, so the comparisons are portable.
    "doc_quality_rules" ->
      """WITH d AS (
           SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         m AS (
           SELECT doc_id, source,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT)
               AS swl,
             CAST(len(list_filter(ws, w -> w IN ('the','a','an','of','and',
               'to','with','that','be','have'))) AS BIGINT) AS nstop,
             CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
               AS BIGINT) AS nalpha,
             CAST(len(list_filter(ws, w -> w LIKE '#%' OR contains(w, '...')
               OR contains(w, '{'))) AS BIGINT) AS nsym
           FROM d),
         c AS (
           SELECT source, doc_id, n_words, nstop,
             CASE
               WHEN n_words < 50 OR n_words > 100000 THEN 'words'
               WHEN swl / CAST(n_words AS DOUBLE) < 3.0
                 OR swl / CAST(n_words AS DOUBLE) > 10.0 THEN 'wordlen'
               WHEN nstop < 2 THEN 'stop'
               WHEN nalpha / CAST(n_words AS DOUBLE) < 0.8 THEN 'alpha'
               WHEN nsym / CAST(n_words AS DOUBLE) > 0.1 THEN 'symbol'
               ELSE 'keep' END AS reason
           FROM m)
         SELECT source, reason, count(*) AS n,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(nstop) AS BIGINT) AS sum_stop_hits,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM c GROUP BY 1, 2 ORDER BY source, reason""",
    // Unigram surprisal: same micro-rounding of per-term logprobs,
    // integer sums per doc.
    "doc_lm_score" ->
      """WITH d AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text),
             '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         t AS (SELECT doc_id, t.term FROM d,
                 LATERAL unnest(ws) AS t(term)),
         f AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f),
         lp AS (
           SELECT term,
             CAST(floor(ln(CAST(freq AS DOUBLE) / CAST(total AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS lpm
           FROM f, tot)
         SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(lp.lpm) AS BIGINT) AS lp_micros
         FROM t JOIN lp USING (term) WHERE t.doc_id < 1000
         GROUP BY 1 ORDER BY doc_id""",
    // Bigram LM: the identical fixed-association double tree as the
    // Scala side — 0.9·(cb/cu) + 0.1·(cw/total), micros-rounded once.
    "doc_lm_bigram" ->
      """WITH d AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text),
             '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         u AS (SELECT t.term AS w, count(*) AS cu FROM d,
                 LATERAL unnest(ws) AS t(term) GROUP BY 1),
         tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total FROM u),
         b AS (
           SELECT doc_id, ws[CAST(i AS INT)] AS w1,
             ws[CAST(i + 1 AS INT)] AS w2
           FROM d, LATERAL unnest(generate_series(1, len(ws) - 1))
             AS g(i)
           WHERE len(ws) >= 2),
         bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
         lp AS (
           SELECT bc.w1, bc.w2,
             CAST(floor(ln(
               0.9 * (CAST(bc.cb AS DOUBLE) / CAST(u1.cu AS DOUBLE)) +
               0.1 * (CAST(u2.cu AS DOUBLE) / CAST(total AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT) AS lpm
           FROM bc JOIN u u1 ON bc.w1 = u1.w
                   JOIN u u2 ON bc.w2 = u2.w, tot)
         SELECT b.doc_id, count(*) AS n_bigrams,
           CAST(sum(lp.lpm) AS BIGINT) AS lp2_micros
         FROM b JOIN lp ON b.w1 = lp.w1 AND b.w2 = lp.w2
         WHERE b.doc_id < 1000
         GROUP BY 1 ORDER BY doc_id""",
    // DSIR: unigram+bigram gram stream, conditional target/raw counts,
    // Laplace-smoothed log-ratio micros — identical double trees to
    // the Scala side (two micros roundings, then integer sums).
    "doc_dsir" ->
      """WITH d AS (
           SELECT doc_id, (source = 'src0') AS tgt,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT doc_id, tgt, t.term AS g FROM d,
             LATERAL unnest(ws) AS t(term)
           UNION ALL
           SELECT doc_id, tgt,
             ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)] AS g
           FROM d, LATERAL unnest(generate_series(1, len(ws) - 1))
             AS s(i)
           WHERE len(ws) >= 2),
         c AS (
           SELECT g, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END)
               AS BIGINT) AS ct,
             CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
           FROM g GROUP BY 1),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t,
           CAST(sum(cr) AS BIGINT) AS r,
           CAST(count(*) AS BIGINT) AS v FROM c),
         lp AS (
           SELECT g,
             CAST(floor(ln(CAST(ct + 1 AS DOUBLE) /
               CAST(t + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
             - CAST(floor(ln(CAST(cr + 1 AS DOUBLE) /
               CAST(r + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
               AS dlt
           FROM c, tot)
         SELECT g.doc_id, count(*) AS n_grams,
           CAST(sum(lp.dlt) AS BIGINT) AS w_micros
         FROM g JOIN lp USING (g) WHERE g.doc_id < 1000
         GROUP BY 1 ORDER BY doc_id""",
    // Hashed-gram probe (hash64): value-identical to the exact form at
    // gate scale (see the Spark twin's comment), so the exact SQL is
    // its oracle verbatim — the doc_contamination_hashed pattern.
    "doc_dsir_hashed" ->
      """WITH d AS (
           SELECT doc_id, (source = 'src0') AS tgt,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT doc_id, tgt, t.term AS g FROM d,
             LATERAL unnest(ws) AS t(term)
           UNION ALL
           SELECT doc_id, tgt,
             ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)] AS g
           FROM d, LATERAL unnest(generate_series(1, len(ws) - 1))
             AS s(i)
           WHERE len(ws) >= 2),
         c AS (
           SELECT g, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END)
               AS BIGINT) AS ct,
             CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
           FROM g GROUP BY 1),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t,
           CAST(sum(cr) AS BIGINT) AS r,
           CAST(count(*) AS BIGINT) AS v FROM c),
         lp AS (
           SELECT g,
             CAST(floor(ln(CAST(ct + 1 AS DOUBLE) /
               CAST(t + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
             - CAST(floor(ln(CAST(cr + 1 AS DOUBLE) /
               CAST(r + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
               AS dlt
           FROM c, tot)
         SELECT g.doc_id, count(*) AS n_grams,
           CAST(sum(lp.dlt) AS BIGINT) AS w_micros
         FROM g JOIN lp USING (g) WHERE g.doc_id < 1000
         GROUP BY 1 ORDER BY doc_id""",
    // DSIR Gumbel-top-k: the weights CTE plus the deterministic
    // weylHash -> inverse-Gumbel noise, top 100 by integer score.
    "doc_dsir_sample" ->
      """WITH d AS (
           SELECT doc_id, (source = 'src0') AS tgt,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT doc_id, tgt, t.term AS g FROM d,
             LATERAL unnest(ws) AS t(term)
           UNION ALL
           SELECT doc_id, tgt,
             ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)] AS g
           FROM d, LATERAL unnest(generate_series(1, len(ws) - 1))
             AS s(i)
           WHERE len(ws) >= 2),
         c AS (
           SELECT g, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END)
               AS BIGINT) AS ct,
             CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
           FROM g GROUP BY 1),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t,
           CAST(sum(cr) AS BIGINT) AS r,
           CAST(count(*) AS BIGINT) AS v FROM c),
         lp AS (
           SELECT g,
             CAST(floor(ln(CAST(ct + 1 AS DOUBLE) /
               CAST(t + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
             - CAST(floor(ln(CAST(cr + 1 AS DOUBLE) /
               CAST(r + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
               AS dlt
           FROM c, tot),
         w AS (
           SELECT g.doc_id, count(*) AS n_grams,
             CAST(sum(lp.dlt) AS BIGINT) AS w_micros
           FROM g JOIN lp USING (g) GROUP BY 1),
         scored AS (
           SELECT doc_id, n_grams, w_micros,
             w_micros + CAST(floor(-ln(-ln(
               (CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
                 AS DOUBLE) + 0.5) / 4294967296.0))
               * 1000000.0 + 0.5) AS BIGINT) AS score_micros
           FROM w)
         SELECT * FROM (
           SELECT doc_id, n_grams, w_micros, score_micros FROM scored
           ORDER BY score_micros DESC, doc_id LIMIT 100)
         ORDER BY doc_id""",
    // Source overlap: distinct (source, 5-gram) -> per-gram source
    // sets -> pair counts.
    "doc_source_overlap" ->
      """WITH d AS (
           SELECT source, string_split(trim(regexp_replace(lower(text),
             '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT DISTINCT source,
             array_to_string(ws[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
               AS gram
           FROM d, unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)),
         s AS (
           SELECT gram, list_sort(list(source)) AS ss FROM g
           GROUP BY gram HAVING count(*) > 1),
         p AS (
           SELECT a.sa AS source_a, b.sb AS source_b
           FROM s, unnest(ss) AS a(sa), unnest(ss) AS b(sb)
           WHERE a.sa < b.sb)
         SELECT source_a, source_b, count(*) AS n_shared
         FROM p GROUP BY 1, 2 ORDER BY source_a, source_b""",
    // Split: same md5-prefix ladder; cccccccc/e6666666 are
    // thresholdHex(0.8)/thresholdHex(0.9).
    "doc_split" ->
      """WITH s AS (
           SELECT doc_id, source,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    < 'cccccccc' THEN 'train'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    < 'e6666666' THEN 'val'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT source, split, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM s GROUP BY 1, 2 ORDER BY source, split""",
    // The composed corpus-prep chain: rules keep -> first-id per
    // md5(text) -> recursive-CTE packing of the survivors.
    "doc_pipeline_e2e" ->
      """WITH RECURSIVE raw AS (
           SELECT doc_id, source, text,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         m AS (
           SELECT doc_id, source, text,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT)
               AS swl,
             CAST(len(list_filter(ws, w -> w IN ('the','a','an','of','and',
               'to','with','that','be','have'))) AS BIGINT) AS nstop,
             CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
               AS BIGINT) AS nalpha,
             CAST(len(list_filter(ws, w -> w LIKE '#%' OR contains(w, '...')
               OR contains(w, '{'))) AS BIGINT) AS nsym
           FROM raw),
         kept AS (
           SELECT doc_id, source, text, n_words AS n_tokens FROM m
           WHERE NOT (n_words < 50 OR n_words > 100000)
             AND NOT (swl / CAST(n_words AS DOUBLE) < 3.0
               OR swl / CAST(n_words AS DOUBLE) > 10.0)
             AND nstop >= 2
             AND nalpha / CAST(n_words AS DOUBLE) >= 0.8
             AND nsym / CAST(n_words AS DOUBLE) <= 0.1),
         dd AS (
           SELECT doc_id, source, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
               AS dn
           FROM kept),
         d AS (
           SELECT doc_id, source, n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM dd WHERE dn = 1),
         p AS (
           SELECT source, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens > 512 THEN p.bin + 1
                  ELSE p.bin END AS bin,
             CASE WHEN p.fill + d.n_tokens > 512 THEN d.n_tokens
                  ELSE p.fill + d.n_tokens END AS fill
           FROM p JOIN d ON d.source IS NOT DISTINCT FROM p.source AND d.rn = p.rn + 1)
         SELECT source, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM p GROUP BY 1, 2 ORDER BY source, bin""",
    // Conjunctive search: same inverted-index probe, query table as
    // VALUES.
    "doc_search" ->
      """WITH q(query_id, term) AS (VALUES
             (CAST(1 AS BIGINT), 'spark'), (CAST(1 AS BIGINT), 'join'),
             (CAST(2 AS BIGINT), 'merge'), (CAST(2 AS BIGINT), 'window'),
             (CAST(2 AS BIGINT), 'sort'), (CAST(3 AS BIGINT), 'dup')),
         d AS (
           SELECT doc_id, list_distinct(string_split(trim(regexp_replace(
             lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ')) AS ws
           FROM documents WHERE text IS NOT NULL),
         dt AS (
           SELECT doc_id, t.term FROM d, LATERAL unnest(ws) AS t(term)),
         m AS (
           SELECT q.query_id, dt.doc_id, count(*) AS hits
           FROM dt JOIN q USING (term) GROUP BY 1, 2),
         a AS (SELECT query_id, count(*) AS arity FROM q GROUP BY 1)
         SELECT m.query_id, count(*) AS n_matches,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM m JOIN a USING (query_id) WHERE m.hits = a.arity
         GROUP BY 1 ORDER BY query_id""",
    // Greedy packing: replay the recurrence sequentially per source
    // with a recursive CTE — bin 0 / fill = tokens at rn 1; overflow
    // => bin + 1, fill = tokens; else fill += tokens.
    "doc_pack" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, source,
             CAST(len(string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ')) AS BIGINT)
               AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn
           FROM documents WHERE text IS NOT NULL),
         p AS (
           SELECT source, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens > 512 THEN p.bin + 1
                  ELSE p.bin END AS bin,
             CASE WHEN p.fill + d.n_tokens > 512 THEN d.n_tokens
                  ELSE p.fill + d.n_tokens END AS fill
           FROM p JOIN d ON d.source IS NOT DISTINCT FROM p.source AND d.rn = p.rn + 1)
         SELECT source, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM p GROUP BY 1, 2 ORDER BY source, bin""",
    // Tokenizer-grade token counting: the subword-budget scheme
    // replayed per run via regexp_extract_all — letter runs
    // ceil(len/6), digit runs ceil(len/3), other non-whitespace
    // CODE POINTS 1 (the regex is per-codepoint, matching the
    // expression's codePointAt walk); the whitespace class is spelled
    // [ \t\n\f\r] on BOTH sides (RE2's \s) so run boundaries agree
    // char-for-char. list_sum([]) is NULL in DuckDB -> coalesce 0 for
    // non-null text (an all-whitespace doc counts 0 tokens, as the
    // expression does); NULL text stays NULL (sum/max skip it).
    "doc_token_count" ->
      """WITH t AS (
           SELECT source,
             CASE WHEN text IS NULL THEN NULL
               ELSE CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]'),
                 r -> CASE WHEN regexp_matches(r, '^[A-Za-z]')
                     THEN CAST(ceil(len(r) / 6.0) AS BIGINT)
                   WHEN regexp_matches(r, '^[0-9]')
                     THEN CAST(ceil(len(r) / 3.0) AS BIGINT)
                   ELSE CAST(1 AS BIGINT) END)), 0) AS BIGINT) END
               AS n_tok
           FROM documents)
         SELECT source, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           count(*) AS n_docs, CAST(max(n_tok) AS BIGINT) AS max_tokens
         FROM t GROUP BY 1 ORDER BY source""",
    // MinHash LSH full replay (round-15 verdict #5): the fixed mix
    // constants make the seeded signature exactly computable — fnv1a
    // and splitmix64 are transliterated with HUGEINT mod-2^64
    // arithmetic (UBIGINT xor/shift; a*b mod 2^64 via 32-bit limb
    // split), Kirsch-Mitzenmacher row j = h0 + j*h2 with SIGNED
    // 64-bit min, 8x8 banding as BIGINT-list-slice equality, the
    // sig-overlap prefilter with the identical double margin, then the
    // exact shingle-set Jaccard refine (doc_jaccard_pairs form).
    "doc_minhash_dedup" ->
      """WITH d AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM documents WHERE text IS NOT NULL),
         sh AS (
           SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS g
           FROM d, unnest(range(1, greatest(length(norm) - 4, 0) + 1)) AS t(i)),
         hb0 AS (SELECT doc_id, g, CAST(14695981039346656037 AS HUGEINT) AS h FROM sh),
         hb1 AS (SELECT doc_id, g, ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 1, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 1, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM hb0),
         hb2 AS (SELECT doc_id, g, ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 2, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 2, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM hb1),
         hb3 AS (SELECT doc_id, g, ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 3, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 3, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM hb2),
         hb4 AS (SELECT doc_id, g, ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 4, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 4, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM hb3),
         hb5 AS (SELECT doc_id, g, ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 5, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((CAST(unicode(substring(g, 5, 1)) AS HUGEINT)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM hb4),
         mz0 AS (SELECT doc_id, g, (((h) + (11400714819323198485)) % 18446744073709551616) AS za,
           ((((((h) + (11400714819323198485)) % 18446744073709551616)) + (11400714819323198485)) % 18446744073709551616) AS zb FROM hb5),
         mz1 AS (SELECT doc_id, g, ((((CAST(xor(CAST((za) AS UBIGINT), CAST((((za) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((za) AS UBIGINT), CAST((((za) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS za,
           ((((CAST(xor(CAST((zb) AS UBIGINT), CAST((((zb) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((zb) AS UBIGINT), CAST((((zb) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS zb FROM mz0),
         mz2 AS (SELECT doc_id, g, ((((CAST(xor(CAST((za) AS UBIGINT), CAST((((za) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((za) AS UBIGINT), CAST((((za) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS za,
           ((((CAST(xor(CAST((zb) AS UBIGINT), CAST((((zb) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((zb) AS UBIGINT), CAST((((zb) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS zb FROM mz1),
         hh AS (SELECT doc_id, g, CAST(xor(CAST((za) AS UBIGINT), CAST((((za) // 2147483648)) AS UBIGINT)) AS HUGEINT) AS h0,
           CAST((CAST((CAST(xor(CAST((zb) AS UBIGINT), CAST((((zb) // 2147483648)) AS UBIGINT)) AS HUGEINT)) AS UBIGINT) | 1) AS HUGEINT)
             AS h2 FROM mz2),
         sv AS (
           SELECT doc_id, j,
             min(CASE WHEN v >= 9223372036854775808
               THEN CAST(v - 18446744073709551616 AS BIGINT) ELSE CAST(v AS BIGINT) END) AS s
           FROM (
             SELECT doc_id, js.j AS j, (((h0) + (((js.j * h2) % 18446744073709551616))) % 18446744073709551616) AS v
             FROM hh CROSS JOIN (SELECT CAST(unnest(range(64)) AS HUGEINT) AS j) js)
           GROUP BY doc_id, j),
         sigl AS (SELECT doc_id, list(s ORDER BY j) AS sig FROM sv GROUP BY doc_id),
         sig AS (
           SELECT d.doc_id,
             coalesce(sigl.sig, list_transform(range(64),
               x -> CAST(9223372036854775807 AS BIGINT))) AS sig
           FROM d LEFT JOIN sigl USING (doc_id)),
         bands AS (
           SELECT doc_id, b.b AS band,
             sig[CAST(b.b * 8 + 1 AS INT):CAST(b.b * 8 + 8 AS INT)] AS bs
           FROM sig CROSS JOIN (SELECT unnest(range(8)) AS b) b),
         cand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bs = y.bs AND x.doc_id < y.doc_id),
         pre AS (
           SELECT c.id_a, c.id_b
           FROM cand c
           JOIN sig sa ON sa.doc_id = c.id_a
           JOIN sig sb ON sb.doc_id = c.id_b
           WHERE CAST(len(list_filter(range(64),
               j -> sa.sig[CAST(j + 1 AS INT)] = sb.sig[CAST(j + 1 AS INT)]))
               AS DOUBLE) / 64.0
             >= 0.7 - 2.5 * sqrt(0.7 * (1.0 - 0.7) / 64.0)),
         szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.id_a, p.id_b,
             CAST(count(sb.g) AS BIGINT) AS i,
             CAST(count(sa.g) AS BIGINT) AS present_a
           FROM pre p
           LEFT JOIN sh sa ON sa.doc_id = p.id_a
           LEFT JOIN sh sb ON sb.doc_id = p.id_b AND sb.g = sa.g
           GROUP BY p.id_a, p.id_b),
         scored AS (
           SELECT i.id_a, i.id_b,
             CASE WHEN coalesce(za.sz, 0) = 0 AND coalesce(zb.sz, 0) = 0 THEN 1.0
               ELSE i.i * 1.0 / (coalesce(za.sz, 0) + coalesce(zb.sz, 0) - i.i)
             END AS jac
           FROM inter i
           LEFT JOIN szs za ON za.doc_id = i.id_a
           LEFT JOIN szs zb ON zb.doc_id = i.id_b)
         SELECT id_a, id_b, round(jac, 6) AS jaccard
         FROM scored WHERE jac >= 0.7 ORDER BY id_a, id_b""",
    // SimHash full replay (the doc_minhash_dedup HUGEINT toolkit):
    // per word occurrence, mix(fnv1a(word)) via a list_reduce fold, ±1
    // per bit, sign-aggregated signature, four 16-bit chunk bands,
    // bit_count(xor) <= 6 refine.
    "doc_simhash_dedup" ->
      """WITH d AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM documents WHERE text IS NOT NULL),
         words AS (
           SELECT doc_id, t.w FROM d, unnest(string_split(norm, ' ')) AS t(w)
           WHERE t.w <> ''),
         hb AS (SELECT doc_id, list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), list_transform(string_split_regex(w, ''), ch -> CAST(unicode(ch) AS HUGEINT))), (h, c) -> ((((CAST(xor(CAST((h) AS UBIGINT), CAST((c) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((c) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616)) AS h FROM words),
         mz0 AS (SELECT doc_id, (((h) + (11400714819323198485)) % 18446744073709551616) AS z FROM hb),
         mz1 AS (SELECT doc_id, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM mz0),
         mz2 AS (SELECT doc_id, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM mz1),
         hh AS (SELECT doc_id, CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT) AS h FROM mz2),
         bits AS (
           SELECT doc_id, b.b AS b,
             sum(CASE WHEN (h // (CASE b.b
                 WHEN 0 THEN 1 ELSE power(2, b.b)::HUGEINT END)) % 2 = 1
               THEN 1 ELSE -1 END) AS cnt
           FROM hh CROSS JOIN (SELECT unnest(range(64)) AS b) b
           GROUP BY doc_id, b.b),
         usig AS (
           SELECT doc_id,
             sum(CASE WHEN cnt > 0 THEN power(2, b)::HUGEINT ELSE 0 END)::HUGEINT
               AS u
           FROM bits GROUP BY doc_id),
         sig AS (
           SELECT d.doc_id, coalesce(usig.u, CAST(0 AS HUGEINT)) AS u
           FROM d LEFT JOIN usig USING (doc_id)),
         chunks AS (
           SELECT doc_id, u, i.i AS band,
             CAST((u // (CASE i.i WHEN 0 THEN 1 ELSE power(2, i.i * 16)::HUGEINT END))
               % 65536 AS BIGINT) AS chunk
           FROM sig CROSS JOIN (SELECT unnest(range(4)) AS i) i),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.u AS ua, b.u AS ub
           FROM chunks a JOIN chunks b
             ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT id_a, id_b,
           CAST(bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) AS INT)
             AS hamming
         FROM cand WHERE bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) <= 6
         ORDER BY id_a, id_b""",
    // Winnowing full replay: per-position mix(fnv1a(12-gram)) signed
    // hashes, window-16 rolling minima (distinct set == the engine's
    // consecutive-dedup under the explode+distinct), m<=window global
    // min, df-cap over DISTINCT content, shared-fp count >= 10.
    "doc_winnow_pairs" ->
      """WITH d AS (
           SELECT doc_id, md5(text) AS ck,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM documents WHERE text IS NOT NULL),
         sh AS (
           SELECT doc_id, ck, CAST(i AS BIGINT) - 1 AS pos,
             substring(norm, CAST(i AS INT), 12) AS g,
             length(norm) - 11 AS m
           FROM d, unnest(range(1, greatest(length(norm) - 10, 0) + 1)) AS t(i)
           WHERE length(norm) >= 12),
         hb AS (SELECT doc_id, ck, pos, m, list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), list_transform(string_split_regex(g, ''), ch -> CAST(unicode(ch) AS HUGEINT))), (h, c) -> ((((CAST(xor(CAST((h) AS UBIGINT), CAST((c) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (1099511628211) + ((((CAST(xor(CAST((h) AS UBIGINT), CAST((c) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (1099511628211)) % 4294967296) * 4294967296) % 18446744073709551616)) AS z FROM sh),
         mz0 AS (SELECT doc_id, ck, pos, m, (((z) + (11400714819323198485)) % 18446744073709551616) AS z FROM hb),
         mz1 AS (SELECT doc_id, ck, pos, m,
           ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM mz0),
         mz2 AS (SELECT doc_id, ck, pos, m,
           ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM mz1),
         hs AS (
           SELECT doc_id, ck, pos, m,
             CASE WHEN CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT) >= 9223372036854775808
               THEN CAST(CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT) - 18446744073709551616 AS BIGINT)
               ELSE CAST(CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT) AS BIGINT) END AS h
           FROM mz2),
         small AS (
           SELECT DISTINCT doc_id, ck, min(h) OVER (PARTITION BY doc_id) AS fp
           FROM hs WHERE m <= 16),
         wmins AS (
           SELECT doc_id, ck, pos, m,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
           FROM hs WHERE m > 16),
         big AS (
           SELECT DISTINCT doc_id, ck, fp FROM wmins WHERE pos <= m - 16),
         fps AS (SELECT * FROM small UNION ALL SELECT * FROM big),
         stop AS (
           SELECT fp FROM fps GROUP BY fp HAVING count(DISTINCT ck) > 20),
         pruned AS (
           SELECT doc_id, fp FROM fps WHERE fp NOT IN (SELECT fp FROM stop))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS shared_fps
         FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 10 ORDER BY id_a, id_b""",
    // Hyperplane-LSH ANN full replay (round-15 verdict #5 extended):
    // the seeded planes are fixed mix constants — planeComponent
    // replays via the HUGEINT splitmix toolkit, bucket bits via
    // list_dot_product sign tests (margins are O(0.1), far above any
    // summation-order ulp), then the emb_knn cosine refine.
    "emb_ann" ->
      """WITH pc0 AS (
           SELECT t.t, pp.p, ij.j,
             ((((((CAST(42 + t.t * 7919 AS HUGEINT)) + ((CAST(pp.p AS HUGEINT) * 11400714819323198485) % 18446744073709551616)) % 18446744073709551616)) + ((CAST(ij.j AS HUGEINT) * 13787848793156543929) % 18446744073709551616)) % 18446744073709551616) AS z
           FROM (SELECT unnest(range(4)) AS t) t
           CROSS JOIN (SELECT unnest(range(10)) AS p) pp
           CROSS JOIN (SELECT unnest(range(64)) AS j) ij),
         pc1 AS (SELECT t, p, j, (((z) + (11400714819323198485)) % 18446744073709551616) AS z FROM pc0),
         pc2 AS (SELECT t, p, j, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM pc1),
         pc3 AS (SELECT t, p, j, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM pc2),
         pc4 AS (SELECT t, p, j,
           CAST(CAST(CASE WHEN (CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) >= 9223372036854775808 THEN CAST((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) - 18446744073709551616 AS BIGINT) ELSE CAST((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) AS BIGINT) END AS DOUBLE)
             / 9223372036854775808.0 AS REAL) AS comp FROM pc3),
         planes AS (SELECT t, p, list(comp ORDER BY j) AS plane
           FROM pc4 GROUP BY t, p),
         bk AS (
           SELECT e.vec_id, pl.t,
             CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                 pl.plane::DOUBLE[]) >= 0
               THEN CAST(power(2, pl.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.t),
         cand AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
           WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         sims AS (
           SELECT cand.query_id, cand.neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
                     JOIN embeddings c ON c.vec_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sims) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // Embedding near-dup LSH full replay: same plane replay at
    // bits=4/tables=8, NaN-guarded cosine refine at 0.42.
    "emb_neardup_lsh" ->
      """WITH pc0 AS (
           SELECT t.t, pp.p, ij.j,
             ((((((CAST(42 + t.t * 7919 AS HUGEINT)) + ((CAST(pp.p AS HUGEINT) * 11400714819323198485) % 18446744073709551616)) % 18446744073709551616)) + ((CAST(ij.j AS HUGEINT) * 13787848793156543929) % 18446744073709551616)) % 18446744073709551616) AS z
           FROM (SELECT unnest(range(8)) AS t) t
           CROSS JOIN (SELECT unnest(range(4)) AS p) pp
           CROSS JOIN (SELECT unnest(range(64)) AS j) ij),
         pc1 AS (SELECT t, p, j, (((z) + (11400714819323198485)) % 18446744073709551616) AS z FROM pc0),
         pc2 AS (SELECT t, p, j, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (13787848793156543929) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 1073741824)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (13787848793156543929)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM pc1),
         pc3 AS (SELECT t, p, j, ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) % 4294967296) * (10723151780598845931) + ((((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 134217728)) AS UBIGINT)) AS HUGEINT)) // 4294967296) * (10723151780598845931)) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM pc2),
         pc4 AS (SELECT t, p, j,
           CAST(CAST(CASE WHEN (CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) >= 9223372036854775808 THEN CAST((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) - 18446744073709551616 AS BIGINT) ELSE CAST((CAST(xor(CAST((z) AS UBIGINT), CAST((((z) // 2147483648)) AS UBIGINT)) AS HUGEINT)) AS BIGINT) END AS DOUBLE)
             / 9223372036854775808.0 AS REAL) AS comp FROM pc3),
         planes AS (SELECT t, p, list(comp ORDER BY j) AS plane
           FROM pc4 GROUP BY t, p),
         bk AS (
           SELECT e.vec_id, pl.t,
             CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                 pl.plane::DOUBLE[]) >= 0
               THEN CAST(power(2, pl.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.t),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
         sims AS (
           SELECT cand.id_a, cand.id_b,
             floor((list_cosine_similarity(x.embedding::DOUBLE[],
                                           y.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cand JOIN embeddings x ON x.vec_id = cand.id_a
                     JOIN embeddings y ON y.vec_id = cand.id_b)
         SELECT id_a, id_b, sim FROM sims
         WHERE NOT isnan(sim) AND sim >= 0.42 ORDER BY id_a, id_b""",
    // SemDeDup full replay: the emb_ivf centroid CTEs at nlist=8 over
    // the vec_id<200 slice, per-cluster domination with the paper
    // keep-rule ((centroid_sim, id) ordering) and the 6dp cosine.
    "emb_semdedup" ->
      """WITH emb AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                  embedding AS c
           FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 8)),
         s1 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM emb e CROSS JOIN c0 cl),
         a1 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s1) t WHERE rn = 1),
         u1p AS (
           SELECT a1.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a1 JOIN emb e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a1.cluster, i.i),
         u1 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u1p GROUP BY cluster),
         c1 AS (
           SELECT c0.cluster, coalesce(u1.c, c0.c) AS c
           FROM c0 LEFT JOIN u1 USING (cluster)),
         s2 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM emb e CROSS JOIN c1 cl),
         a2 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s2) t WHERE rn = 1),
         u2p AS (
           SELECT a2.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a2 JOIN emb e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a2.cluster, i.i),
         u2 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u2p GROUP BY cluster),
         c2 AS (
           SELECT c1.cluster, coalesce(u2.c, c1.c) AS c
           FROM c1 LEFT JOIN u2 USING (cluster)),
         sf AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM emb e CROSS JOIN c2 cl),
         af AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM sf) t WHERE rn = 1),
         base AS (
           SELECT af.vec_id, af.cluster,
             floor((list_cosine_similarity(e.embedding::DOUBLE[], c2.c::DOUBLE[]))
               * 1000000.0 + 0.5) / 1000000.0 AS centroid_sim
           FROM af JOIN emb e USING (vec_id) JOIN c2 USING (cluster)),
         dom AS (
           SELECT DISTINCT x.vec_id
           FROM base x JOIN base y ON x.cluster = y.cluster
             AND y.vec_id <> x.vec_id
           JOIN emb ex ON ex.vec_id = x.vec_id
           JOIN emb ey ON ey.vec_id = y.vec_id
           WHERE NOT isnan(list_cosine_similarity(ex.embedding::DOUBLE[],
               ey.embedding::DOUBLE[]))
             AND floor((list_cosine_similarity(ex.embedding::DOUBLE[],
                 ey.embedding::DOUBLE[])) * 1000000.0 + 0.5) / 1000000.0 >= 0.42
             AND (y.centroid_sim < x.centroid_sim OR
               (y.centroid_sim = x.centroid_sim AND y.vec_id < x.vec_id)))
         SELECT b.vec_id, b.cluster, b.centroid_sim,
           (dom.vec_id IS NULL) AS kept
         FROM base b LEFT JOIN dom ON dom.vec_id = b.vec_id
         ORDER BY b.vec_id""",
    // IVF-SQ full replay: the emb_ivf centroid CTEs (nlist=16) compose
    // with the emb_sq affine-code scoring — cell-probed candidates,
    // integer-micros ADC, top-10.
    "emb_ivfsq" ->
      """WITH c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                  embedding AS c
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         s1 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c0 cl),
         a1 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s1) t WHERE rn = 1),
         u1p AS (
           SELECT a1.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a1 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a1.cluster, i.i),
         u1 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u1p GROUP BY cluster),
         c1 AS (
           SELECT c0.cluster, coalesce(u1.c, c0.c) AS c
           FROM c0 LEFT JOIN u1 USING (cluster)),
         s2 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c1 cl),
         a2 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s2) t WHERE rn = 1),
         u2p AS (
           SELECT a2.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a2 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a2.cluster, i.i),
         u2 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u2p GROUP BY cluster),
         c2 AS (
           SELECT c1.cluster, coalesce(u2.c, c1.c) AS c
           FROM c1 LEFT JOIN u2 USING (cluster)),
         sf AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c2 cl),
         af AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM sf) t WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn
             FROM sf WHERE vec_id < 10) t WHERE rn <= 4),
         mm AS (
           SELECT i.i AS pos,
             CAST(min(embedding[i.i + 1]) AS DOUBLE) AS mn,
             CAST(max(embedding[i.i + 1]) AS DOUBLE) AS mx
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY 1),
         st AS (SELECT pos, mn, (mx - mn) / 255.0 AS step FROM mm),
         codes AS (
           SELECT e.vec_id, s.pos, s.mn, s.step,
             CASE WHEN s.step = 0 THEN 0
               ELSE least(255, greatest(0, CAST(floor(
                 (CAST(e.embedding[s.pos + 1] AS DOUBLE) - s.mn)
                   / s.step + 0.5) AS BIGINT))) END AS c
           FROM embeddings e CROSS JOIN st s),
         cand AS (
           SELECT qp.query_id, af.vec_id AS neighbor_id
           FROM qp JOIN af USING (cluster)
           WHERE qp.query_id <> af.vec_id),
         scores AS (
           SELECT cand.query_id, cand.neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[c.pos + 1] AS DOUBLE) *
                 (c.mn + c.step * CAST(c.c AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
           FROM cand
           JOIN embeddings q ON q.vec_id = cand.query_id
           JOIN codes c ON c.vec_id = cand.neighbor_id
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, score_micros, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micros DESC, neighbor_id ASC) AS rank
           FROM scores) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // Language-ID full replay FOR THIS CORPUS: the corpus is pure
    // ASCII (verified), so script short-circuits cannot fire; any
    // future non-ASCII row classifies as the loud 'NONASCII' sentinel
    // and fails the hash rather than silently approximating. Latin
    // path: letters count, normalize, first-400-word stopword voting,
    // (votes desc, lang asc) winner, und on zero votes.
    "doc_langid" ->
      """WITH prof(lang, w) AS (
           SELECT * FROM (VALUES
             ('en', 'the'),
             ('en', 'and'),
             ('en', 'of'),
             ('en', 'to'),
             ('en', 'a'),
             ('en', 'in'),
             ('en', 'is'),
             ('en', 'that'),
             ('en', 'it'),
             ('en', 'for'),
             ('en', 'was'),
             ('en', 'with'),
             ('en', 'on'),
             ('en', 'as'),
             ('en', 'are'),
             ('en', 'this'),
             ('en', 'be'),
             ('en', 'at'),
             ('en', 'have'),
             ('en', 'not'),
             ('de', 'der'),
             ('de', 'die'),
             ('de', 'das'),
             ('de', 'und'),
             ('de', 'ist'),
             ('de', 'nicht'),
             ('de', 'ein'),
             ('de', 'eine'),
             ('de', 'mit'),
             ('de', 'auf'),
             ('de', 'sich'),
             ('de', 'des'),
             ('de', 'dem'),
             ('de', 'den'),
             ('de', 'von'),
             ('de', 'zu'),
             ('de', 'im'),
             ('de', 'für'),
             ('fr', 'le'),
             ('fr', 'la'),
             ('fr', 'les'),
             ('fr', 'des'),
             ('fr', 'et'),
             ('fr', 'est'),
             ('fr', 'une'),
             ('fr', 'dans'),
             ('fr', 'que'),
             ('fr', 'qui'),
             ('fr', 'pour'),
             ('fr', 'pas'),
             ('fr', 'sur'),
             ('fr', 'avec'),
             ('fr', 'au'),
             ('fr', 'du'),
             ('fr', 'ce'),
             ('fr', 'il'),
             ('es', 'el'),
             ('es', 'los'),
             ('es', 'las'),
             ('es', 'de'),
             ('es', 'que'),
             ('es', 'y'),
             ('es', 'en'),
             ('es', 'un'),
             ('es', 'una'),
             ('es', 'es'),
             ('es', 'no'),
             ('es', 'con'),
             ('es', 'por'),
             ('es', 'para'),
             ('es', 'su'),
             ('es', 'se'),
             ('es', 'del'),
             ('es', 'lo'),
             ('it', 'il'),
             ('it', 'di'),
             ('it', 'che'),
             ('it', 'e'),
             ('it', 'la'),
             ('it', 'per'),
             ('it', 'un'),
             ('it', 'una'),
             ('it', 'in'),
             ('it', 'non'),
             ('it', 'sono'),
             ('it', 'con'),
             ('it', 'del'),
             ('it', 'si'),
             ('it', 'da'),
             ('it', 'come'),
             ('it', 'anche'),
             ('pt', 'o'),
             ('pt', 'a'),
             ('pt', 'de'),
             ('pt', 'que'),
             ('pt', 'e'),
             ('pt', 'do'),
             ('pt', 'da'),
             ('pt', 'em'),
             ('pt', 'um'),
             ('pt', 'uma'),
             ('pt', 'para'),
             ('pt', 'com'),
             ('pt', 'não'),
             ('pt', 'os'),
             ('pt', 'as'),
             ('pt', 'no'),
             ('pt', 'na'),
             ('pt', 'por'))),
         d AS (
           SELECT doc_id, text, substring(text, 1, 4000) AS pre FROM documents),
         lets AS (
           SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
               ELSE length(regexp_replace(pre, '[^A-Za-z]', '', 'g')) END AS letters
           FROM d),
         wrds AS (
           SELECT d.doc_id, t.w
           FROM d, unnest((string_split(trim(regexp_replace(lower(pre),
             '\s+', ' ', 'g')), ' '))[1:400]) AS t(w)
           WHERE d.text IS NOT NULL),
         votes AS (
           SELECT doc_id, p.lang, count(*) AS v
           FROM wrds JOIN prof p ON wrds.w = p.w GROUP BY 1, 2),
         win AS (
           SELECT doc_id, lang FROM (
             SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id
               ORDER BY v DESC, lang ASC) AS rn FROM votes WHERE v > 0) t
           WHERE rn = 1),
         pred AS (
           SELECT d.doc_id,
             CASE WHEN d.text IS NULL THEN NULL
               WHEN regexp_matches(d.text, '[^\x00-\x7F]') THEN 'NONASCII'
               WHEN lets.letters = 0 THEN 'und'
               ELSE coalesce(win.lang, 'und') END AS pred
           FROM d JOIN lets USING (doc_id) LEFT JOIN win USING (doc_id))
         SELECT pred, count(*) AS n FROM pred GROUP BY 1 ORDER BY pred""",
    // PQ ADC full replay (round-15 verdict #5 extended): two unrolled
    // per-subspace Lloyd iterations with the integer-micros assignment
    // scores (`x·c − |c|²/2` per-dim micros) and micros-sum codebook
    // updates the Scala trainer now pins; ADC score = Σ_s q_s·c lookups
    // rounded to 6dp, id tie-break.
    "emb_pq" ->
      """WITH b0 AS (
           SELECT s.s, iv.c, p.p, iv.embedding[s.s*8 + p.p + 1] AS y
           FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
                   embedding
                 FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)) iv
           CROSS JOIN (SELECT unnest(range(8)) AS s) s
           CROSS JOIN (SELECT unnest(range(8)) AS p) p),
         enc1 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b0 b GROUP BY 1, 2, 3),
         asn1 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc1) t WHERE rn = 1),
         upd1 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn1 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b1 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b0 b LEFT JOIN upd1 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         enc2 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b1 b GROUP BY 1, 2, 3),
         asn2 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc2) t WHERE rn = 1),
         upd2 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn2 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b2 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b1 b LEFT JOIN upd2 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         encF AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b2 b GROUP BY 1, 2, 3),
         asnF AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM encF) t WHERE rn = 1),
         sc AS (
           SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
             floor(sum(CAST(q.embedding[a.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score
           FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
           CROSS JOIN asnF a
           JOIN b2 b ON b.s = a.s AND b.c = a.c
           WHERE q.vec_id <> a.vec_id
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id ASC) AS rank FROM sc) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // PQ + exact re-rank full replay: the emb_pq CTEs nominate top-30,
    // then ONLY those pairs re-score with the exact per-dim-micros tree
    // (the emb_sq_rerank form) and re-rank to top-10.
    "emb_pq_rerank" ->
      """WITH b0 AS (
           SELECT s.s, iv.c, p.p, iv.embedding[s.s*8 + p.p + 1] AS y
           FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
                   embedding
                 FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)) iv
           CROSS JOIN (SELECT unnest(range(8)) AS s) s
           CROSS JOIN (SELECT unnest(range(8)) AS p) p),
         enc1 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b0 b GROUP BY 1, 2, 3),
         asn1 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc1) t WHERE rn = 1),
         upd1 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn1 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b1 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b0 b LEFT JOIN upd1 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         enc2 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b1 b GROUP BY 1, 2, 3),
         asn2 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc2) t WHERE rn = 1),
         upd2 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn2 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b2 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b1 b LEFT JOIN upd2 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         encF AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b2 b GROUP BY 1, 2, 3),
         asnF AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM encF) t WHERE rn = 1),
         sc AS (
           SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
             floor(sum(CAST(q.embedding[a.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score
           FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
           CROSS JOIN asnF a
           JOIN b2 b ON b.s = a.s AND b.c = a.c
           WHERE q.vec_id <> a.vec_id
           GROUP BY 1, 2),
         cand AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id ASC) AS rank FROM sc) t
           WHERE rank <= 30),
         rescored AS (
           SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(q.embedding[j+1] AS DOUBLE)
                   * CAST(n.embedding[j+1] AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS score_micros
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.query_id
           JOIN embeddings n ON n.vec_id = c.neighbor_id)
         SELECT query_id, neighbor_id, score_micros, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micros DESC, neighbor_id ASC) AS rank
           FROM rescored) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // IVF-PQ full replay: the emb_ivf centroid CTEs route probes, the
    // emb_pq codebook CTEs supply codes, ADC scores only the probed
    // cells — the full production composition, byte-exact.
    "emb_ivfpq" ->
      """WITH c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                  embedding AS c
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         s1 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c0 cl),
         a1 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s1) t WHERE rn = 1),
         u1p AS (
           SELECT a1.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a1 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a1.cluster, i.i),
         u1 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u1p GROUP BY cluster),
         c1 AS (
           SELECT c0.cluster, coalesce(u1.c, c0.c) AS c
           FROM c0 LEFT JOIN u1 USING (cluster)),
         s2 AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c1 cl),
         a2 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s2) t WHERE rn = 1),
         u2p AS (
           SELECT a2.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a2 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a2.cluster, i.i),
         u2 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u2p GROUP BY cluster),
         c2 AS (
           SELECT c1.cluster, coalesce(u2.c, c1.c) AS c
           FROM c1 LEFT JOIN u2 USING (cluster)),
         sf AS (
           SELECT e.vec_id, cl.cluster, CAST(list_sum(list_transform(range(64), j -> CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c2 cl),
         af AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM sf) t WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn
             FROM sf WHERE vec_id < 10) t WHERE rn <= 4),
         b0 AS (
           SELECT s.s, iv.c, p.p, iv.embedding[s.s*8 + p.p + 1] AS y
           FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
                   embedding
                 FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)) iv
           CROSS JOIN (SELECT unnest(range(8)) AS s) s
           CROSS JOIN (SELECT unnest(range(8)) AS p) p),
         enc1 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b0 b GROUP BY 1, 2, 3),
         asn1 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc1) t WHERE rn = 1),
         upd1 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn1 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b1 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b0 b LEFT JOIN upd1 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         enc2 AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b1 b GROUP BY 1, 2, 3),
         asn2 AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM enc2) t WHERE rn = 1),
         upd2 AS (
           SELECT a.s, a.c, p.p,
             sum(CAST(floor(CAST(e.embedding[a.s*8 + p.p + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS sm,
             count(*) AS n
           FROM asn2 a JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(8)) AS p) p
           GROUP BY 1, 2, 3),
         b2 AS (
           SELECT b.s, b.c, b.p,
             coalesce(CAST(CAST(u.sm AS DOUBLE) / 1000000.0 / u.n AS REAL), b.y) AS y
           FROM b1 b LEFT JOIN upd2 u
             ON b.s = u.s AND b.c = u.c AND b.p = u.p),
         encF AS (
           SELECT e.vec_id, b.s, b.c,
             sum(CAST(floor((CAST(e.embedding[b.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)
               - 0.5 * CAST(b.y AS DOUBLE) * CAST(b.y AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS sc
           FROM embeddings e CROSS JOIN b2 b GROUP BY 1, 2, 3),
         asnF AS (
           SELECT vec_id, s, c FROM (
             SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
               ORDER BY sc DESC, c ASC) AS rn FROM encF) t WHERE rn = 1),
         cand AS (
           SELECT DISTINCT qp.query_id, af.vec_id AS neighbor_id
           FROM qp JOIN af USING (cluster)
           WHERE qp.query_id <> af.vec_id),
         sc AS (
           SELECT c.query_id, c.neighbor_id,
             floor(sum(CAST(q.embedding[a.s*8 + b.p + 1] AS DOUBLE)
                 * CAST(b.y AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.query_id
           JOIN asnF a ON a.vec_id = c.neighbor_id
           JOIN b2 b ON b.s = a.s AND b.c = a.c
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id ASC) AS rank FROM sc) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // BPE-count certificate: the Spark side re-derives the structural
    // byte bounds from its OWN expression output and counts violations;
    // the oracle is the closed-form anchor. (The merge loop itself is
    // not SQL-expressible — tools/bpe_oracle.py is the differential
    // twin for the counts.)
    "doc_tokens_bpe_sound" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents WHERE text IS NOT NULL""",
    // Tokenizer-exact BPE aggregates: FULL hash oracle via the
    // committed per-text count table (round-17 verdict #4 — the
    // emb_pca model-as-data pattern; tools/gen_bpe_counts.py).
    "doc_tokens_bpe" -> docTokensBpeOracleSql,
    // Greedy packing under the BPE budget: the packing recurrence
    // replayed over the same committed counts.
    "doc_pack_bpe" -> docPackBpeOracleSql,
    // Greedy packing under the model-token budget: the doc_pack
    // recursive CTE with n_tokens swapped for the token-scheme twin.
    "doc_pack_tokens" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, source,
             CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]'),
               r -> CASE WHEN regexp_matches(r, '^[A-Za-z]')
                   THEN CAST(ceil(len(r) / 6.0) AS BIGINT)
                 WHEN regexp_matches(r, '^[0-9]')
                   THEN CAST(ceil(len(r) / 3.0) AS BIGINT)
                 ELSE CAST(1 AS BIGINT) END)), 0) AS BIGINT)
               AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn
           FROM documents WHERE text IS NOT NULL),
         p AS (
           SELECT source, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN p.fill + d.n_tokens > 512 THEN p.bin + 1
                  ELSE p.bin END AS bin,
             CASE WHEN p.fill + d.n_tokens > 512 THEN d.n_tokens
                  ELSE p.fill + d.n_tokens END AS fill
           FROM p JOIN d ON d.source IS NOT DISTINCT FROM p.source AND d.rn = p.rn + 1)
         SELECT source, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM p GROUP BY 1, 2 ORDER BY source, bin""",
    // Okapi BM25: the same expression tree in the same operand order —
    // integer statistics, then one fixed-shape double formula per doc,
    // summed left-associatively in query-term order; constants written
    // as the same foldable arithmetic so both engines derive identical
    // doubles before the Det rounding.
    "doc_bm25" ->
      (Bm25ScoredCtes + """
         SELECT doc_id, dl, score FROM sc WHERE score > 0.0
         ORDER BY score DESC, doc_id LIMIT 50"""),

    // Batch BM25: same per-term IEEE tree as doc_bm25's, but each
    // contribution is floored to integer micros BEFORE the per-(query,
    // doc) sum, which is therefore exact integer arithmetic on both
    // engines regardless of summation order.
    "doc_bm25_batch" ->
      """WITH q(query_id, term) AS (VALUES
             (CAST(1 AS BIGINT), 'spark'), (CAST(1 AS BIGINT), 'join'),
             (CAST(2 AS BIGINT), 'merge'), (CAST(2 AS BIGINT), 'window'),
             (CAST(2 AS BIGINT), 'sort'), (CAST(3 AS BIGINT), 'scan'),
             (CAST(3 AS BIGINT), 'filter'), (CAST(3 AS BIGINT), 'batch'),
             (CAST(3 AS BIGINT), 'row')),
         d AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(lower(text),
               '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
         base AS (
           SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM d),
         s AS (
           SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl
           FROM base),
         hits AS (
           SELECT b.doc_id, b.dl, t.term, CAST(count(*) AS BIGINT) AS tf
           FROM base b, LATERAL unnest(b.ws) AS t(term)
           WHERE t.term IN (SELECT DISTINCT term FROM q)
           GROUP BY 1, 2, 3),
         dfs AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM hits GROUP BY term),
         contrib AS (
           SELECT qq.query_id, h.doc_id,
             CAST(floor((
               ln(1.0 + (CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                 / (CAST(f.df AS DOUBLE) + 0.5))
                 * (CAST(h.tf AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(h.tf AS DOUBLE) + 1.2 * (0.25
                     + (CAST(h.dl AS DOUBLE) * 0.75)
                       / (CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE))))
               ) * 1000000.0 + 0.5) AS BIGINT) AS c
           FROM hits h
           JOIN dfs f USING (term)
           JOIN q qq USING (term), s),
         sc2 AS (
           SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micros
           FROM contrib GROUP BY 1, 2)
         SELECT query_id, doc_id, score_micros, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micros DESC, doc_id ASC) AS rank
           FROM sc2) t
         WHERE rank <= 20 ORDER BY query_id, rank""",

    // Hybrid RRF: the doc_bm25 oracle CTEs verbatim for the lexical
    // leg, the emb_cosine_topk form (k=50) for the vector leg; leg
    // ranks are positions in each leg's own top-50, contributions
    // summed lexical-then-vector (the gate's operand order), rounded
    // at 1e-6 before the fused rank.
    "doc_hybrid_search" ->
      (HybridFusedCtes + """
         SELECT doc_id, rrf, rank_0, rank_1, rank FROM (
           SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
           FROM f) t
         WHERE rank <= 10 ORDER BY rank"""),

    // MMR diversification of the hybrid fusion's top-30 pool: the
    // greedy walk replayed as a single-row recursive CTE carrying the
    // selected-id/score lists; each step's argmax is the same IEEE tree
    // the Scala walk computes (0.7·rel − (1.0−0.7)·max rounded sim,
    // ties to the lowest id), so step k's appended element IS row k of
    // the gate output. The (1−λ) factor is written as
    // CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE): DuckDB folds a bare
    // (1.0 - 0.7) in DECIMAL to exactly 0.3 — a DIFFERENT double than
    // the walk's 1.0 - 0.7 (= 0.30000000000000004).
    "doc_mmr_diversify" ->
      (HybridFusedCtes.replaceFirst("^WITH ", "WITH RECURSIVE ") + """,
         pool AS (
           SELECT doc_id, rrf FROM (
             SELECT f.doc_id, f.rrf,
               row_number() OVER (ORDER BY f.rrf DESC, f.doc_id) AS rank
             FROM f JOIN embeddings e ON e.vec_id = f.doc_id) t
           WHERE rank <= 30),
         cand AS (
           SELECT p.doc_id AS id, p.rrf AS rel, e.embedding
           FROM pool p JOIN embeddings e ON e.vec_id = p.doc_id),
         pd AS (
           SELECT c.id, d.pos,
             CAST(c.embedding[d.pos + 1] AS DOUBLE) AS v
           FROM cand c
           CROSS JOIN (SELECT unnest(range(64)) AS pos) d),
         nrm AS (
           SELECT id, CAST(sum(CAST(floor(v * v * 1000000.0 + 0.5)
             AS BIGINT)) AS BIGINT) AS nm
           FROM pd GROUP BY id),
         dots AS (
           SELECT a.id AS a, b.id AS b,
             CAST(sum(CAST(floor(a.v * b.v * 1000000.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS dm
           FROM pd a JOIN pd b ON a.pos = b.pos AND a.id <> b.id
           GROUP BY 1, 2),
         sims AS (
           SELECT d.a, d.b,
             floor((CAST(d.dm AS DOUBLE)
                 / sqrt(CAST(na.nm AS DOUBLE) * CAST(nb.nm AS DOUBLE)))
               * 1000000.0 + 0.5) / 1000000.0 AS s
           FROM dots d
           JOIN nrm na ON na.id = d.a
           JOIN nrm nb ON nb.id = d.b),
         steps(k, ids, scores) AS (
           SELECT 1,
             [(SELECT id FROM cand
               ORDER BY 0.7 * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 DESC, id LIMIT 1)],
             [(SELECT 0.7 * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 FROM cand
               ORDER BY 0.7 * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 DESC, id LIMIT 1)]
           UNION ALL
           SELECT k + 1,
             list_append(ids, (
               SELECT c.id FROM cand c
               WHERE NOT list_contains(steps.ids, c.id)
               ORDER BY 0.7 * c.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
                   SELECT max(s.s) FROM sims s
                   WHERE s.a = c.id AND list_contains(steps.ids, s.b))
                 DESC, c.id
               LIMIT 1)),
             list_append(scores, (
               SELECT 0.7 * c.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
                   SELECT max(s.s) FROM sims s
                   WHERE s.a = c.id AND list_contains(steps.ids, s.b))
               FROM cand c
               WHERE NOT list_contains(steps.ids, c.id)
               ORDER BY 0.7 * c.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
                   SELECT max(s.s) FROM sims s
                   WHERE s.a = c.id AND list_contains(steps.ids, s.b))
                 DESC, c.id
               LIMIT 1))
           FROM steps WHERE k < 10)
         SELECT ids[k] AS doc_id,
           floor((scores[k]) * 1000000.0 + 0.5) / 1000000.0 AS mmr,
           k AS rank
         FROM steps ORDER BY rank"""),
    // Duplicated-substring spans: strided 40-char windows, min-doc-id
    // owner per window string, per-doc share of windows owned earlier.
    "doc_substring_dup" ->
      """WITH d AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
             AS norm
           FROM documents WHERE text IS NOT NULL
         ),
         wpos AS (
           SELECT doc_id, substring(norm, CAST(p AS INT), 40) AS win
           FROM d,
             unnest(range(1, greatest(length(norm) - 39, 0) + 1, 20)) AS t(p)
         ),
         own AS (SELECT win, min(doc_id) AS owner FROM wpos GROUP BY win),
         per AS (
           SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN o.owner < w.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup
           FROM wpos w JOIN own o ON w.win = o.win
           GROUP BY w.doc_id
         )
         SELECT doc_id, n_windows, n_dup,
           floor(n_dup / CAST(n_windows AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS dup_frac
         FROM per WHERE n_dup > 0 ORDER BY doc_id""",
    // Gopher-style repetition rules: per-doc duplicate-word fraction,
    // top-2-gram occupancy, duplicate-5-gram fraction; exact-integer
    // micro-sums per (lang, verdict) — see the Spark twin's comment.
    "doc_repetition" ->
      """WITH d AS (
           SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
           FROM documents WHERE text IS NOT NULL
         ),
         base AS (
           SELECT doc_id, lang, string_split(norm, ' ') AS ws,
             CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words
           FROM d WHERE len(string_split(norm, ' ')) >= 5
         ),
         g2 AS (
           SELECT doc_id,
             array_to_string(ws[CAST(i AS INT):CAST(i + 1 AS INT)], ' ')
               AS gram
           FROM base, unnest(range(1, CAST(len(ws) AS BIGINT))) AS t(i)
         ),
         g2c AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
         g2s AS (SELECT doc_id, max(c) AS top2,
                   CAST(sum(c) AS BIGINT) AS n2
                 FROM g2c GROUP BY doc_id),
         g5 AS (
           SELECT doc_id,
             array_to_string(ws[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
               AS gram
           FROM base, unnest(range(1, CAST(len(ws) AS BIGINT) - 3)) AS t(i)
         ),
         g5s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n5,
                   CAST(count(DISTINCT gram) AS BIGINT) AS d5
                 FROM g5 GROUP BY doc_id),
         per AS (
           SELECT b.lang,
             (b.n_words - CAST(len(list_distinct(b.ws)) AS BIGINT))
               / CAST(b.n_words AS DOUBLE) AS dwf,
             g2s.top2 / CAST(g2s.n2 AS DOUBLE) AS t2f,
             (g5s.n5 - g5s.d5) / CAST(g5s.n5 AS DOUBLE) AS d5f
           FROM base b
           JOIN g2s ON b.doc_id = g2s.doc_id
           JOIN g5s ON b.doc_id = g5s.doc_id
         )
         SELECT lang,
           CASE WHEN dwf > 0.6 OR t2f > 0.2 OR d5f > 0.15
                THEN 'reject' ELSE 'keep' END AS verdict,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(dwf * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_dup_word_micros,
           CAST(sum(CAST(floor(t2f * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_top2_micros,
           CAST(sum(CAST(floor(d5f * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_dup5_micros
         FROM per GROUP BY 1, 2 ORDER BY 1, 2""",
    "emb_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           floor((list_cosine_similarity(embedding::DOUBLE[], qvec::DOUBLE[]))
                 * 1000000.0 + 0.5) / 1000000.0 AS sim
         FROM embeddings, q WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id ASC LIMIT 10""",
    "emb_knn" ->
      """WITH pairs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 20)
         SELECT query_id, neighbor_id, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank
           FROM pairs) t
         WHERE rank <= 3 ORDER BY query_id, rank""",
    "emb_centroids" ->
      """WITH exploded AS (
           SELECT label, i.i AS pos, CAST(embedding[i.i + 1] AS DOUBLE) AS v
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(64)) AS i) i),
         centroids AS (
           SELECT label, pos, avg(v) AS m FROM exploded GROUP BY label, pos)
         SELECT label,
           floor((sqrt(sum(m * m))) * 10000.0 + 0.5) / 10000.0
             AS centroid_norm,
           count(*) AS dim
         FROM centroids GROUP BY label ORDER BY label""",
    "doc_dup_clusters" ->
      """SELECT min(doc_id) AS comp, count(*) AS n_dups
         FROM documents GROUP BY md5(text) HAVING count(*) > 1
         ORDER BY comp""",
    // star-edge mode resolves the SAME clusters from a linear edge list
    "doc_dup_clusters_star" ->
      """SELECT min(doc_id) AS comp, count(*) AS n_dups
         FROM documents GROUP BY md5(text) HAVING count(*) > 1
         ORDER BY comp""",
    "doc_stopwords" ->
      """WITH toks AS (
           SELECT source,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> len(t) >= 1) AS toks
           FROM documents)
         SELECT source,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
           CAST(sum(len(list_filter(toks, t -> t IN ('the', 'a', 'an', 'of',
             'and', 'to', 'in', 'is', 'that', 'it', 'for', 'on', 'with',
             'as')))) AS BIGINT) AS n_stopwords
         FROM toks GROUP BY source ORDER BY source""",
    "doc_quantiles" ->
      """SELECT lang, count(*) AS n,
         floor((quantile_cont(n_chars, 0.5)) * 10000.0 + 0.5) / 10000.0
           AS p50,
         floor((quantile_cont(n_chars, 0.9)) * 10000.0 + 0.5) / 10000.0
           AS p90,
         max(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "doc_tfidf" ->
      """WITH terms AS (
           SELECT doc_id, t.term FROM documents,
             LATERAL unnest(string_split_regex(lower(text), '[^a-z]+'))
               AS t(term)
           WHERE len(t.term) >= 3),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         stats AS (SELECT term, count(*) AS df,
                     CAST(sum(tf) AS BIGINT) AS total_tf
                   FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT term, df, total_tf,
           floor((total_tf * ln(CAST(n_docs AS DOUBLE) / df))
                 * 1000000.0 + 0.5) / 1000000.0 AS tfidf
         FROM stats, n
         ORDER BY tfidf DESC, term LIMIT 50""",
    "mm_decode" ->
      """SELECT CAST(doc_id % 10 AS INTEGER) AS src_bucket,
         count(*) AS n,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(sum(octet_length(encode(text)) % 640) AS BIGINT) AS total_width,
         max(CAST(doc_id % 30 AS INTEGER) + 1) AS max_frames
         FROM documents GROUP BY 1 ORDER BY src_bucket""",
    "emb_neardup" ->
      """WITH st AS (SELECT greatest(1, count(*) // 1000) AS step
                     FROM embeddings),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings, st WHERE vec_id % st.step = 0)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
             / 1000000.0 AS sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
             / 1000000.0 >= 0.42
         ORDER BY id_a, id_b""",
    "mm_resize" ->
      """WITH m AS (
           SELECT doc_id,
             octet_length(encode(text)) % 640 AS w,
             octet_length(encode(text)) % 480 AS h
           FROM documents),
         r AS (
           SELECT doc_id, w, h,
             CASE WHEN w <= 0 OR h <= 0 THEN CAST(0 AS DOUBLE)
               ELSE least(CAST(256 AS DOUBLE) / w,
                          CAST(256 AS DOUBLE) / h,
                          CAST(1 AS DOUBLE)) END AS scale
           FROM m)
         SELECT CAST(doc_id % 10 AS INTEGER) AS src_bucket,
           count(*) AS n,
           CAST(sum(CASE WHEN w <= 0 THEN 0
             ELSE greatest(1, CAST(floor(w * scale) AS BIGINT)) END)
             AS BIGINT) AS total_out_w,
           CAST(sum(CASE WHEN h <= 0 THEN 0
             ELSE greatest(1, CAST(floor(h * scale) AS BIGINT)) END)
             AS BIGINT) AS total_out_h
         FROM r GROUP BY 1 ORDER BY src_bucket""",
    "mm_frames" ->
      """WITH m AS (
           SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             CAST(doc_id % 30 AS INTEGER) + 1 AS frames
           FROM documents),
         s AS (
           SELECT doc_id, frames,
             (frames - 1) // 7 + 1 AS sampled,
             n_bytes // frames AS k
           FROM m)
         SELECT CAST(doc_id % 10 AS INTEGER) AS src_bucket,
           CAST(sum(sampled) AS BIGINT) AS n_frames,
           CAST(sum(sampled * k) AS BIGINT) AS total_frame_bytes
         FROM s GROUP BY 1 ORDER BY src_bucket""",
    // Soundness certificates: the anchor column is closed-form over the
    // base table (SF-independent SQL), and the oracle asserts ZERO
    // violations among the emitted pairs — certifying no false positives
    // from the seeded-hash operators without needing their exact output.
    "doc_minhash_sound" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents""",
    "doc_neardup_clusters_star" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents""",
    "doc_simhash_sound" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents""",
    "doc_winnow_sound" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents""",
    "doc_langid_sound" ->
      """SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_violations
         FROM documents""",
    "doc_langid_recall" ->
      """SELECT count(*) AS n_planted, CAST(0 AS BIGINT) AS n_missed
         FROM documents WHERE doc_id < 400""",
    "emb_neardup_lsh_sound" ->
      """SELECT count(*) AS n_vecs, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings""",
    "emb_ann_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    // PCA certificate: the pinned all-rows-zero-violations row.
    "emb_pca_sound" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings""",
    // PCA projection replay: the committed micros rotation inlined as
    // VALUES (generated from the same resource the gate loads), exact
    // bigint arithmetic end to end.
    "emb_pca" -> embPcaOracleSql,
    // SemDeDup certificate: the pinned partition-and-zero-violations row.
    "emb_semdedup_sound" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 200""",
    // SQ8: full replay — float-exact min/max, the identical affine
    // encode tree, per-dim micros terms, integer sums, same tie-break.
    "emb_sq" ->
      """WITH mm AS (
           SELECT i.i AS pos,
             CAST(min(embedding[i.i + 1]) AS DOUBLE) AS mn,
             CAST(max(embedding[i.i + 1]) AS DOUBLE) AS mx
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY 1),
         st AS (SELECT pos, mn, (mx - mn) / 255.0 AS step FROM mm),
         codes AS (
           SELECT e.vec_id, s.pos, s.mn, s.step,
             CASE WHEN s.step = 0 THEN 0
               ELSE least(255, greatest(0, CAST(floor(
                 (CAST(e.embedding[s.pos + 1] AS DOUBLE) - s.mn)
                   / s.step + 0.5) AS BIGINT))) END AS c
           FROM embeddings e CROSS JOIN st s),
         scores AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[c.pos + 1] AS DOUBLE) *
                 (c.mn + c.step * CAST(c.c AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
           FROM embeddings q JOIN codes c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, score_micros, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micros DESC, neighbor_id ASC) AS rank
           FROM scores) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "emb_sq_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    // IVF-flat full replay (round-15 verdict #5): deterministic
    // lowest-id init, TWO unrolled Lloyd iterations with the exact
    // integer-micros assignment scores and micros-sum centroid updates
    // the Scala trainer now pins (order-free on both engines), then
    // cell-probed candidates refined with the emb_knn cosine form.
    "emb_ivf" ->
      """WITH c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                  embedding AS c
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         s1 AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c0 cl),
         a1 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s1) t WHERE rn = 1),
         u1p AS (
           SELECT a1.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a1 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a1.cluster, i.i),
         u1 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u1p GROUP BY cluster),
         c1 AS (
           SELECT c0.cluster, coalesce(u1.c, c0.c) AS c
           FROM c0 LEFT JOIN u1 USING (cluster)),
         s2 AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c1 cl),
         a2 AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM s2) t WHERE rn = 1),
         u2p AS (
           SELECT a2.cluster, i.i AS pos,
             sum(CAST(floor(CAST(e.embedding[i.i+1] AS DOUBLE) * 1000000.0 + 0.5)
                 AS BIGINT)) AS sm,
             count(*) AS n
           FROM a2 JOIN embeddings e USING (vec_id)
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY a2.cluster, i.i),
         u2 AS (
           SELECT cluster,
             list(CAST(CAST(sm AS DOUBLE) / 1000000.0 / n AS REAL) ORDER BY pos) AS c
           FROM u2p GROUP BY cluster),
         c2 AS (
           SELECT c1.cluster, coalesce(u2.c, c1.c) AS c
           FROM c1 LEFT JOIN u2 USING (cluster)),
         sf AS (
           SELECT e.vec_id, cl.cluster,
             CAST(list_sum(list_transform(range(64), j ->
               CAST(floor(CAST(e.embedding[j+1] AS DOUBLE) * CAST(cl.c[j+1] AS DOUBLE)
                    * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sc
           FROM embeddings e CROSS JOIN c2 cl),
         af AS (
           SELECT vec_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn FROM sf) t WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, cluster FROM (
             SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
               ORDER BY sc DESC, cluster ASC) AS rn
             FROM sf WHERE vec_id < 10) t WHERE rn <= 4),
         cand AS (
           SELECT qp.query_id, af.vec_id AS neighbor_id
           FROM qp JOIN af USING (cluster) WHERE qp.query_id <> af.vec_id),
         sims AS (
           SELECT cand.query_id, cand.neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
                     JOIN embeddings c ON c.vec_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sims) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // Filtered search, exact pre-filter path: the emb_knn form with the
    // metadata predicate in the pair generator (plain SQL WHERE — the
    // whole point of the pre-filter path is that it IS the brute oracle).
    "emb_filtered_topk" ->
      """WITH pairs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10 AND c.label = 3)
         SELECT query_id, neighbor_id, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank
           FROM pairs) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // Filtered search, IVF post-filter path: the shared Lloyd-replay
    // chain routes probes exactly as emb_ivf; the candidate set is then
    // the label survivors inside probed cells.
    "emb_ivf_filtered" -> (IvfLloydCtes16 +
      """,
         cand AS (
           SELECT qp.query_id, af.vec_id AS neighbor_id
           FROM qp JOIN af USING (cluster)
           JOIN embeddings lb ON lb.vec_id = af.vec_id
           WHERE qp.query_id <> af.vec_id AND lb.label = 3),
         sims AS (
           SELECT cand.query_id, cand.neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
                     JOIN embeddings c ON c.vec_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sims) t
         WHERE rank <= 5 ORDER BY query_id, rank"""),
    // Filtered-ANN recall: both legs (IVF post-filter, exact
    // pre-filter) replayed in full, per-query overlap counted — the
    // emb_sq_rerank_recall discipline.
    "emb_filtered_recall" -> (IvfLloydCtes16 +
      """,
         cand AS (
           SELECT qp.query_id, af.vec_id AS neighbor_id
           FROM qp JOIN af USING (cluster)
           JOIN embeddings lb ON lb.vec_id = af.vec_id
           WHERE qp.query_id <> af.vec_id AND lb.label = 3),
         isims AS (
           SELECT cand.query_id, cand.neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
                     JOIN embeddings c ON c.vec_id = cand.neighbor_id),
         ivf AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS rank FROM isims) t
           WHERE rank <= 5),
         epairs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor((list_cosine_similarity(c.embedding::DOUBLE[],
                                           q.embedding::DOUBLE[]))
                   * 1000000.0 + 0.5) / 1000000.0 AS sim
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10 AND c.label = 3),
         exact AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS rank FROM epairs) t
           WHERE rank <= 5),
         hits AS (
           SELECT i.query_id, count(*) AS n_hits_ivf
           FROM ivf i JOIN exact e ON i.query_id = e.query_id
             AND i.neighbor_id = e.neighbor_id
           GROUP BY 1),
         nex AS (
           SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1)
         SELECT q.vec_id AS query_id,
           coalesce(hits.n_hits_ivf, CAST(0 AS BIGINT)) AS n_hits_ivf,
           coalesce(nex.n_exact, CAST(0 AS BIGINT)) AS n_exact
         FROM embeddings q
         LEFT JOIN hits ON hits.query_id = q.vec_id
         LEFT JOIN nex ON nex.query_id = q.vec_id
         WHERE q.vec_id < 10 ORDER BY query_id"""),
    // Model persist/load: the Spark side emits a constant table IFF
    // the parquet round-trip of every fitted artifact is bit-exact —
    // so the oracle is that constant table, and any mismatch (or a
    // shape change: -1 sentinel) diverges the hash.
    "emb_model_reuse" ->
      """SELECT * FROM (VALUES
           ('ivf', CAST(16 AS BIGINT), CAST(0 AS BIGINT)),
           ('pq',  CAST(128 AS BIGINT), CAST(0 AS BIGINT)),
           ('sq',  CAST(64 AS BIGINT), CAST(0 AS BIGINT)))
         AS t(model, n_entries, n_mismatch) ORDER BY model""",
    // Closed form: 8 centroids; the served model is bit-identical to
    // the pre-append artifact (0 mismatches); the retrain control
    // genuinely differs (1).
    "emb_model_lifecycle" ->
      """SELECT CAST(8 AS BIGINT) AS n_centroids,
                CAST(0 AS BIGINT) AS n_reuse_mismatch,
                CAST(1 AS BIGINT) AS retrain_differs""",
    // SQ8 + exact re-rank: full two-stage replay — the emb_sq CTEs
    // nominate the top-30 candidates, then ONLY those pairs re-score
    // with the exact per-dim-micros tree and re-rank to top-10.
    "emb_sq_rerank" ->
      """WITH mm AS (
           SELECT i.i AS pos,
             CAST(min(embedding[i.i + 1]) AS DOUBLE) AS mn,
             CAST(max(embedding[i.i + 1]) AS DOUBLE) AS mx
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY 1),
         st AS (SELECT pos, mn, (mx - mn) / 255.0 AS step FROM mm),
         codes AS (
           SELECT e.vec_id, s.pos, s.mn, s.step,
             CASE WHEN s.step = 0 THEN 0
               ELSE least(255, greatest(0, CAST(floor(
                 (CAST(e.embedding[s.pos + 1] AS DOUBLE) - s.mn)
                   / s.step + 0.5) AS BIGINT))) END AS c
           FROM embeddings e CROSS JOIN st s),
         sqs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[c.pos + 1] AS DOUBLE) *
                 (c.mn + c.step * CAST(c.c AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sm
           FROM embeddings q JOIN codes c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10
           GROUP BY 1, 2),
         cand AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY sm DESC, neighbor_id ASC) AS rk FROM sqs) t
           WHERE rk <= 30),
         ex AS (
           SELECT cd.query_id, cd.neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[i.i + 1] AS DOUBLE) *
                 CAST(nb.embedding[i.i + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
           FROM cand cd
           JOIN embeddings q ON q.vec_id = cd.query_id
           JOIN embeddings nb ON nb.vec_id = cd.neighbor_id
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, score_micros, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micros DESC, neighbor_id ASC) AS rank
           FROM ex) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // Re-rank recall: overlap of the two-stage top-10 (and of the
    // UN-reranked SQ top-10) with the exact per-dim-micros top-10.
    "emb_sq_rerank_recall" ->
      """WITH mm AS (
           SELECT i.i AS pos,
             CAST(min(embedding[i.i + 1]) AS DOUBLE) AS mn,
             CAST(max(embedding[i.i + 1]) AS DOUBLE) AS mx
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           GROUP BY 1),
         st AS (SELECT pos, mn, (mx - mn) / 255.0 AS step FROM mm),
         codes AS (
           SELECT e.vec_id, s.pos, s.mn, s.step,
             CASE WHEN s.step = 0 THEN 0
               ELSE least(255, greatest(0, CAST(floor(
                 (CAST(e.embedding[s.pos + 1] AS DOUBLE) - s.mn)
                   / s.step + 0.5) AS BIGINT))) END AS c
           FROM embeddings e CROSS JOIN st s),
         sqs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[c.pos + 1] AS DOUBLE) *
                 (c.mn + c.step * CAST(c.c AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sm
           FROM embeddings q JOIN codes c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10
           GROUP BY 1, 2),
         sqr AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sm DESC, neighbor_id ASC) AS rk
           FROM sqs),
         exall AS (
           SELECT q.vec_id AS query_id, nb.vec_id AS neighbor_id,
             CAST(sum(CAST(floor(
               CAST(q.embedding[i.i + 1] AS DOUBLE) *
                 CAST(nb.embedding[i.i + 1] AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
           FROM embeddings q JOIN embeddings nb ON q.vec_id <> nb.vec_id
           CROSS JOIN (SELECT unnest(range(64)) AS i) i
           WHERE q.vec_id < 10
           GROUP BY 1, 2),
         exk AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id
               ORDER BY score_micros DESC, neighbor_id ASC) AS rk
             FROM exall) t
           WHERE rk <= 10),
         rrk AS (
           SELECT query_id, neighbor_id FROM (
             SELECT e.query_id, e.neighbor_id, row_number() OVER (
               PARTITION BY e.query_id
               ORDER BY e.score_micros DESC, e.neighbor_id ASC) AS rk
             FROM (SELECT c2.query_id, c2.neighbor_id, ea.score_micros
                   FROM (SELECT query_id, neighbor_id FROM sqr
                         WHERE rk <= 30) c2
                   JOIN exall ea ON ea.query_id = c2.query_id
                     AND ea.neighbor_id = c2.neighbor_id) e) t
           WHERE rk <= 10)
         SELECT q.vec_id AS query_id,
           CAST(coalesce(r.n, 0) AS BIGINT) AS n_hits_rerank,
           CAST(coalesce(s2.n, 0) AS BIGINT) AS n_hits_sq
         FROM embeddings q
         LEFT JOIN (SELECT rrk.query_id, count(*) AS n FROM rrk
           JOIN exk USING (query_id, neighbor_id) GROUP BY 1) r
           ON r.query_id = q.vec_id
         LEFT JOIN (SELECT sqr.query_id, count(*) AS n FROM sqr
           JOIN exk USING (query_id, neighbor_id) WHERE sqr.rk <= 10
           GROUP BY 1) s2
           ON s2.query_id = q.vec_id
         WHERE q.vec_id < 10 ORDER BY query_id""",
    "emb_ivfsq_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    "emb_pq_rerank_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    "emb_pq_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    "emb_ivfpq_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""",
    "emb_ivf_sound" ->
      """SELECT count(*) AS n_queries, CAST(0 AS BIGINT) AS n_violations
         FROM embeddings WHERE vec_id < 10""")
}
