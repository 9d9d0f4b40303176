package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Corpus deduplication operators (north-star pipeline surface).
  *
  * Scale design: every variant is blocking + equi-join shaped — candidate
  * pairs come from hash-bucket equi-joins (shuffle-partitionable, AQE
  * skew-splittable), never from a cross join. The exact refine runs only
  * on candidates. At 100 TB: signatures are one narrow column, band
  * buckets distribute uniformly by construction (hashes), and the
  * candidate pair count is bounded by band collisions, not n².
  */
object Dedup {

  /** Exact-duplicate contraction policy for the near-dup operators.
    *
    * Contraction (see [[contractExact]]) pays ~4 extra shuffles and only
    * wins on duplicate-heavy corpora, so it must not run unconditionally
    * (round-6 verdict: unconditional contraction regressed the whole
    * near-dup family +16–148% on the duplicate-LIGHT sf0.1 corpus).
    * [[Contract.Auto]] probes the exact-duplicate ratio with one cheap
    * aggregate and contracts only when the corpus is duplicate-heavy. */
  sealed trait Contract
  object Contract {
    /** Never contract (the raw LSH path). */
    case object Off extends Contract
    /** Always contract — callers asserting a duplicate-heavy corpus. */
    case object On extends Contract
    /** Probe `approx_count_distinct(key)/count(*)` (one lightweight agg
      * job at plan-build time) and contract only when the distinct ratio
      * is at most `maxDistinctRatio` — i.e. ≥ ~5% of rows are exact
      * clones, where clique-quadratic candidate cost starts to dominate
      * (measured: BENCH_NOTES.md round 7). */
    final case class Auto(maxDistinctRatio: Double = 0.95) extends Contract
  }

  /** Distinct-content ratio in [0, 1]: `approx_count_distinct(key) /
    * count(*)` (±~2% rsd — plenty for a 0.95 cutoff). One narrow agg with
    * map-side partials; runs as an eager job when the policy is
    * [[Contract.Auto]], which is documented at every call site.
    * Callers pass the RAW content column, not a digest of it —
    * approx_count_distinct hashes internally (xxhash sketch), so
    * wrapping the column in md5/cast only adds per-row cost without
    * changing the distinct count.
    *
    * The ratio is a table-level statistic, so it is memoized per
    * canonicalized input plan (semanticHash of the analyzed plan + the
    * key expression) — repeated near-dup calls over the same snapshot
    * (a serving session, or the dedup + certificate gate pair) pay the
    * probe job once. The cache holds two machine words per distinct
    * (plan, key) and is size-capped; data caches are elsewhere
    * ([[Caches]]) and evicted independently. A new Iceberg snapshot
    * resolves to a new scan plan, so staleness follows snapshot
    * pinning, not wall-clock. */
  // BOXED value type: with a primitive Double the absent-key null unboxes
  // to 0.0 and a `!= null` guard on a primitive is vacuously true — the
  // probe would silently return ratio 0.0 for every miss and force
  // contraction on every corpus (caught by the memoization spec).
  private val ratioCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  /** Test hook: the memoization is useless if semantically-equal plans
    * hash differently across `spark.read` calls — asserted in spec. */
  private[graft] def ratioCacheSize: Int = ratioCache.size()

  /** Drop all memoized duplicate-ratio statistics. Needed ONLY when data
    * at a previously probed PATH is overwritten in place: the cache key
    * canonicalizes to root paths, so a same-path overwrite would reuse
    * the old ratio (and could mis-pick the contraction path). Snapshot
    * or partition-append workflows never need this — a new snapshot pin
    * resolves to a new scan plan and misses the cache naturally. The
    * serving layer's write paths (TableResolver commit / dropNamespace)
    * call this defensively: one wasted probe job per write beats a
    * silently stale statistic. */
  def invalidateStats(): Unit = {
    ratioCache.clear()
    val it = pairListMemo.values().iterator()
    while (it.hasNext) it.next().unpersist(false)
    pairListMemo.clear()
  }

  // Cross-query shared pair lists (round-16 verdict #1): the winnow
  // pairs gate and its _sound certificate consume the SAME pair list
  // over the same corpus but run as separate queries with a
  // Caches.release() between them, so a Caches-tracked persist cannot
  // carry the sharing — it lives in a plan-keyed memo of PERSISTED,
  // MATERIALIZED pair lists instead (the [[Models.memo]] pattern with a
  // DataFrame value). Entries are the operator's own narrow OUTPUT
  // rows; the memo is bounded (entries hold storage — evict wholesale
  // at the cap) and invalidated alongside the ratio cache, sharing its
  // staleness contract: only a same-path in-place overwrite can go
  // stale, and the serving layer's write paths call
  // [[invalidateStats]].
  private val pairListMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private[graft] def pairListMemoSize: Int = pairListMemo.size()

  /** Memoize-and-share a pair-list plan: persisted + materialized on
    * first call, the SAME persisted DataFrame on every later call with
    * a semantically-equal input plan and params. */
  private def pairListShared(df: DataFrame, extra: String)(
      build: => DataFrame): DataFrame = {
    val key = Models.planKey(df, extra)
    val hit = pairListMemo.get(key)
    if (hit != null) return hit
    val pairs = build
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize before the builder's internal caches release
    if (pairListMemo.size >= 8) {
      val it = pairListMemo.values().iterator()
      while (it.hasNext) it.next().unpersist(false)
      pairListMemo.clear()
    }
    val prev = pairListMemo.putIfAbsent(key, pairs)
    if (prev != null) { pairs.unpersist(false); prev } else pairs
  }
  /** SHA-256 over (canonicalized plan string, leaf data-source paths,
    * 32-bit semanticHash, key expression) — round-7 verdict #5 / advice:
    * the bare `semanticHash` collides at birthday scale ~2^16 distinct
    * plans and silently reuses another table's ratio. The plan STRING
    * alone is not enough either: `LogicalRelation.simpleString` prints
    * only schema + format ("Relation [doc_id,text] parquet"), never the
    * path, so two same-schema tables would deterministically collide —
    * hence the leaf `HadoopFsRelation` root paths are folded in
    * explicitly (and semanticHash, which hashes the relation OBJECTS,
    * as a belt for non-file sources). Computed once per PROBE — i.e.
    * only when a near-dup operator builds its plan — so the plan render
    * is off the per-row path. */
  private def ratioCacheKey(df: DataFrame, key: Column): String = {
    val plan = df.queryExecution.analyzed
    val leafPaths = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }.mkString(";")
    val material = Seq(plan.canonicalized.toString, leafPaths,
      plan.semanticHash().toString, key.toString).mkString("\n--\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(material.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.util.Base64.getEncoder.encodeToString(digest)
  }
  private[graft] def distinctRatio(df: DataFrame, key: Column): Double = {
    val cacheKey = ratioCacheKey(df, key)
    val cached = ratioCache.get(cacheKey)
    if (cached != null) return cached.doubleValue()
    val r = df.agg(count(lit(1)).as("n"),
      approx_count_distinct(key).as("d")).head()
    val n = r.getLong(0)
    val ratio = if (n == 0L) 1.0 else r.getLong(1).toDouble / n
    if (ratioCache.size >= 4096) ratioCache.clear() // bounded, tiny entries
    ratioCache.put(cacheKey, java.lang.Double.valueOf(ratio))
    ratio
  }

  private def shouldContract(df: DataFrame, key: Column,
      contract: Contract): Boolean = contract match {
    case Contract.Off => false
    case Contract.On => true
    case Contract.Auto(maxRatio) => distinctRatio(df, key) <= maxRatio
  }

  /** Exact-duplicate contraction state: `members` maps every input id to
    * its clique representative (`__mid`, `__rep`; rep = min id among rows
    * with identical content key); `reps` is the input restricted to
    * representative rows. */
  private[pipeline] final case class Contraction(members: DataFrame,
      reps: DataFrame)

  /** Contract exact duplicates before near-dup candidate generation.
    *
    * On duplicate-heavy corpora LSH candidate generation is quadratic
    * INSIDE an exact-duplicate clique: n clones share every band bucket,
    * so a clique of n contributes n²/2 candidate pairs, each paying the
    * exact similarity refine (measured on 10×/40×-cloned sf0.1 corpora
    * via `graft.DupBench`: BENCH_NOTES.md round 7 — at 40× contraction
    * is 2.3× on minhash, 31.6× on simhash, and turns a ran-out-of-disk
    * DNF into 11.5 s on cosine near-dup; it is parity-to-overhead on
    * distinct-heavy corpora, hence the [[Contract.Auto]] gate). Collapsing
    * cliques to one representative first makes candidate generation
    * proportional to DISTINCT content; member-level pairs are recovered
    * by a join-only expansion whose values are exact by construction
    * (identical content ⇒ identical similarity). Output is provably the
    * same pair set: clones share signatures, so the uncontracted operator
    * emits a pair for every member pair of an emitted rep pair anyway.
    *
    * `key` must be a deterministic content key (md5 of text, or the raw
    * vector) with equal-content ⇒ equal-key; null keys fall back to the
    * row id so null-content rows stay singletons. */
  private[pipeline] def contractExact(df: DataFrame, idCol: String,
      key: Column): Contraction = {
    val keyed = df.withColumn("__ckey",
      coalesce(key.cast("string"), concat(lit("\u0000id:"), col(idCol))))
    // (key, rep): map-side partial agg means only (key, min-id) shuffles
    val repIds = keyed.groupBy(col("__ckey")).agg(min(col(idCol)).as("__rep"))
    val members = Caches.persistTracked( // narrow (two longs); read by
      keyed.select(col(idCol).as("__mid"), col("__ckey")) // reps + both
        .join(repIds, Seq("__ckey")) // expansion legs; evicted by
        .select(col("__mid"), col("__rep"))) // Caches.release()
    val reps = df.join(
      members.where(col("__mid") === col("__rep"))
        .select(col("__mid").as("__repid")),
      col(idCol) === col("__repid")).drop("__repid")
    Contraction(members, reps)
  }

  /** Expand representative-level pairs back to member level: `repPairs`
    * (id_a, id_b, value) joins the member map on both sides (each
    * unordered member pair appears exactly once — cliques are disjoint —
    * so no dedup shuffle); `selfVals` (__rep, value) contributes
    * within-clique pairs for cliques of size > 1. Join-only: the
    * similarity value is never recomputed per member pair. */
  private[pipeline] def expandPairs(repPairs: DataFrame, selfVals: DataFrame,
      members: DataFrame, valueCol: String): DataFrame = {
    val cross = repPairs
      .join(members.select(col("__rep").as("id_a"), col("__mid").as("__ia")),
        Seq("id_a"))
      .join(members.select(col("__rep").as("id_b"), col("__mid").as("__ib")),
        Seq("id_b"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col(valueCol))
    val self = selfVals
      .join(members.select(col("__rep"), col("__mid").as("__ia")), Seq("__rep"))
      .join(members.select(col("__rep").as("__rep2"), col("__mid").as("__ib")),
        col("__rep") === col("__rep2") && col("__ia") < col("__ib"))
      .select(col("__ia").as("id_a"), col("__ib").as("id_b"), col(valueCol))
    cross.union(self)
  }

  /** Per-clique (rep, n) for cliques of size > 1 — the self-pair sources. */
  private[pipeline] def cliques(members: DataFrame): DataFrame =
    members.groupBy(col("__rep")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__rep"))

  /** Star-edge output (round-8 verdict #1): rep-level near-dup pairs plus
    * one member→rep edge per clone — LINEAR in corpus size, where the
    * expanded member-pair contract is quadratic in clone multiplicity
    * (a clique of n exact clones expands to C(n,2) pairs: 4,950 per
    * 100-clique, 5×10⁷ per 10⁴-clique — measured: simhash 36.6 s at
    * 100× clones, the sf10 pair gate sorting ~25 M expanded pairs,
    * BENCH_NOTES round 8). When the consumer is cluster resolution (the
    * common dedup endpoint: connected components → keep one per
    * component), the expansion carries zero extra information.
    *
    * Connected components over the star output are PROVABLY identical to
    * components over the expanded pair list:
    *  - within a clique, the expanded path emits the complete graph on
    *    members exactly when the clique's self-similarity passes the
    *    family's filter — the same `selfVals` row that gates the star
    *    edges here, so the star (same vertex set, same condition)
    *    preserves connectivity and membership;
    *  - a cross-clique rep pair expands to the complete bipartite graph
    *    between the two cliques' member sets; the rep pair plus both
    *    cliques' stars connect exactly that vertex set;
    *  - a clique failing its self filter (e.g. winnow's fingerprint
    *    floor) can appear in no cross pair either — a shared-fingerprint
    *    count is bounded by either side's own count — so its members are
    *    isolated on both paths. (Asserted family-by-family on a
    *    clone-heavy corpus in PipelineSpec.)
    *
    * Component LABELS also agree: reps are clique minima, so the minimum
    * id of every component is present on both paths.
    *
    * `selfVals` carries one row per eligible clique rep (the invariant
    * [[expandPairs]] already relies on); similarity values are not
    * carried — star edges link exact clones (similarity is the family's
    * self value by construction) and rep pairs' values are recoverable
    * from the pairs output when needed. */
  private[pipeline] def starEdges(repPairs: DataFrame, selfVals: DataFrame,
      members: DataFrame): DataFrame =
    repPairs.select(col("id_a"), col("id_b")).union(
      members.join(selfVals.select(col("__rep")), Seq("__rep"))
        .filter(col("__mid") =!= col("__rep"))
        .select(col("__rep").as("id_a"), col("__mid").as("id_b")))

  /** Exact-duplicate star edges: one (rep = min id, member) edge per
    * clone — the linear-output form of the exact-dup pair list (whose
    * complete same-key cliques are quadratic in clone multiplicity).
    * Connected components over these edges are exactly the same-key
    * groups of size > 1, so the closed-form oracle is GROUP BY key
    * HAVING count(*) > 1. Map-side partial agg: only (key, min-id)
    * shuffles for the rep resolution, plus one narrow re-join. */
  def exactDupEdges(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val keyed = df.select(col(idCol).as("__mid"),
      coalesce(key.cast("string"), concat(lit("\u0000id:"), col(idCol)))
        .as("__ckey"))
    val reps = keyed.groupBy(col("__ckey")).agg(min(col("__mid")).as("__rep"))
    keyed.join(reps, Seq("__ckey"))
      .filter(col("__mid") =!= col("__rep"))
      .select(col("__rep").as("id_a"), col("__mid").as("id_b"))
  }

  /** Exact duplicate groups by content hash of the raw text. */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .filter(col("n") > 1)

  /** Representative selection — the "keep best" step that turns a
    * dedup grouping into a shippable corpus: per duplicate group, the
    * row maximizing `quality` (ties to the SMALLEST `id`), plus the
    * member count. ONE map-side-partial aggregate — `max_by` over a
    * (quality, -id) struct ordering — so only (group, best, count)
    * partials shuffle, never member rows: at 100 TB a clone-heavy
    * group of any multiplicity costs its partition-local partials and
    * one combined row. (A rank-window form would sort whole member
    * rows; the aggregate form is why this is its own operator and not
    * a [[graft.pipeline.Sample.capPerStratum]] call with n = 1.) */
  def keepBest(df: DataFrame, groupKey: Column, quality: Column,
      id: Column): DataFrame =
    // NULL group keys fall back to a per-row unique key (the
    // exactDupEdges convention): groupBy would otherwise collapse ALL
    // null-keyed rows (e.g. md5(NULL) for null texts) into one bogus
    // "duplicate group" and silently drop every member but one. The
    // NUL ("\\u0000") prefix cannot collide with a real stringified key.
    df.groupBy(coalesce(groupKey.cast("string"),
        concat(lit("\u0000id:"), id)).as("group_key"))
      .agg(max_by(id, struct(quality, -id)).as("keep_id"),
        count(lit(1)).as("n_members"))

  /** Normalized-exact duplicates (whitespace/case-insensitive) via the
    * fingerprint64 expression. */
  def fingerprintDups(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", fingerprint64(col(textCol)))
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle→minhash→band→bucket-join: signature of `numHashes` minima is
    * sliced into `bands`; docs sharing any (band index, band hash) bucket
    * become candidates; candidates are refined with exact shingle Jaccard.
    * With b bands of r rows the candidate threshold is ~(1/b)^(1/r).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    *
    * `contract` (default [[Contract.Auto]]: probe the duplicate ratio,
    * contract only duplicate-heavy corpora — Auto runs one eager probe
    * job at plan-build time) collapses exact-duplicate cliques (same raw
    * text, keyed by md5) to one representative before banding and
    * recovers member-level pairs by the join-only [[expandPairs]]
    * expansion — the pair SET is identical (clones share signatures and
    * Jaccard values), but candidate generation is proportional to
    * distinct content instead of O(clique²) on duplicate-heavy corpora.
    * Clique self-pairs are scored with the SAME `jaccard_shingle`
    * expression the refine uses, so degenerate texts (shorter than the
    * shingle, where the empty-set Jaccard convention decides membership)
    * behave identically on both paths; null-text rows key to a
    * per-row sentinel and stay singletons, matching the raw path where a
    * null signature never lands in a bucket. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.6,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return minhashPairsRaw(df, idCol, textCol, numHashes, bands, shingle,
        threshold)
    val (repPairs, selfVals, members) =
      minhashContracted(df, idCol, textCol, numHashes, bands, shingle,
        threshold)
    expandPairs(repPairs, selfVals, members, "jaccard")
  }

  /** [[minhashPairs]] in star-edge output mode — (id_a, id_b) edges,
    * linear in clone multiplicity, component-equivalent to the expanded
    * pair list (see [[starEdges]]). The duplicate-light path returns the
    * raw pair list's edges (already linear: no cliques to expand). */
  def minhashEdges(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.6,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return minhashPairsRaw(df, idCol, textCol, numHashes, bands, shingle,
        threshold).select(col("id_a"), col("id_b"))
    val (repPairs, selfVals, members) =
      minhashContracted(df, idCol, textCol, numHashes, bands, shingle,
        threshold)
    starEdges(repPairs, selfVals, members)
  }

  /** The star edge list from ONE banding/candidate pass, persisted +
    * materialized for certificate legs to fork over. The expanded-clique
    * pair list is deliberately NOT built (round-16 verdict #2 — it was
    * the top of the sf0.1 wall two rounds running): clique expansion is
    * IMPLIED by contraction — a clique's complete graph and its star
    * connect exactly the same vertex set under the same self-filter (see
    * [[starEdges]]'s equivalence proof) — so a union-find leg consuming
    * rep pairs + membership (= these edges) certifies the same component
    * equality without paying the clone-quadratic expansion.
    * Contracted-vs-raw PAIR equality is certified separately
    * (doc_jaccard_pairs' full hash oracle; PipelineSpec's unit proofs
    * for the seeded minhash family, including star ≡ expanded). */
  def minhashStarEdgesShared(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.6): DataFrame =
    pairListShared(df,
      s"minhash-star|$idCol|$textCol|$numHashes|$bands|$shingle|$threshold") {
      // persist the corpus for the BUILD only (contractExact and the
      // banding pass both scan it); a memo hit never touches it —
      // round-17 verdict #3's suggested memo reuse across the neardup
      // family, the winnowPairsShared lifecycle (survives release,
      // invalidateStats evicts)
      val src = Caches.persistTracked(df)
      src.count()
      val (repPairs, selfVals, members) =
        minhashContracted(src, idCol, textCol, numHashes, bands, shingle,
          threshold)
      starEdges(repPairs, selfVals, members)
    }

  /** Shared contracted-path pieces for both minhash output modes:
    * (rep-level pairs, per-eligible-clique self values, member map). */
  private def minhashContracted(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, bands: Int, shingle: Int,
      threshold: Double): (DataFrame, DataFrame, DataFrame) = {
    val c = contractExact(df, idCol, md5(col(textCol)))
    val repPairs = minhashPairsRaw(c.reps, idCol, textCol, numHashes, bands,
      shingle, threshold)
    // A clique member's Jaccard with its identical clone is IDENTICALLY
    // 1.0 — including the degenerate empty-shingle-set case (the 1.0
    // empty-set convention; same argument as jaccardContracted, which
    // got this fold first). Earlier rounds joined `reps` back just to
    // run jaccard_shingle(text, text) per clique head: a whole join
    // plus a per-rep normalize+shingle pass to compute a constant. The
    // literal filter keeps threshold > 1 semantics and folds to nothing.
    val selfVals = cliques(c.members)
      .withColumn("jaccard", lit(1.0))
      .filter(col("jaccard") >= threshold)
      .select(col("__rep"), col("jaccard"))
    (repPairs, selfVals, c.members)
  }

  private def minhashPairsRaw(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingle: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Narrow (id, sig) projection, persisted: the signature (shingle +
    // numHashes hash passes over full text) is the expensive scan, and
    // three legs below read it (banding + both candidate sig joins) —
    // without the persist each leg would recompute it from source. The
    // cache entry is one long[numHashes] per doc (no text); tracked in
    // [[Caches]], evicted by the caller's Caches.release().
    val sig = Caches.persistTracked(df.select(col(idCol).as("__id"),
      minhash_sig(col(textCol), numHashes, shingle).as("__sig")))

    // band -> (bandIdx, xxhash64 of the band's slice). ONLY (id, band,
    // bucket) rides the band explode + bucket-join shuffle: at corpus
    // scale carrying text here would push ~bands x the corpus through
    // the wire before any pruning (round-1 verdict). Signatures are
    // re-attached by id below for deduped candidates only, and text only
    // after the sig-overlap pre-filter — mirroring simhashPairs'
    // sig-only join shape.
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("__sig"), b * rows + 1, lit(rows)))).as(Seq("__band", "__bandsig")))
      .withColumn("__bucket", xxhash64(col("__band"), concat_ws(",", col("__bandsig"))))
      .select(col("__id"), col("__band"), col("__bucket"))

    val a = banded.select(col("__id").as("id_a"), col("__band"), col("__bucket"))
    val b = banded.select(col("__id").as("id_b"),
      col("__band").as("__band_b"), col("__bucket").as("__bucket_b"))

    val candidates = a.join(b, col("__band") === col("__band_b") &&
        col("__bucket") === col("__bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // estimated-jaccard pre-filter (sig overlap, std ~ sqrt(j(1-j)/k)):
    // kills the bulk of low-similarity band collisions before the exact
    // shingle Jaccard, which is the expensive refine at corpus scale.
    val estMargin = 2.5 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val sigOverlap = org.apache.spark.sql.graftbridge.column(SigOverlap(
      org.apache.spark.sql.graftbridge.expression(col("__sig_a")),
      org.apache.spark.sql.graftbridge.expression(col("__sig_b"))))

    val texts = df.select(col(idCol).as("__id"), col(textCol).as("__text"))

    candidates
      .join(sig.select(col("__id").as("id_a"), col("__sig").as("__sig_a")),
        Seq("id_a"))
      .join(sig.select(col("__id").as("id_b"), col("__sig").as("__sig_b")),
        Seq("id_b"))
      .filter(sigOverlap >= threshold - estMargin)
      .join(texts.select(col("__id").as("id_a"),
        col("__text").as("__text_a")), Seq("id_a"))
      .join(texts.select(col("__id").as("id_b"),
        col("__text").as("__text_b")), Seq("id_b"))
      .withColumn("jaccard",
        jaccard_shingle(col("__text_a"), col("__text_b"), shingle))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit signature, banded into four
    * 16-bit chunks (a pair within Hamming distance 3 must agree on at
    * least one chunk); refine with bit_count(xor) <= maxHamming.
    *
    * `contract` (default [[Contract.Auto]] — one eager probe job, see
    * [[minhashPairs]]) collapses exact-dup cliques first:
    * clones share the 64-bit signature, so within-clique Hamming distance
    * is identically 0 and rep-level pairs carry the member-level
    * distance — the expanded pair set equals the raw one. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return simhashPairsRaw(df, idCol, textCol, maxHamming)
    val (repPairs, selfVals, members) =
      simhashContracted(df, idCol, textCol, maxHamming)
    expandPairs(repPairs, selfVals, members, "hamming")
  }

  /** [[simhashPairs]] in star-edge output mode (see [[starEdges]]). */
  def simhashEdges(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return simhashPairsRaw(df, idCol, textCol, maxHamming)
        .select(col("id_a"), col("id_b"))
    val (repPairs, selfVals, members) =
      simhashContracted(df, idCol, textCol, maxHamming)
    starEdges(repPairs, selfVals, members)
  }

  private def simhashContracted(df: DataFrame, idCol: String,
      textCol: String, maxHamming: Int): (DataFrame, DataFrame, DataFrame) = {
    val c = contractExact(df, idCol, md5(col(textCol)))
    val repPairs = simhashPairsRaw(c.reps, idCol, textCol, maxHamming)
    // xor(sig, sig) = 0 for identical text — always within any cap >= 0
    val selfVals = cliques(c.members).withColumn("hamming", lit(0))
    (repPairs, selfVals, c.members)
  }

  /** Winnowing copy-detection pairs (Schleimer/Wilkerson/Aiken-style
    * fingerprints): explode each document's winnow fingerprints, self-join
    * on fingerprint (inverted-index shape — an equi-join, the scale path
    * for substring-reuse detection), keep pairs sharing >= `minShared`.
    *
    * The `maxDf` stop-fingerprint cap bounds the join: a fingerprint in f
    * docs contributes f²/2 pairs, and frequent (vocabulary-level)
    * fingerprints carry no copy signal. The cap's df is counted over
    * DISTINCT content on BOTH paths (what a stop-fingerprint cap was
    * always meant to measure): counting raw rows instead has a RECALL
    * HOLE — clones inflate every fingerprint's document frequency by the
    * clone factor, pushing genuine copy signal past the cap (at 25+
    * clones of one doc, ALL its fingerprints exceed df=20 and a
    * row-counted cap emits zero pairs). Round 7 fixed this only on the
    * contracted path; a mostly-distinct corpus with ONE localized clone
    * group (ratio above Auto's cutoff, so Auto stays raw) hit the same
    * hole relocated — so the raw path now counts df over distinct
    * content too, and the contraction decision is back to being purely
    * a COST policy, never a semantics change. Contraction additionally
    * recovers clone self-pairs by clique expansion with their exact
    * shared count (clones share every fingerprint), and cross-clique
    * counts are exact by construction (identical content ⇒ identical
    * fingerprint sets). */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 12, window: Int = 16, maxDf: Int = 20,
      minShared: Int = 10,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return winnowPairsRaw(df, idCol, textCol, shingle, window, maxDf,
        minShared)._1
    val (repPairs, selfVals, members) =
      winnowContracted(df, idCol, textCol, shingle, window, maxDf, minShared)
    expandPairs(repPairs, selfVals, members, "shared_fps")
  }

  /** [[winnowPairs]] with the RESULT memoized per (corpus plan, params)
    * — one fingerprint/candidate pass feeds every consumer of the same
    * pair list in a suite or serving session. The pairs gate and the
    * soundness certificate read the same list; recomputing the rolling-
    * min fingerprint pass for each was the round-16 flagged 1.8× drift
    * (verdict #1). Consumers stay independent strictly ABOVE the pair
    * list. */
  def winnowPairsShared(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 12, window: Int = 16, maxDf: Int = 20,
      minShared: Int = 10): DataFrame =
    pairListShared(df,
      s"winnow|$idCol|$textCol|$shingle|$window|$maxDf|$minShared") {
      winnowPairs(df, idCol, textCol, shingle, window, maxDf, minShared)
    }

  /** [[winnowPairs]] in star-edge output mode (see [[starEdges]]; the
    * fingerprint floor gates star cliques exactly as it gates self-pairs,
    * and a clique under the floor can have no cross pair either — shared
    * counts are bounded by either side's own count). */
  def winnowEdges(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 12, window: Int = 16, maxDf: Int = 20,
      minShared: Int = 10,
      contract: Contract = Contract.Auto()): DataFrame = {
    if (!shouldContract(df, col(textCol), contract))
      return winnowPairsRaw(df, idCol, textCol, shingle, window, maxDf,
        minShared)._1.select(col("id_a"), col("id_b"))
    val (repPairs, selfVals, members) =
      winnowContracted(df, idCol, textCol, shingle, window, maxDf, minShared)
    starEdges(repPairs, selfVals, members)
  }

  private def winnowContracted(df: DataFrame, idCol: String, textCol: String,
      shingle: Int, window: Int, maxDf: Int,
      minShared: Int): (DataFrame, DataFrame, DataFrame) = {
    val c = contractExact(df, idCol, md5(col(textCol)))
    val (repPairs, prunedFps) = winnowPairsRaw(c.reps, idCol, textCol,
      shingle, window, maxDf, minShared)
    // identical texts share their ENTIRE fingerprint set, so a clone
    // self-pair's shared count = that rep's fingerprint count — counted
    // over the SAME capped relation the cross-pairs join (a stop
    // fingerprint excluded from cross-pair counts must not inflate
    // self-pair counts either); the minShared floor still applies, so
    // short docs stay excluded
    val repFpCounts = prunedFps
      .groupBy(col("__id").as("__rep"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    val selfVals = cliques(c.members).join(repFpCounts, Seq("__rep"))
    (repPairs, selfVals, c.members)
  }

  /** Returns (pairs, pruned (id, fp) relation after the df cap) — the
    * contracted path derives clone self-pair counts from the same capped
    * relation so cap semantics are uniform across pair kinds. */
  private def winnowPairsRaw(df: DataFrame, idCol: String, textCol: String,
      shingle: Int, window: Int, maxDf: Int,
      minShared: Int): (DataFrame, DataFrame) = {
    // persisted narrow (id, content-key, fp): the df aggregate and BOTH
    // self-join legs read it — unpersisted, each would recompute the
    // winnow-fingerprint pass (a rolling-min over every 12-gram of the
    // corpus text) from source. Tracked in [[Caches]], evicted by the
    // caller's release(). The content key rides along (8 bytes/row) so
    // the cap can count df over DISTINCT content; an xxhash64 collision
    // merges two contents' counts, which only LOWERS a df (keeps a
    // fingerprint the exact count might have capped) — recall-safe, and
    // the cap is a cost heuristic on that side.
    val fps = Caches.persistTracked(df
      .select(col(idCol).as("__id"), xxhash64(col(textCol)).as("__ck"),
        explode(
          winnow_fingerprints(col(textCol), shingle, window)).as("__fp"))
      .distinct())
    // df over distinct content: on the contracted path the input is
    // already one rep per content so this equals the plain row count;
    // on the raw path it is what makes the cap clone-proof.
    // Broadcast the STOP set (df > maxDf) and anti-join — stop
    // fingerprints are FEW by construction (vocabulary-level n-grams),
    // while the rare side is ~the whole fingerprint vocabulary;
    // broadcasting the rare side (rounds 5-7) had the sides backwards
    // for a 100 TB corpus.
    val stop = fps.groupBy(col("__fp"))
      .agg(countDistinct(col("__ck")).as("__df"))
      .filter(col("__df") > maxDf).select(col("__fp"))
    // "few by construction" is a heuristic, not a bound: a boilerplate-
    // heavy corpus (most fingerprints over the df cap) can make the stop
    // set arbitrarily large, and an unconditional broadcast hint would
    // then OOM the driver instead of degrading (round-8 advice). One
    // cheap agg on the already-persisted fps relation checks the
    // premise; past ~500k fingerprints (~4 MB of longs, far under any
    // broadcast limit but a signal the premise broke) fall back to a
    // plain shuffled left_anti join.
    val stopCount = stop.count()
    val stopSide = if (stopCount <= 500000L) broadcast(stop) else stop
    val pruned = fps.select(col("__id"), col("__fp"))
      .join(stopSide, Seq("__fp"), "left_anti")
    val a = pruned.select(col("__id").as("id_a"), col("__fp"))
    val b = pruned.select(col("__id").as("id_b"), col("__fp").as("__fp_b"))
    val pairs = a.join(b,
        col("__fp") === col("__fp_b") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    (pairs, pruned)
  }

  private def simhashPairsRaw(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    // persisted narrow (id, 64-bit sig): both legs of the banding
    // self-join read it — without the persist each leg recomputes
    // simhash64 (a full tokenize+hash pass over the corpus text) from
    // source. Tracked in [[Caches]], evicted by the caller's release().
    val sig = Caches.persistTracked(df.select(col(idCol).as("__id"),
      simhash64(col(textCol)).as("__sim")))
    val banded = sig.select(col("__id"), col("__sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("__sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("__band", "__chunk")))
    val a = banded.select(col("__id").as("id_a"), col("__sim").as("__sim_a"),
      col("__band"), col("__chunk"))
    val b = banded.select(col("__id").as("id_b"), col("__sim").as("__sim_b"),
      col("__band").as("__band_b"), col("__chunk").as("__chunk_b"))
    a.join(b, col("__band") === col("__band_b") &&
        col("__chunk") === col("__chunk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sim_a"), col("__sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("__sim_a").bitwiseXOR(col("__sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Connected-components result: `labels` is (id, comp) for every node
    * that appears in the pair list, comp = min id in the component;
    * `converged` is the structured convergence signal (round-3 verdict:
    * pipelines can't read stderr); `rounds` is the number of
    * large-star/small-star rounds executed. */
  final case class Components(labels: DataFrame, converged: Boolean,
      rounds: Int)

  // ---- exact n-gram Jaccard set-similarity join (prefix-filtered) --------

  /** EXACT character-shingle Jaccard join: every pair with
    * jaccard >= `threshold` — the n-gram-Jaccard dedup family's
    * zero-recall-loss member (minhash approximates exactly this measure)
    * — at equi-join cost via prefix filtering (AllPairs, Bayardo et al.
    * WWW'07; PPJoin prefix scheme, Xiao et al. WWW'08).
    *
    * Candidate generation: shingles are ordered globally rarest-first
    * (document frequency, hash tiebreak) and each document indexes only
    * its first `|A| - ceil(t*|A|) + 1` shingles — two sets with
    * J >= t MUST share a prefix shingle under any consistent global
    * order, so joining prefixes on the shingle (with the size filter
    * `min >= t*max` the threshold also implies) is candidate-complete.
    * Verification merges each side's once-computed sorted shingle-hash
    * array ([[TextFunctions.sorted_intersect_size]]) — the same fnv1a
    * hashes and inter/union arithmetic as the LSH families' refine
    * ([[TextFunctions.jaccard_shingle]]), so the two report identical
    * values without re-hashing texts per candidate pair.
    *
    * At 100 TB every stage is a shuffle equi-join or per-document window:
    * explode is linear, the df count and prefix self-join shuffle on the
    * shingle hash (AQE skew-splits the frequent-shingle buckets), and
    * verification joins shingle arrays back by id. The prune strength is the
    * data's: a single-topic corpus (like the synthetic one, ~20-word
    * vocabulary) keeps even rare shingles frequent and the candidate set
    * dense, while a natural web corpus concentrates prefixes on genuinely
    * rare shingles. Degenerate documents (normalized text shorter than
    * one shingle) score 1.0 with each other under the jaccard empty-set
    * convention — their mutual clique is the correct OUTPUT, so its
    * quadratic size is answer size, not overhead (`contract` collapses
    * exact clones of them like everything else).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b; null texts emit no
    * pairs. `contract` as in [[minhashPairs]]. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, threshold: Double = 0.7,
      contract: Contract = Contract.Auto()): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    if (!shouldContract(df, col(textCol), contract))
      return jaccardPairsRaw(df, idCol, textCol, shingle, threshold)
    val (repPairs, selfVals, members) =
      jaccardContracted(df, idCol, textCol, shingle, threshold)
    expandPairs(repPairs, selfVals, members, "jaccard")
  }

  /** [[jaccardPairs]] in star-edge output mode — (id_a, id_b) edges,
    * linear in clone multiplicity, component-equivalent to the expanded
    * pair list (see [[starEdges]]). */
  def jaccardEdges(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, threshold: Double = 0.7,
      contract: Contract = Contract.Auto()): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    if (!shouldContract(df, col(textCol), contract))
      return jaccardPairsRaw(df, idCol, textCol, shingle, threshold)
        .select(col("id_a"), col("id_b"))
    val (repPairs, selfVals, members) =
      jaccardContracted(df, idCol, textCol, shingle, threshold)
    starEdges(repPairs, selfVals, members)
  }

  /** Both output modes — [[jaccardEdges]]'s star edges AND
    * [[jaccardPairs]]'s expanded pair list — from ONE candidate-
    * generation pass, with the representative-level pair list persisted
    * and MATERIALIZED before return (round-15 verdict #2): the dual-leg
    * CC certificate gates previously re-ran the AllPairs prefix join
    * per leg, and at sf10 that recomputation was 11.2 s of pure
    * harness. The legs stay independent strictly ABOVE the pair list —
    * star edges → distributed large/small-star CC vs expanded pairs →
    * driver union-find — which is exactly what those gates certify;
    * contracted-vs-raw pair equality keeps its own full hash oracle
    * (doc_jaccard_pairs, Contract.Auto vs the expanded DuckDB twin) and
    * unit proof (PipelineSpec). Contraction is forced ON (the
    * production path). The persisted pair list is tracked in [[Caches]]
    * and evicted by the caller's `Caches.release()`. */
  def jaccardBothModes(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, threshold: Double = 0.7)
      : (DataFrame, DataFrame) = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val (repPairs0, selfVals, members) =
      jaccardContracted(df, idCol, textCol, shingle, threshold)
    val repPairs = Caches.persistTracked(repPairs0)
    repPairs.count() // materialize ONCE before concurrent legs fork
    (starEdges(repPairs, selfVals, members),
      expandPairs(repPairs, selfVals, members, "jaccard"))
  }

  /** [[jaccardBothModes]] with BOTH output modes memoized per (corpus
    * plan, params) — the [[pairListShared]] pattern over a pair of
    * lists. The pairs gate and the dual-leg CC certificate consume the
    * IDENTICAL exact AllPairs slice but run as separate queries with a
    * `Caches.release()` between them (round-17 verdict #2: the pairs
    * gate recomputed the candidate join the clusters gate had just
    * built); with the memo whichever runs first builds once and the
    * other reads the persisted lists. Consumers stay independent
    * strictly ABOVE the pair lists. */
  def jaccardBothModesShared(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, threshold: Double = 0.7)
      : (DataFrame, DataFrame) = {
    val extra = s"jaccard|$idCol|$textCol|$shingle|$threshold"
    val keyE = Models.planKey(df, "edges|" + extra)
    val keyP = Models.planKey(df, "pairs|" + extra)
    val hitE = pairListMemo.get(keyE)
    val hitP = pairListMemo.get(keyP)
    if (hitE != null && hitP != null) return (hitE, hitP)
    // persist the corpus slice for the BUILD only (contractExact and the
    // AllPairs raw pass both scan it); a memo hit never touches it
    val src = Caches.persistTracked(df)
    src.count()
    val (edges0, pairs0) =
      jaccardBothModes(src, idCol, textCol, shingle, threshold)
    val edges = edges0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = pairs0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count(); pairs.count() // materialize before caches release
    if (pairListMemo.size >= 7) { // both entries must fit under the cap
      val it = pairListMemo.values().iterator()
      while (it.hasNext) it.next().unpersist(false)
      pairListMemo.clear()
    }
    val prevE = pairListMemo.putIfAbsent(keyE, edges)
    val prevP = pairListMemo.putIfAbsent(keyP, pairs)
    (if (prevE != null) { edges.unpersist(false); prevE } else edges,
      if (prevP != null) { pairs.unpersist(false); prevP } else pairs)
  }

  private def jaccardContracted(df: DataFrame, idCol: String,
      textCol: String, shingle: Int,
      threshold: Double): (DataFrame, DataFrame, DataFrame) = {
    // both public entries re-check, but the literal-1.0 selfVals below
    // are only correct under threshold <= 1.0 — keep the invariant local
    // so a future caller can't silently pass every clique (review note)
    require(threshold <= 1.0, "threshold must be <= 1.0")
    val c = contractExact(df, idCol, md5(col(textCol)))
    val repPairs = jaccardPairsRaw(c.reps, idCol, textCol, shingle, threshold)
    // A document's Jaccard with itself is IDENTICALLY 1.0 — including the
    // degenerate empty-shingle-set case (the 1.0 empty-set convention) —
    // so every clique passes the self filter and the value is a literal.
    // Earlier rounds joined `reps` back just to run
    // jaccard_shingle(text, text) per clique head: a whole join plus a
    // per-rep normalize+hash to compute a constant (threshold ≤ 1 makes
    // the filter vacuous). Null-text rows key by row id in contractExact,
    // so no clique of size > 1 carries a null text.
    val selfVals = cliques(c.members).withColumn("jaccard", lit(1.0))
    (repPairs, selfVals, c.members)
  }

  private def jaccardPairsRaw(df: DataFrame, idCol: String, textCol: String,
      shingle: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persistTracked: the shingle arrays feed five consumers (empties, the
    // explode, and both verify joins) — without the cache each re-runs the
    // linear shingle pass; released at the Caches.release() boundary
    val base = Caches.persistTracked(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__jid"),
        shingle_set(col(textCol), shingle).as("__jsh"))
      .withColumn("__jsz", size(col("__jsh"))))
    val empties = base.filter(col("__jsz") === 0).select(col("__jid"))
    val emptyPairs = empties.select(col("__jid").as("id_a"))
      .crossJoin(empties.select(col("__jid").as("id_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", lit(1.0))
    val sh = base.filter(col("__jsz") > 0)
      .select(col("__jid"), col("__jsz"), explode(col("__jsh")).as("__jg"))
    val dfreq = sh.groupBy(col("__jg")).agg(count(lit(1)).as("__jdf"))
    val w = Window.partitionBy(col("__jid")).orderBy(col("__jdf"), col("__jg"))
    // Prefix length |A| - ceil(t*|A|) + 1; the epsilon keeps ceil from
    // overshooting when t*|A| lands on an exact integer one double-ulp
    // high (an overshot ceil SHORTENS the prefix and drops true pairs —
    // undershooting merely lengthens it).
    val prefix = sh.join(dfreq, Seq("__jg"))
      .withColumn("__jrn", row_number().over(w))
      .filter(col("__jrn") <=
        col("__jsz") - ceil(col("__jsz") * threshold - lit(1e-9)) + 1)
      .select(col("__jg"), col("__jid"), col("__jsz"), col("__jrn"))
    // Candidate dedup doubles as the PPJoin positional filter: among a
    // pair's shared prefix shingles, the FIRST in global order has
    // simultaneously the min rank on both sides (both sides rank by the
    // same order), and everything the pair can still share after it is
    // bounded by the shorter remaining tail — so the intersection is at
    // most 1 + min(|A|-rA, |B|-rB), which must reach the overlap the
    // threshold demands, ceil(t/(1+t) * (|A|+|B|)). Same shuffle as the
    // plain distinct, strictly fewer rows into the verify joins.
    val alpha = threshold / (1.0 + threshold)
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__jg") === col("b.__jg") && col("a.__jid") < col("b.__jid") &&
          least(col("a.__jsz"), col("b.__jsz")).cast("double") >=
            greatest(col("a.__jsz"), col("b.__jsz")) * threshold - lit(1e-9))
      .groupBy(col("a.__jid").as("id_a"), col("b.__jid").as("id_b"))
      .agg(min(col("a.__jrn")).as("__jra"), min(col("b.__jrn")).as("__jrb"),
        min(col("a.__jsz")).as("__jsza"), min(col("b.__jsz")).as("__jszb"))
      .filter(lit(1) +
        least(col("__jsza") - col("__jra"), col("__jszb") - col("__jrb")) >=
        ceil((col("__jsza") + col("__jszb")) * alpha - lit(1e-9)))
      .select(col("id_a"), col("id_b"))
    // Verify from the PRE-COMPUTED sorted shingle arrays (one per doc, not
    // per pair): a two-pointer merge per candidate instead of re-normalizing
    // and re-hashing both texts — the same inter/union arithmetic as
    // jaccard_shingle over the same fnv1a hashes, so values agree exactly.
    val sets = base.select(col("__jid"), col("__jsh"), col("__jsz"))
    cands
      .join(sets.select(col("__jid").as("id_a"), col("__jsh").as("__jsha"),
        col("__jsz").as("__jsza")), Seq("id_a"))
      .join(sets.select(col("__jid").as("id_b"), col("__jsh").as("__jshb"),
        col("__jsz").as("__jszb")), Seq("id_b"))
      .withColumn("__jint",
        sorted_intersect_size(col("__jsha"), col("__jshb")))
      .withColumn("jaccard", col("__jint").cast("double") /
        (col("__jsza") + col("__jszb") - col("__jint")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .unionByName(emptyPairs)
  }

  /** Connected components over an undirected duplicate-pair edge list —
    * the cluster-resolution step every dedup pipeline needs after pair
    * generation (keep one representative per component, drop the rest).
    *
    * Large-star/small-star contraction (the alternating algorithm of
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): each round rewires edges toward the local minimum —
    * large-star hangs every larger neighbour of u under
    * m = min(N(u) ∪ {u}); small-star hangs u and its smaller neighbours
    * under m. The edge set contracts toward per-component stars
    * (v, min-of-component) in O(log² n) rounds worst case — component
    * DIAMETER does not bound the round count, unlike label propagation,
    * so a 1000-link duplication chain converges in ~10 rounds, not 1000.
    * Each round is two groupBy+join shuffles over the (src, dst) edge
    * list — narrow, AQE-skew-splittable, no driver-held state; ONE
    * driver action per round (the convergence fingerprint) materializes
    * the persisted round so lineage stays bounded.
    */
  def connectedComponentsResult(pairs: DataFrame,
      maxIter: Int = 20): Components = {
    // orient every edge (larger, smaller): the star ops preserve this
    // invariant, so `dst` is always the candidate component min.
    // Eager localCheckpoint (here and per round) truncates lineage —
    // every round references its input plan several times, so without
    // truncation the logical plan grows ~5× per round and the optimizer
    // itself OOMs around round 8. Local (not reliable) checkpointing
    // trades executor-loss recovery for zero-config operation; on a
    // long-running 1000-executor job, set a checkpoint dir and swap in
    // `checkpoint()` — same call shape, durable lineage root.
    // LAZY localCheckpoint: the convergence fingerprint right below is the
    // first action and materializes the checkpoint, so each round costs
    // ONE Spark job (eager checkpointing ran a second, redundant
    // materialization job per round — half the per-round fixed cost at
    // small scale).
    //
    // `base0` keeps self-loop pairs (filtered out of the iteration right
    // below) so the node universe can be read back from THIS checkpoint:
    // deriving `nodes` from `pairs` — as earlier rounds did — re-evaluated
    // the caller's whole pair-generation plan a second time at
    // labels-materialization, which at corpus scale is a full second pass
    // over the candidate join (round-12 verdict #2 measured it at ~1.5 s
    // even on a 1000-doc gate slice). One evaluation of `pairs`, total.
    val base0 = pairs
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .distinct()
      .localCheckpoint(false)
    var edges = base0.filter(col("src") =!= col("dst"))
    // Convergence probe: (edge count, order-independent XOR of per-edge
    // hashes — XOR, not sum, which overflows Long under ANSI) — a fixed
    // point of large∘small leaves the edge set unchanged, so an unchanged
    // fingerprint means converged (64-bit collision odds are ~2⁻⁶⁴ per
    // round; the gate's closed-form oracle would catch one). Edges are
    // distinct, so XOR cancellation of repeated rows cannot occur.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(src, dst))").as("h")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var fp = fingerprint(edges)
    // Width adaptation: tiny rounds are latency-bound, not compute-bound
    // — below ~100k edges a star round's wall cost is AQE stage
    // scheduling + per-stage codegen over dozens of near-empty cached
    // partitions (measured on the 248-edge neardup certificate slice:
    // 2.38 s -> 1.42 s warm with a 1-partition working set). The
    // fingerprint probe already knows each round's exact edge count, so
    // read the checkpoint blocks through a narrow coalesce sized to
    // ~50k edges/partition once the set is small. Large edge sets keep
    // their full width — early rounds at corpus scale are compute-dense
    // (the round-18 cached-partitioning lesson, PLANS.md) — and late
    // rounds on a 100 TB input shrink the same way certificate slices
    // start, so the narrowing is the scale path, not a test hack.
    def narrowed(e: DataFrame, n: Long): DataFrame =
      if (n == 0L || n > 100000L) e
      else e.coalesce(math.max(1, math.ceil(n / 50000.0).toInt))
    // `ckpt` tracks the round's raw checkpointed plan (LogicalRDD) for
    // block frees; `edges` may be a narrowed view of it.
    var ckpt = base0
    edges = narrowed(edges, fp._1)
    var converged = fp._1 == 0L // no edges: every node is its own root
    var rounds = 0
    // Both star steps take the WINDOW-min form (round 19, guide §2.4):
    // `min(dst) over (partition by src)` binds each row's group minimum
    // in the same exchange that groups it, so the groupBy-min + re-join
    // pair each step used before — which shuffled the symmetric edge
    // list a SECOND time and paid a join's AQE planning wave — collapses
    // to one exchange + per-partition sort. Per round: 7 exchanges → 4,
    // and the 2E-row sym list crosses the wire once, not twice. Skew
    // PARTITIONING is unchanged (the old join also hash-partitioned by
    // src), but the old groupBy-min + join pair was eligible for AQE
    // skewed-join splitting while WindowExec is not: a hot src (giant
    // star component) sorts and buffers its whole group in ONE task's
    // row buffer (r19 advisor). Large-star bounds that exposure — each
    // round strictly shrinks hot-node degree toward the component min —
    // but if a hot component ever dominates the CC round task times at
    // corpus scale, switch the large-star step to a salted two-phase
    // min. Row sets are provably identical at every round (min over the
    // same groups, emitted rows the same set), so round count,
    // fingerprints and labels are bit-identical.
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    while (rounds < maxIter && !converged) {
      // large-star: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
      val sym = edges
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val ls = sym
        .withColumn("__m", least(min(col("dst")).over(wSrc), col("src")))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__m").as("dst"))
        .distinct()
      // small-star on (larger → smaller) edges: m = min(N(u)); emit
      // (v, m) for v ∈ N(u) ∪ {u}, v ≠ m — src > dst holds throughout.
      // `ls` is distinct, so per src exactly ONE row has dst == m: that
      // row becomes the center edge (src, m), every other row the leaf
      // edge (dst, m) — the old leaves ∪ centers union, without the
      // union or the join.
      val next = ls
        .withColumn("__m", min(col("dst")).over(wSrc))
        .select(when(col("dst") === col("__m"), col("src"))
            .otherwise(col("dst")).as("src"),
          col("__m").as("dst"))
        .distinct().localCheckpoint(false)
      // lazy localCheckpoint: the fingerprint probe materializes it (one
      // job), and the next round's plan roots at the checkpointed blocks
      val nfp = fingerprint(next)
      // the probe materialized `next`'s checkpoint, so the previous
      // round's blocks are dead weight — free them now instead of
      // waiting for RDD garbage collection (a busy serving session
      // would otherwise hold O(rounds) stale edge sets in storage).
      // base0 itself is exempt (it backs the node universe until the
      // caller's boundary release); `ckpt` — not `edges` — is the raw
      // LogicalRDD the free must target, since `edges` may be a
      // narrowed coalesce view unpersistCheckpoint won't match.
      if (ckpt ne base0) Caches.unpersistCheckpoint(ckpt)
      converged = nfp == fp
      ckpt = next
      edges = narrowed(next, nfp._1)
      fp = nfp
      rounds += 1
    }
    // At the fixed point every edge is (node, component-min) and roots
    // carry no outgoing edge; groupBy-min also tolerates an unconverged
    // (maxIter-capped) edge set by picking the best label seen so far.
    // Node universe from base0's checkpoint (self-loop-only nodes
    // included — base0 keeps them), NOT from `pairs`: see base0's comment.
    val nodes = base0.select(col("src").as("id"))
      .union(base0.select(col("dst").as("id"))).distinct()
    // both live checkpoints back the returned labels plan; hand them to
    // Caches so the caller's boundary release frees them (checkpoint
    // blocks never free through Dataset.unpersist, only via their RDD)
    Caches.trackCheckpointed(base0)
    Caches.trackCheckpointed(ckpt)
    val comp = edges.groupBy(col("src")).agg(min(col("dst")).as("__comp"))
    val labels = nodes.join(comp, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("__comp"), col("id")).as("comp"))
    Components(labels, converged, rounds)
  }

  /** [[connectedComponentsResult]] with the strict contract: throws if the
    * edge set failed to reach a fixed point within `maxIter` rounds (at
    * O(log² n) contraction, hitting 20 rounds means something is deeply
    * wrong, and silently split components corrupt downstream dedup). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val r = connectedComponentsResult(pairs, maxIter)
    if (!r.converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter rounds — " +
          s"labels would split components; raise maxIter")
    r.labels
  }

  /** Driver-side union-find components over an admission-BOUNDED pair
    * list (id_a, id_b): collect the edges (hard cap — refuses, never
    * truncates), union by min root with path compression, label every
    * endpoint with its component's min id. Output schema matches
    * `connectedComponents`' labels (id, comp).
    *
    * This exists for CERTIFICATE legs whose inputs are bounded by
    * construction (gate slices): pitting the distributed
    * large-star/small-star CC against an independent single-machine
    * algorithm makes the component-equality gate STRONGER — the two
    * legs share zero code past the pair list — while dropping the
    * expanded leg's per-round fixed job cost (an iterative CC pays
    * ~2 shuffles + a checkpoint materialization per round even on a
    * 25-edge graph). Never a corpus path: unbounded inputs belong to
    * `connectedComponents`. */
  def localComponents(pairs: DataFrame, maxEdges: Int = 2000000): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // collect as SPECIALIZED (Long, Long) tuples, not Rows: a GenericRow
    // carries an Object[] plus two boxed longs (~80 bytes/edge — at the
    // 2M cap that is driver heap the admission `require` below could not
    // protect, the OOM landing before the refusal); Tuple2 is
    // @specialized on Long, so the collected array is ~32 bytes/edge and
    // the cap's worst case fits any default driver heap
    val es = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .filter(col("id_a") =!= col("id_b"))
      .limit(maxEdges + 1).as[(Long, Long)].collect()
    require(es.length <= maxEdges,
      s"localComponents: over $maxEdges edges — the input is not the " +
        "bounded certificate slice this exists for; use connectedComponents")
    val parent = new java.util.HashMap[Long, Long]()
    def add(x: Long): Unit = if (!parent.containsKey(x)) parent.put(x, x)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    es.foreach { case (a, b) =>
      add(a); add(b)
      val ra = find(a); val rb = find(b)
      // union by min: the surviving root is the smaller id, so after
      // convergence find(x) IS the component's min id (CC's labeling)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.toSeq.sorted
      .map(id => (id, find(id))).toDF("id", "comp")
  }

  /** Deterministic bounded id-slice — the form a quadratic CERTIFICATE leg
    * is allowed to take at soak scale (the [[Similarity.bruteNearDupPairsSliced]]
    * pattern, round-7 verdict #2: a gate suite whose wall is half
    * certificate measures the certificate, not the engine). At or below
    * `maxRows` rows the slice is the WHOLE input; above, one cheap count()
    * picks `step = n / maxRows` and keeps ids ≡ 0 (mod step) — closed-form
    * and engine-agnostic, spanning the whole id range (key-shifted clone
    * copies at any multiple-of-step offset land uniformly, so exact-clone
    * cliques survive into the slice and contraction stays exercised).
    *
    * The slice premise is ids roughly uniform modulo step; an id space
    * that defeats it degrades SILENTLY in both directions (see the guard
    * rationale in [[Similarity.bruteNearDupPairsSliced]]), so the step>1
    * path pays one narrow count on the already-bounded slice and fails
    * loudly outside [target/4, 4*target]. */
  def slicedById(df: DataFrame, idCol: String, maxRows: Long): DataFrame = {
    val n = df.count()
    val step = math.max(1L, n / maxRows)
    if (step == 1L) return df
    val sliced = df.filter(col(idCol) % step === 0L)
    val kept = sliced.count()
    if (kept > 4L * maxRows || kept < math.min(n, maxRows) / 4L)
      throw new IllegalStateException(
        s"slicedById: id slice kept $kept of $n rows (target ~$maxRows, " +
          s"step $step) — the id space is not uniform modulo the stride; " +
          "pick a different slice key")
    sliced
  }

  /** Brute-force exact n-gram Jaccard over all pairs — the test oracle for
    * the LSH paths (O(n²); never use at scale). */
  def bruteForcePairs(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, threshold: Double = 0.6): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(textCol).as("__text_a"))
    val b = df.select(col(idCol).as("id_b"), col(textCol).as("__text_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        jaccard_shingle(col("__text_a"), col("__text_b"), shingle))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Duplicated-substring-span fraction per document: strided character
    * windows (`window` chars every `stride`), globally attributed to the
    * lowest document id containing each window string; a window occurrence
    * in doc d is a duplicated span iff some doc with a smaller id contains
    * the same window. Returns `(id, n_windows, n_dup, dup_frac)` for docs
    * with at least one duplicated span.
    *
    * This is the document-granular form of exact substring dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022 — there via a corpus-wide suffix array; suffix
    * arrays don't distribute, strided window attribution does): a doc
    * whose dup_frac is high is a near-copy or a boilerplate carrier even
    * when doc-level hashes differ. Exactness trade: a duplicated run
    * shorter than `window + stride` chars can straddle window boundaries
    * undetected, so this detects runs >= window + stride - 1 chars
    * (every such run contains a full aligned window); the published
    * pipelines run at 50-token granularity, same order as the defaults.
    *
    * Shape for 100 TB: windows explode map-side with a bounded byte
    * amplification of window/stride (2x at the defaults — each char lands
    * in that many windows); the owner aggregate is a groupBy on the
    * window key (min id — partial aggs collapse clone-heavy corpora
    * before the shuffle), and the attribution join is equi on the same
    * key. The window set is persisted (Caches-registered) so the owner
    * aggregate and the attribution join read ONE explode pass over the
    * corpus — without it the two consumers need different partitionings
    * (window key vs doc id), exchange reuse cannot collapse them, and
    * the corpus is explode-scanned twice (round-12 verdict #3).
    *
    * `hashed = true` replaces the window string with `xxhash64(window)`
    * before the shuffle/persist — the [[Decontaminate.overlap]] pattern:
    * keys shrink 40 bytes -> 8 (and the persisted set to ~16 bytes/row),
    * which is the shape to run at corpus scale. A collision can only
    * OVERcount a doc's n_dup (a window inheriting a foreign, lower-id
    * owner), never undercount — the safe direction for a dedup signal —
    * at ~2^-64 per distinct-window pair. The gate uses the exact-string
    * form so DuckDB reproduces it byte-for-byte; PipelineSpec asserts
    * hashed ≡ exact on the fixture corpus.
    *
    * Determinism: exact strings of the normalized text, no seeds — full
    * hash oracle (the only dedup-family member besides jaccardPairs with
    * one). */
  def substringDup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 40, stride: Int = 20,
      hashed: Boolean = false): DataFrame = {
    require(window >= 1 && stride >= 1)
    val winsRaw = Decontaminate.spreadSmall(
      df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol).as("__id"),
        Decontaminate.normCol(col(textCol)).as("__norm"))
      // one codegen'd offset pass per doc (round 19): the old
      // transform(sequence(…), p -> substr(p, window)) HOF ran an
      // interpreted lambda plus an O(len) position scan per window
      .select(col("__id"),
        explode(char_windows(col("__norm"), window, stride)).as("__win"))
    val wins = Caches.persistTracked(
      if (hashed) winsRaw.select(col("__id"), xxhash64(col("__win")).as("__win"))
      else winsRaw)
    val owners = wins.groupBy(col("__win"))
      .agg(min(col("__id")).as("__owner"))
    wins.join(owners, Seq("__win"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__owner") < col("__id"), 1L).otherwise(0L))
          .as("n_dup"))
      .filter(col("n_dup") > 0L)
      .select(col("__id").as(idCol), col("n_windows"), col("n_dup"),
        graft.Det.r(col("n_dup").cast("double") / col("n_windows"), 6)
          .as("dup_frac"))
  }
}
