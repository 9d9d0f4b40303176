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

  /** Exact duplicate groups by content hash of the raw text. */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .filter(col("n") > 1)

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
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Narrow (id, sig) projection, persisted: the signature (shingle +
    // numHashes hash passes over full text) is the expensive scan, and
    // three legs below read it (banding + both candidate sig joins) —
    // without the persist each leg would recompute it from source. The
    // cache entry is one long[numHashes] per doc (no text); it stays
    // cached for plan reuse until the session evicts it.
    val sig = df.select(col(idCol).as("__id"),
      minhash_sig(col(textCol), numHashes, shingle).as("__sig"))
      .persist()

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
    * least one chunk); refine with bit_count(xor) <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("__id"),
      simhash64(col(textCol)).as("__sim"))
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

  /** Connected components over an undirected duplicate-pair edge list —
    * the cluster-resolution step every dedup pipeline needs after pair
    * generation (keep one representative per component, drop the rest).
    *
    * Iterative min-label propagation: each round every node adopts the
    * minimum component label among itself and its neighbours; converges
    * in O(component diameter) rounds. Near-dup components are shallow
    * (dups of dups of one source), so the default cap is generous; each
    * round is two shuffles (join + groupBy), fully distributed — the
    * same plan shape GraphX Pregel would produce, without the dependency.
    * Returns (id, comp) where comp = min id in the component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
    var prevCached: Option[DataFrame] = scala.None
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val nbrMin = sym.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_comp"))
      val updated = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("new_comp"))
        .persist()
      // ONE action per round: the convergence probe materializes the
      // persisted round result; the next round's labels read it lazily
      // (bounded lineage — each round roots at the previous persist)
      converged = updated.filter(col("new_comp") < col("comp"))
        .limit(1).count() == 0
      prevCached.foreach(_.unpersist(false))
      prevCached = Some(updated)
      labels = updated.select(col("id"), col("new_comp").as("comp"))
      i += 1
    }
    sym.unpersist(false)
    if (!converged)
      // unconverged labels silently split a component into several
      // clusters — surface it so callers can raise maxIter (component
      // diameter exceeded it, e.g. a long duplication chain)
      System.err.println(s"[graft] connectedComponents: NOT converged " +
        s"after $maxIter rounds; labels may split wide components — " +
        s"raise maxIter")
    labels
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
}
