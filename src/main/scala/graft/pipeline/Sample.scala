package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the mixture-weighting step of corpus
  * assembly (down-sample source X to frac f, reproducibly, on any
  * cluster layout).
  *
  * The scale form is HASH-THRESHOLD sampling: keep a row iff the first
  * 8 hex chars of `md5(key)` sort below the fraction's threshold — a
  * stateless scan-side filter (no shuffle, no windows, no RNG state),
  * reproducible across engines/partitionings/reruns, and composable
  * per stratum by keying the threshold off a stratum column. Quotas are
  * binomial-approximate (±O(1/√n) relative), which is what production
  * pipelines accept at corpus scale; md5 (not xxhash64) because both
  * Spark and DuckDB implement it identically, so the gate takes a full
  * hash oracle.
  *
  * [[stratifiedExact]] is the quota-EXACT variant — per-stratum
  * `row_number` over the same hash order, keep rank ≤ ceil(f·n) — for
  * when exact stratum sizes matter more than the full per-stratum
  * sort+shuffle it costs (a window over each stratum; at 100 TB prefer
  * the threshold form, or pre-aggregate stratum counts and run the
  * threshold form with per-stratum fractions). */
object Sample {

  /** First 8 hex chars of md5(key) — the portable order both engines
    * agree on byte-for-byte. */
  def hashKey(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold for a fraction in [0, 1]: rows with
    * `hashKey < thresholdHex(f)` are kept (uniform in expectation —
    * md5 is uniform over the 32-bit prefix). */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    f"${math.min((frac * 4294967296d).toLong, 4294967295L)}%08x"
  }

  /** Deterministic fraction-`frac` sample by hash threshold on `key`.
    * frac >= 1.0 short-circuits to the identity: the clamped threshold
    * 0xffffffff under a strict `<` would otherwise drop keys whose
    * md5 prefix is exactly ffffffff — ~1 per 4.3B rows, real at the
    * corpus scale this targets. */
  def byHash(df: DataFrame, key: Column, frac: Double): DataFrame =
    if (frac >= 1.0) df
    else df.filter(hashKey(key) < lit(thresholdHex(frac)))

  /** Quota-exact stratified sample: within each stratum, keep the
    * `ceil(frac * n)` rows that sort FIRST by (hashKey, key) — the key
    * tiebreak keeps the selection total-ordered and deterministic even
    * under md5-prefix ties. */
  def stratifiedExact(df: DataFrame, strata: Column, key: Column,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(hashKey(key), key)
    val wc = Window.partitionBy(strata)
    df.withColumn("__srk", row_number().over(w))
      .withColumn("__sn", count(lit(1)).over(wc))
      .filter(col("__srk") <= ceil(col("__sn") * frac))
      .drop("__srk", "__sn")
  }

  /** Deterministic dataset split — the train/val/test assignment every
    * corpus ships with. Each row gets the FIRST label whose cumulative
    * fraction bound its hash prefix falls under ([[hashKey]] — md5, so
    * assignment is stable across runs, partitionings, engines, and is
    * disjoint/exhaustive by construction). A row's split never changes
    * when other rows are added or removed — the property per-stratum
    * row-number splits lack. Stateless scan-side arithmetic: zero
    * exchanges at any scale. `fracs` must sum to 1 (the last label takes
    * the remainder including the clamped top hex value). A NULL key
    * hashes to NULL, every `<` comparison is NULL, and the CASE ladder
    * falls through to the LAST label — deterministic, but filter null
    * keys out first if that is not the intent. */
  def assignSplits(df: DataFrame, key: Column,
      fracs: Seq[(String, Double)],
      splitName: String = "split"): DataFrame = {
    require(fracs.size >= 2, "need at least two splits")
    require(fracs.map(_._1).distinct.size == fracs.size,
      "split labels must be distinct")
    require(fracs.forall(_._2 > 0.0), "fractions must be positive")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    noClash(df, Seq(splitName), "assignSplits")
    val cum = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    val hk = hashKey(key)
    val chain = fracs.init.zip(cum.init).reverse
      .foldLeft(lit(fracs.last._1): Column) {
        case (els, ((name, _), c)) =>
          when(hk < lit(thresholdHex(c)), lit(name)).otherwise(els)
      }
    df.withColumn(splitName, chain)
  }

  /** Knuth/Weyl multiplicative hash of an integer key into [0, 2^32):
    * `((key mod 2^31) * 2654435761) mod 2^32` (2654435761 =
    * floor(2^32 / φ), Knuth TAOCP §6.4). Pure 64-bit integer
    * arithmetic — bit-identical in any engine, no string/hex
    * round-trip — and a low-discrepancy (golden-ratio Weyl) sequence on
    * sequential keys, so a threshold test keeps an evenly spread `frac`
    * of any key range. The inner `pmod(key, 2^31)` fold is load-bearing
    * (review finding): without it a key ≥ 2^31 overflows the int64
    * product and silently biases every threshold sampler built on this
    * hash. Folding costs one modulo, keeps the documented behavior for
    * keys < 2^31 unchanged, and makes ANY long key well-defined. The
    * DuckDB oracle twin is `((key % 2147483648) * 2654435761) %
    * 4294967296`, identical for the non-negative keys corpora use (`%`
    * vs `pmod` differ only below zero). */
  def weylHash(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  /** Refuse input columns that collide with a sampler's internal (or
    * requested output) column names — the silent alternative is
    * `withColumn`/join clobbering caller data (review finding). */
  private def noClash(df: DataFrame, names: Seq[String], op: String): Unit = {
    val clash = df.columns.filter(names.distinct.contains)
    require(clash.isEmpty,
      s"input columns collide with $op internals: ${clash.mkString(", ")}")
  }

  /** Budget-balanced mixture sampling — the corpus-assembly step that
    * down-samples every stratum (source/domain/language) to the SMALLEST
    * stratum's total weight (chars/tokens/bytes), producing a balanced
    * mixture deterministically. Plan shape at any scale: one map-side-
    * partial aggregate over tiny stratum cardinality -> driver-free
    * broadcast of the per-stratum rate -> stateless scan-side threshold
    * filter. No window, no per-stratum shuffle, no RNG state; rerunning
    * on any partitioning keeps the same rows. Quotas are threshold-
    * approximate (±O(1/√n) relative), the production trade at corpus
    * scale; [[stratifiedExact]] is the quota-exact (window) form. */
  def mixtureBalanced(df: DataFrame, stratum: Column, key: Column,
      weight: Column): DataFrame =
    mixtureBalancedRated(df, stratum, key, weight, "__rate").drop("__rate")

  /** [[mixtureBalanced]] keeping the per-stratum keep-rate as an output
    * column named `rateName` — for observability gates and audits that
    * want the rate each surviving row was sampled at. The rate (and the
    * internal stratum key) are part of this variant's contract; input
    * columns colliding with either are refused rather than clobbered. */
  def mixtureBalancedRated(df: DataFrame, stratum: Column, key: Column,
      weight: Column, rateName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    noClash(df, Seq("__stratum", "__rate", rateName), "mixtureBalanced")
    // NULL strata are excluded OUTRIGHT (review finding): the equi-join
    // below would silently drop their rows anyway, but without this
    // filter their group still entered the totals, and a handful of
    // null-stratum rows (tiny summed weight) would become the balanced
    // budget and collapse every real source's rate toward zero.
    val clean = df.filter(stratum.isNotNull)
    val totals = clean.groupBy(stratum.as("__stratum"))
      .agg(sum(weight).as("__w"))
    // scalar min via an unpartitioned window over the POST-AGGREGATE rows
    // (stratum-cardinality many, trivially single-partition) — NOT
    // `totals.agg(min)` + cross join, which would re-evaluate the whole
    // totals plan and scan the corpus twice for one tiny number
    val rates = totals
      .withColumn("__wmin", min(col("__w")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("__stratum"),
        (col("__wmin").cast("double") / col("__w")).as("__rate"))
    clean.join(broadcast(rates), stratum === col("__stratum"))
      .filter(weylHash(key).cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__stratum")
      .withColumnRenamed("__rate", rateName)
  }

  /** Mixture to EXPLICIT per-stratum target weights — the general
    * data-mixing form ([[mixtureBalanced]] is the targets-all-equal
    * special case): `targets` maps stratum value -> desired share of
    * the output weight. Each stratum's keep-rate solves to
    * `c · target_s / total_s` with c the largest feasible scale (no
    * rate above 1), i.e. the output hits the requested proportions at
    * the maximum size the corpus supports. Same plan shape as
    * mixtureBalanced: tiny aggregate -> broadcast rates -> stateless
    * Weyl-hash threshold scan. Strata absent from `targets` (and NULL
    * strata) are dropped. */
  def mixtureToWeights(df: DataFrame, stratum: Column, key: Column,
      weight: Column, targets: Map[String, Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty and positive")
    noClash(df, Seq("__stratum", "__rate"), "mixtureToWeights")
    val clean = df.filter(stratum.isNotNull &&
      stratum.cast("string").isin(targets.keys.toSeq: _*))
    val targetLit = map(targets.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val totals = clean.groupBy(stratum.cast("string").as("__stratum"))
      .agg(sum(weight).as("__w"))
      .withColumn("__tgt", element_at(targetLit, col("__stratum")))
    // c = min_s(total_s / target_s): the binding stratum keeps rate 1
    val scaled = totals
      .withColumn("__c", min(col("__w").cast("double") / col("__tgt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("__stratum"),
        (col("__c") * col("__tgt") / col("__w").cast("double"))
          .as("__rate"))
    clean.join(broadcast(scaled), stratum.cast("string") === col("__stratum"))
      .filter(weylHash(key).cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__stratum", "__rate")
  }

  /** Temperature (α) mixture sampling — the multilingual/multi-domain
    * rebalancing recipe (XLM-R §3.1, mC4/mT5 §3.2: sample stratum `s`
    * with probability ∝ total_s^α, 0 < α ≤ 1): α = 1 keeps natural
    * proportions, α → 0 approaches [[mixtureBalanced]]'s uniform
    * budget, and the published sweet spots (α ≈ 0.3–0.7) lift
    * low-resource strata without drowning high-resource ones. Keep-rate
    * solves to `(total_s / total_min)^(α−1)` — the SMALLEST stratum
    * keeps rate 1 (for α < 1) and the output hits the ∝ total^α
    * proportions at the maximum size the corpus supports. Same plan
    * shape as the other mixtures: tiny aggregate → window-over-
    * aggregate scalar → broadcast rates → stateless Weyl-hash threshold
    * scan; zero corpus shuffles.
    *
    * Keeps the rate as `rateName` when given (same contract as
    * [[mixtureBalancedRated]]). Cross-engine note: `pow` is not
    * IEEE-correctly-rounded, so a differential gate should compare
    * [[graft.Det.r]]-rounded rates; the keep DECISION is safe — a 1-ulp
    * rate disagreement moves the integer threshold by ~2^-20, which
    * flips a row only when a hash lands exactly on that sliver. */
  def mixtureTemperature(df: DataFrame, stratum: Column, key: Column,
      weight: Column, alpha: Double,
      rateName: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    noClash(df, Seq("__stratum", "__rate") ++ rateName, "mixtureTemperature")
    val clean = df.filter(stratum.isNotNull)
    val totals = clean.groupBy(stratum.as("__stratum"))
      .agg(sum(weight).as("__w"))
    val rates = totals
      .withColumn("__wmin", min(col("__w")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("__stratum"),
        pow(col("__w").cast("double") / col("__wmin").cast("double"),
          lit(alpha - 1.0)).as("__rate"))
    val kept = clean.join(broadcast(rates), stratum === col("__stratum"))
      .filter(weylHash(key).cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__stratum")
    rateName match {
      case Some(n) => kept.withColumnRenamed("__rate", n)
      case None => kept.drop("__rate")
    }
  }

  /** Per-stratum cap: keep at most `n` rows per stratum, chosen by the
    * deterministic [[weylHash]] order (key tiebreak) — the per-domain
    * document cap of web-corpus assembly. Declared as a rank window so
    * Catalyst plans a WindowGroupLimit: each input partition is pruned
    * to its local top-n PER STRATUM before the exchange, so the shuffle
    * moves O(n · strata · partitions) rows no matter how large or
    * skewed the strata are — the declarative form IS the scalable
    * two-phase top-n. */
  def capPerStratum(df: DataFrame, stratum: Column, key: Column,
      n: Int): DataFrame =
    capPerStratumRanked(df, stratum, key, n, "__cap_rk").drop("__cap_rk")

  /** [[capPerStratum]] keeping each survivor's within-stratum rank as an
    * output column named `rankName` (1-based in the deterministic
    * Weyl-hash order) — for gates/audits that assert the selection
    * order. Colliding input columns are refused rather than clobbered;
    * the rank-filter shape is preserved so Catalyst still plans the
    * partial-pruning WindowGroupLimit. */
  def capPerStratumRanked(df: DataFrame, stratum: Column, key: Column,
      n: Int, rankName: String): DataFrame = {
    require(n > 0, "cap must be positive")
    noClash(df, Seq(rankName), "capPerStratum")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum).orderBy(weylHash(key), key)
    df.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= n)
  }
}
