package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw-corpus document by how much more likely its
  * n-gram features are under a small TARGET distribution (the quality
  * seed — wiki, books, a curated domain) than under the raw corpus
  * itself, then resample the raw corpus with Gumbel-top-k on those
  * log-weights. The standard domain-targeted selection step a
  * training-data pipeline runs between quality filtering and mixing.
  *
  * Features are word unigrams + bigrams (the paper's hashed n-gram
  * model with n = 2); both feature distributions are Laplace-smoothed
  * bag-of-grams fits:
  *
  *   ŵ(doc) = Σ_{g ∈ grams(doc)} [ ln p̂(g) − ln q̂(g) ]
  *   p̂(g) = (c_target(g)+1)/(T+V),  q̂(g) = (c_raw(g)+1)/(R+V)
  *
  * with V the union vocabulary size and T/R the total target/raw gram
  * counts. The paper hashes grams into a fixed bucket count; here the
  * exact-string form is the oracle-gated default and `hashBuckets`
  * turns on the paper's bucketing for corpus scale (8-byte xxhash64 →
  * bucket id — grams never cross the wire as strings).
  *
  * Determinism contract (the [[LmScore]] pins): each gram's
  * log-ratio is TWO fixed-association double trees rounded to integer
  * micros once (`micros(ln p̂) − micros(ln q̂)`); per-doc sums are then
  * exact integer arithmetic, order-free across partitions. The DuckDB
  * oracle twin transliterates the identical trees.
  *
  * Scale shape: one scan shape builds the gram stream scan-side
  * (codegen'd WordGramsExpr byte passes — no self-join, no interpreted
  * lambdas); the conditional count aggregate (target and raw counts in
  * the same pass — the target corpus is NOT re-scanned) and the probe
  * join consume different projections of it, recomputed per consumer
  * (see the cache A/B note in importanceWeights). Totals ride a
  * broadcast scalar row. With `hashBuckets` set, the exchange keys
  * drop from strings to longs.
  */
object Dsir {

  private val Reserved = Seq("__ws", "__g", "__tgt", "__ct", "__cr",
    "__t", "__r", "__v", "__dlt", "__nrm")

  /** Doc-local unigram+bigram feature array over an ALREADY-normalized
    * text column — two codegen'd [[WordGramsExpr]] passes (round 19;
    * the split + zip_with/slice/concat_ws HOF form it replaces ran an
    * interpreted lambda per bigram and re-evaluated the split array per
    * reference). Identical values FOR NON-NULL TEXT: 1-grams are the
    * split tokens (including the [""] empty-text edge), 2-grams the
    * adjacent pairs, both under the same single-space join. NULL text
    * yields an EMPTY array (WordGramsExpr is null→empty), where the old
    * split+concat form returned NULL — every caller (gramStream, the
    * streaming dsirScore) filters `isNotNull` first, so keep that
    * filter if you add one (r19 advisor). */
  private[graft] def gramArrayFromNorm(norm: Column): Column =
    concat(Decontaminate.wordGrams(norm, 1), Decontaminate.wordGrams(norm, 2))

  /** Doc-local unigram+bigram feature array for a text column — shared
    * by the batch gram stream and the streaming scorer so the feature
    * definition cannot diverge. Callers that can bind the normalized
    * string as a real column should use [[gramArrayFromNorm]] so the
    * normalization regex runs once per row. */
  private[graft] def gramArray(text: Column): Column =
    gramArrayFromNorm(Decontaminate.normCol(text))

  /** Optional paper-style feature hashing: gram string → bucket id. */
  private[graft] def bucketed(g: Column,
      hashBuckets: Option[Int]): Column = hashBuckets match {
    case Some(b) => pmod(xxhash64(g), lit(b.toLong))
    case None => g
  }

  /** Feature-key transform for the three key modes: exact strings
    * (oracle default), paper-style fixed buckets (`hashBuckets` — the
    * bounded-model form streaming lifts), or full 8-byte xxhash64
    * (`hash64` — the [[Decontaminate]] hashed-probe shape: grams never
    * cross the wire as strings, and a collision needs ~2^-64 per gram
    * pair, so the result is value-identical to the exact form at any
    * gate scale and the exact DuckDB SQL doubles as its oracle). */
  private[graft] def featureKey(g: Column, hashBuckets: Option[Int],
      hash64: Boolean): Column =
    if (hash64) xxhash64(g) else bucketed(g, hashBuckets)

  /** `micros(ln((c+1)/denom))` — THE smoothed-logprob tree; one
    * definition so batch, streaming, and driver-side twins agree. */
  private[graft] def lnMicros(c: Column, denom: Column): Column =
    floor(log((c + lit(1L)).cast("double") / denom.cast("double"))
      * 1000000.0 + lit(0.5)).cast("long")

  /** Per-gram target/raw counts over the exploded feature stream:
    * `(__g, __ct, __cr)` — ONE gram-key exchange. */
  private[graft] def gramCounts(grams: DataFrame): DataFrame =
    grams.groupBy(col("__g")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
      sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr"))

  /** Per-gram smoothed log-ratio table `(__g, __dlt)` over the counts. */
  private[graft] def logRatios(gcnt: DataFrame): DataFrame = {
    val tot = gcnt.agg(sum(col("__ct")).as("__t"),
      sum(col("__cr")).as("__r"), count(lit(1)).as("__v"))
    gcnt.crossJoin(broadcast(tot))
      .select(col("__g"),
        (lnMicros(col("__ct"), col("__t") + col("__v")) -
          lnMicros(col("__cr"), col("__r") + col("__v"))).as("__dlt"))
  }

  private def guard(df: DataFrame, idCol: String): Unit = {
    val clash = df.columns.toSet.intersect(Reserved.toSet)
    require(clash.isEmpty, s"input columns clash with internals: $clash")
    require(!Reserved.contains(idCol) && idCol != "n_grams" &&
      idCol != "w_micros",
      s"idCol '$idCol' clashes with the output/internal columns")
  }

  /** Exploded `(idCol, __tgt, __g)` feature stream, scan-side. The
    * normalized text binds as a real column first (the appendShingleSet
    * discipline) so the regex runs once per row however many times the
    * gram expressions reference it. */
  private[graft] def gramStream(df: DataFrame, idCol: String,
      textCol: String, targetCol: Column,
      hashBuckets: Option[Int], hash64: Boolean = false): DataFrame =
    Decontaminate.spreadSmall(
        df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), targetCol.as("__tgt"),
        Decontaminate.normCol(col(textCol)).as("__nrm"))
      .select(col(idCol), col("__tgt"),
        explode(gramArrayFromNorm(col("__nrm"))).as("__g"))
      .select(col(idCol), col("__tgt"),
        featureKey(col("__g"), hashBuckets, hash64).as("__g"))
      // redundant semantically (exploded grams are never null) but
      // load-bearing for the plan: the probe join infers an
      // isnotnull(__g) filter into ITS copy of the count subtree, and
      // without the same filter on every copy the totals leg loses
      // exchange reuse and re-explodes the corpus (Explain-verified)
      .filter(col("__g").isNotNull)

  /** Per-document importance log-weight: `(idCol, n_grams, w_micros)`
    * for EVERY doc with non-null text (target docs score too — callers
    * select from the raw side; keeping both makes the weight table
    * reusable as a domain-affinity signal). `targetCol` must be a
    * boolean column over `df`'s columns. Docs whose text normalizes to
    * a single token still emit their unigram (n_grams ≥ 1). */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetCol: Column, hashBuckets: Option[Int] = None,
      hash64: Boolean = false): DataFrame = {
    guard(df, idCol)
    hashBuckets.foreach(b => require(b > 1, s"hashBuckets must be > 1: $b"))
    require(!(hash64 && hashBuckets.nonEmpty),
      "hash64 and hashBuckets are alternative key modes - pick one")
    // the count aggregate and the probe join shuffle different
    // projections of the stream ((__tgt, __g) vs (id, __g)) — exchange
    // reuse never applies, so the gram build runs twice over the
    // corpus. Deliberately unpersisted (round 19): the cache A/B read
    // 13.9 → 21.9 task-CPU-s at sf0.1 — columnar encode+decode of the
    // exploded gram stream plus its materialization wave costs more
    // than re-running the codegen'd WordGramsExpr build, and at corpus
    // scale the cache spills ~2× the text bytes where the re-scan
    // reads compressed parquet.
    val grams = gramStream(df, idCol, textCol, targetCol, hashBuckets,
      hash64)
    val lp = logRatios(gramCounts(grams))
    grams.select(col(idCol), col("__g")).join(lp, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__dlt")).as("w_micros"))
  }

  /** Gumbel-top-k resampling over the importance weights — the "IR" in
    * DSIR. Sampling without replacement from softmax(w) is equivalent
    * to taking the top k of `w + Gumbel(0,1)` (Vieira 2014); the noise
    * here is the deterministic [[Sample.weylHash]] stream mapped
    * through the inverse-Gumbel CDF, so the draw is reproducible AND
    * oracle-able: `u = (weylHash(id)+0.5)/2^32 ∈ (0,1)`, `g =
    * −ln(−ln u)`, both engines computing the identical double tree,
    * micros-rounded once, then an integer-key top-k. Returns the
    * selected rows of `weights` plus `score_micros`. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(weights.columns.contains("w_micros"),
      "weights must carry w_micros (importanceWeights output)")
    require(!weights.columns.contains("score_micros"),
      "input already has a score_micros column")
    val u = (Sample.weylHash(col(idCol)).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val g = floor(-log(-log(u)) * 1000000.0 + lit(0.5)).cast("long")
    // orderBy + limit plans as TakeOrderedAndProject — per-partition
    // top-k merged on the driver, never a single-partition window
    weights.withColumn("score_micros", col("w_micros") + g)
      .orderBy(col("score_micros").desc, col(idCol).asc)
      .limit(k)
  }
}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Σ over a bucket-id array of the fitted DSIR log-ratio, unseen buckets
  * scoring the fully-smoothed `default` — the streaming scorer's lookup
  * as ONE compact interpreted loop over a plain hash map. The CreateMap
  * formulation it replaces carried the whole fitted table as 2·|table|
  * literal children (≈131k expressions at the default 2^16 buckets),
  * which every Catalyst tree transform re-walks and which flirts with
  * codegen constant-pool limits (the [[SqScoreExpr]] discipline: model
  * constants belong in the expression object, not the expression TREE).
  * The per-bucket arithmetic is table lookups of the identical
  * [[Dsir.lnMicros]] integers, so stream ≡ batch stays bit-exact.
  * Whole-stage codegen calls [[score]] on the expression bound as a
  * reference object (round 20 — CodegenFallback split the scoring
  * stage's WSCG span). */
case class DsirGramScoreExpr(child: Expression,
    table: Map[Long, Long], default: Long)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_gram_score"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires array<bigint>, got $other")
    }

  def score(arr: ArrayData): Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      // exploded bucket ids are never null (xxhash64 of a non-null gram)
      s += table.getOrElse(arr.getLong(i), default)
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any): Any =
    score(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dsirScore", this,
      classOf[DsirGramScoreExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.score($c)")
  }

  override protected def withNewChildInternal(c: Expression)
      : DsirGramScoreExpr = copy(child = c)
}
