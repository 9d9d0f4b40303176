package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

/** Exact second-pass re-ranking over compressed-domain ANN candidates —
  * the standard two-stage retrieval layout (FAISS's refine step; Jégou
  * et al. 2011 §VI): a cheap quantized scan ([[Sq.sqTopKWith]],
  * [[Pq.adcTopK]], [[Pq.ivfPqTopK]]) nominates `kPrime > k` candidates
  * per query, then ONLY those pairs are re-scored against full float
  * vectors and the top `k` kept. Quantization error affects candidate
  * RECALL but no longer the final ordering, so a small `kPrime/k`
  * overfetch (2-4×) recovers most of the exact ranking at a fraction of
  * brute-force cost.
  *
  * Scale shape: the candidate table is |queries|·kPrime ids — the small
  * side by construction — so it broadcasts (with its query vectors)
  * into ONE equi-join against the corpus on `neighbor_id`: a single
  * corpus scan that re-reads full vectors ONLY for nominated rows. No
  * shuffle of the corpus, no cross join; the final per-query top-k is a
  * rank window that plans as WindowGroupLimit (map-side pre-prune).
  *
  * Determinism contract (the [[Sq]]/[[Pq]] family pins): the exact
  * score is `Σ_d micros(q_d·x_d)` — per-dimension double products
  * rounded to integer micros once, then exact integer sums — order-free
  * across partitions and transliterable into the DuckDB oracle twin
  * (the same per-dim tree the SQ scorer uses, minus the affine fold).
  * Ties break to the lowest neighbor id.
  */
object Rerank {

  /** `Σ_d micros(q_d·x_d)` over two float vectors — the exact-MIPS
    * integer score (fused interpreted loop, [[SqScoreExpr]] shape). */
  def exactMicros(q: Column, x: Column): Column =
    graftbridge.column(ExactDotMicrosExpr(
      graftbridge.expression(q), graftbridge.expression(x)))

  /** Re-rank `(query_id, neighbor_id)` candidate pairs against the full
    * vectors in `queries`/`corpus`; returns `(query_id, neighbor_id,
    * score_micros, rank)` with `rank ≤ topK`. Extra candidate columns
    * (the first-pass approximate score) are dropped — the exact score
    * is THE ranking key, so the two passes cannot disagree silently.
    * Candidate pairs are de-duplicated here (a union of two candidate
    * sources may nominate the same neighbor twice; without the
    * distinct, one neighbor would occupy several top-k slots with
    * distinct ranks — round-15 ADVICE #3). */
  def rerank(candidates: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micros").desc, col("neighbor_id").asc)
    broadcast(candidates.select(col("query_id"), col("neighbor_id"))
        .distinct()
        .join(q, Seq("query_id")))
      .join(c, Seq("neighbor_id"))
      .withColumn("score_micros", exactMicros(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score_micros"),
        col("rank"))
  }

  /** Maximal-marginal-relevance diversification (Carbonell & Goldstein,
    * SIGIR 1998) over a BOUNDED candidate pool: greedily pick `k` items
    * maximizing `lam·rel − (1−lam)·max_{s∈selected} sim(c, s)`, ties to
    * the lowest id — the standard third stage after retrieval + fusion
    * (drop near-duplicate hits before they reach the user/context
    * window).
    *
    * Scale shape: MMR is inherently sequential in `k`, so it is a
    * serving-side op over the candidate list, never the corpus. The
    * pairwise similarity matrix is computed DISTRIBUTED by the same
    * [[CosineSim]] expression every proven gate uses (bit-parity by
    * construction), then the |pool|² rounded sims — bounded by
    * `maxCandidates`, independent of corpus size — drive a driver-side
    * greedy walk. Pools above `maxCandidates` are REFUSED, never
    * truncated (the localComponents discipline).
    *
    * Determinism contract: `rel` must arrive rounded (the caller's
    * score contract, e.g. [[Search.rrfFuse]]'s 1e-6 `rrf`). The
    * diversity sim is the MICROS-COSINE:
    * `dot_micros / sqrt(na_micros · nb_micros)` where each factor is
    * an [[exactMicros]] integer (per-dim products rounded to micros,
    * then exact integer sums) — order-free across partitions and
    * exactly transliterable, unlike the plain rounded [[CosineSim]],
    * whose engine-specific accumulation order is 1-ulp exposed and
    * flips the 1e-6 floor on large pools (observed at sf1). Zero
    * vectors (norm micros 0) are the caller's bug, not handled. The
    * greedy score tree is `lam·rel − (1.0−lam)·maxSim` with
    * `maxSim = 0.0` for the first pick, the `1.0 − lam` subtraction
    * written unfolded (a pre-folded constant can be a different
    * double). Output `mmr` is floor-rounded at 1e-6; `rank` is the
    * selection order from 1. */
  def mmr(candidates: DataFrame, vectors: DataFrame, idCol: String,
      relCol: String, vecCol: String, lam: Double = 0.7, k: Int = 10,
      maxCandidates: Int = 4096): DataFrame = {
    require(lam >= 0.0 && lam <= 1.0, s"lam must be in [0, 1]: $lam")
    require(k >= 1, s"k must be positive: $k")
    val sp = candidates.sparkSession
    import sp.implicits._
    val cand = candidates.select(col(idCol).cast("long").as("__id"),
      col(relCol).cast("double").as("__rel"))
    // LEFT join so one evaluation answers everything (round 19: the old
    // inner-join form re-ran the ENTIRE candidate pipeline a second
    // time for a `cand.count()` coverage check — several extra job
    // waves per call): a candidate missing its vector survives as a
    // null __v row and fails the coverage require below; a duplicated
    // vector row duplicates its id and fails the distinctness require —
    // the same two failure modes the count equality caught.
    val cv = Caches.persistTracked(cand.join(
      vectors.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v")), Seq("__id"), "left"))
    val pool = cv.select(col("__id"), col("__rel"),
        col("__v").isNull.as("__miss")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    require(pool.length <= maxCandidates,
      s"MMR pool ${pool.length} exceeds $maxCandidates — MMR is a " +
        "bounded second-stage op; shrink the candidate list (refusing, " +
        "not truncating)")
    require(!pool.exists(_._3),
      "every candidate needs exactly one vector row")
    val relById = pool.map(p => p._1 -> p._2).toMap
    require(relById.size == pool.length,
      "candidate ids must be distinct")
    val a = cv.select(col("__id").as("__a"), col("__v").as("__va"))
    val b = cv.select(col("__id").as("__b"), col("__v").as("__vb"))
    val sims = a.crossJoin(broadcast(b))
      .filter(col("__a") =!= col("__b"))
      .select(col("__a"), col("__b"),
        graft.Det.r(
          exactMicros(col("__va"), col("__vb")).cast("double") /
            sqrt(exactMicros(col("__va"), col("__va")).cast("double") *
              exactMicros(col("__vb"), col("__vb")).cast("double")), 6)
          .as("__s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val remaining = scala.collection.mutable.SortedSet[Long](
      relById.keys.toSeq: _*)
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    while (selected.length < k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      // ascending id iteration + strict > keeps the LOWEST id on ties
      for (c <- remaining) {
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => sims((c, s._1))).max
        val score = lam * relById(c) - (1.0 - lam) * maxSim
        if (score > bestScore) { bestScore = score; bestId = c }
      }
      selected += ((bestId, bestScore))
      remaining -= bestId
    }
    selected.zipWithIndex.map { case ((id, s), i) =>
      (id, math.floor(s * 1e6 + 0.5) / 1e6, i + 1)
    }.toSeq.toDF(idCol, "mmr", "rank")
  }

  /** Exact-MIPS brute-force top-k under the SAME integer metric — the
    * recall reference for the re-rank gates (cosine would measure the
    * wrong thing: re-ranking is judged against the best possible result
    * of its own scoring function). */
  def exactTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micros").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score_micros", exactMicros(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score_micros"),
        col("rank"))
  }
}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused exact-MIPS integer scorer: `Σ_d micros(q_d·x_d)` over two
  * float vectors as one compact loop ([[VectorOps.dotMicros]]) — the
  * [[SqScoreExpr]] per-dim tree without the affine code fold, so the
  * re-rank pass and its DuckDB oracle compute the identical integers.
  * Codegen'd via the static kernel (round 20 — CodegenFallback split
  * the re-rank stage's WSCG span). */
case class ExactDotMicrosExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "exact_dot_micros"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires two array<float> inputs, got $other")
    }

  override def nullSafeEval(q: Any, x: Any): Any =
    VectorOps.dotMicros(q.asInstanceOf[ArrayData], x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, x) =>
      s"graft.pipeline.VectorOps.dotMicros($q, $x)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ExactDotMicrosExpr = copy(left = l, right = r)
}
