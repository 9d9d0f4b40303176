package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 query scoring (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework"; the `+1` idf form is the
  * always-positive variant Lucene standardized). The retrieval twin of
  * [[graft.operators.PipelineQueries]]'s `doc_tfidf` corpus statistics:
  * given a FIXED small query-term set, score every document.
  *
  * Shape at any scale: per-term tf is a doc-LOCAL `filter` over the
  * whitespace token array — no gram explode, no per-term shuffle. The
  * corpus statistics the formula needs (N, Σdl, per-term df) are ONE
  * partially-aggregated scalar row, broadcast back with a cross join; the
  * only other exchange is the caller's top-k (a TakeOrdered, not a sort).
  * So: one scan + one scalar aggregate, regardless of corpus size — the
  * right plan when |query| is small. For arbitrary-vocabulary scoring the
  * inverted-index build (`doc_tfidf`'s explode + two aggs) is the scale
  * path, and this operator composes with it unchanged.
  *
  * Cross-engine determinism: every stored statistic is an exact integer;
  * doubles appear only in the final per-doc formula, whose operand ORDER
  * is part of the contract (contributions summed left-associatively in
  * query order) so an oracle writing the same tree gets bit-identical
  * IEEE-754 results before the deterministic rounding.
  */
object Bm25 {

  /** Score `docs` against `query` terms; returns `idCol, dl, score`
    * (score UN-rounded — gates round with [[graft.Det.r]]).
    * NULL texts are dropped; `dl` is the whitespace word count of the
    * normalized text. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(query == query.distinct, "query terms must be distinct")
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0, 1]")
    // guard the OUTPUT names too (LmScore/Dsir discipline): an input
    // already carrying dl/score, or idCol named dl/score, would emit a
    // frame with duplicate column names — a silent downstream trap
    val reserved = Seq("__ws", "__dl", "__n", "__sumdl", "dl", "score") ++
      query.indices.flatMap(i => Seq(s"__tf$i", s"__df$i"))
    val clash = docs.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns clash with internals/outputs: $clash")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' clashes with the output/internal columns")

    val words = split(Decontaminate.normCol(col(textCol)), " ")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), words.as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
    // The projected tf table (id, dl, tf_i — ~5 longs/doc) feeds BOTH
    // the stats aggregate and the per-doc scoring pass; without a
    // persist Catalyst plans two full text scans + splits (column
    // pruning differentiates the subtrees, so exchange reuse cannot
    // collapse them). Persisting the narrow projection keeps the
    // expensive text pass single — Caches-registered, evicted at the
    // caller's release point.
    val withTf = Caches.persistTracked(
      query.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
        df.withColumn(s"__tf$i",
          size(filter(col("__ws"), w => w === lit(t))).cast("long"))
      }.drop("__ws"))

    val statCols = Seq(count(lit(1)).as("__n"),
      sum(col("__dl")).as("__sumdl")) ++ query.indices.map(i =>
      sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)

    val joined = withTf.crossJoin(broadcast(stats))
    val statCols_ = (col("__n"), col("__sumdl"),
      query.indices.map(i => col(s"__df$i")))
    joined.select(col(idCol), col("__dl").as("dl"),
      scoreExpr(query.indices.map(i => col(s"__tf$i")), col("__dl"),
        statCols_._1, statCols_._2, statCols_._3, k1, b).as("score"))
  }

  /** The BM25 formula as one Column tree. Operand order is the contract
    * — ((idf * (tf * (k1+1))) / (tf + k1 * ((1-b) + (dl * b) / avgdl))),
    * contributions summed left-associatively in query order — so an
    * oracle (or a streaming twin feeding the SAME statistics as
    * literals) derives bit-identical IEEE doubles before rounding.
    * All inputs are integer Columns. */
  private[graft] def scoreExpr(tfs: Seq[Column], dl: Column, n: Column,
      sumdl: Column, dfs: Seq[Column], k1: Double, b: Double): Column = {
    val nD = n.cast("double")
    val avgdl = sumdl.cast("double") / nD
    val contribs: Seq[Column] = tfs.indices.map { i =>
      val tf = tfs(i).cast("double")
      val dfT = dfs(i).cast("double")
      val idf = log(lit(1.0) + (nD - dfT + 0.5) / (dfT + 0.5))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + (dl.cast("double") * b) / avgdl))
    }
    contribs.reduceLeft(_ + _)
  }

  /** Doc-local per-term tf counts over the normalized whitespace tokens
    * — shared by the batch scorer and the streaming twin. */
  private[graft] def tfCols(textCol: String,
      query: Seq[String]): Seq[Column] = {
    val words = split(Decontaminate.normCol(col(textCol)), " ")
    query.map(t => size(filter(words, w => w === lit(t))).cast("long"))
  }

  /** Retrieval form: positive-scoring docs, top `k` by (score desc, id) —
    * rounded via [[graft.Det.r]] so gate and oracle compare equal. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    score(docs, idCol, textCol, query, k1, b)
      .withColumn("score", graft.Det.r(col("score"), 6))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Arbitrary-vocabulary batch scoring — the inverted-index scale path
    * the fixed-query [[score]] defers to: a query TABLE
    * `(query_id, term)` runs against the corpus in ONE term explode.
    *
    * Shape at any scale (the [[Search.conjunctiveJoin]] discipline):
    * per-doc terms explode map-side and the broadcast query-term
    * semi-join discards every non-query term BEFORE the exchange, so
    * shuffled rows are bounded by (matching doc, query term) hits —
    * never corpus × vocabulary. Corpus stats are one scalar aggregate
    * (N, Σdl) plus a per-query-term df aggregate over the already-
    * pruned hit table; both broadcast back.
    *
    * Determinism contract: with MANY terms per (doc, query) group the
    * fixed-order left-associative double sum of [[scoreExpr]] is not
    * available (groupBy sum order is partition-dependent), so each
    * per-term contribution — the same IEEE tree as [[scoreExpr]], all
    * integer inputs — is rounded to integer MICROS first and the group
    * sum is exact integer arithmetic, order-free across partitions and
    * engines (the [[Rerank.exactMicros]] discipline). Returns
    * `(query_id, idCol, score_micros, rank)` with `rank ≤ topK` per
    * query, ties to the lowest id; docs sharing no term with a query
    * never appear. */
  def topKMany(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, topK: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(queries.columns.toSet == Set("query_id", "term"),
      "queries must have exactly (query_id, term)")
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0, 1]")
    require(!Set("query_id", "term", "score_micros", "rank", "__tf",
        "__dl", "__n", "__sumdl", "__df", "__c").contains(idCol),
      s"idCol '$idCol' clashes with join internals")
    val qTerms = queries.distinct()
    val words = split(Decontaminate.normCol(col(textCol)), " ")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), words.as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
    // (doc, term, tf) for QUERY terms only: explode after the doc-local
    // projection, semi-join the broadcast term set before the exchange
    val hits = Caches.persistTracked(base
      .select(col(idCol), col("__dl"), explode(col("__ws")).as("term"))
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"),
        "left_semi")
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("__tf")))
    val stats = base.agg(count(lit(1)).as("__n"),
      sum(col("__dl")).as("__sumdl"))
    val dfs = hits.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val contrib = hits
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), Seq("term"))
      .withColumn("__c",
        floor(scoreExpr(Seq(col("__tf")), col("__dl"), col("__n"),
          col("__sumdl"), Seq(col("__df")), k1, b) * 1000000.0 + 0.5)
          .cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micros").desc, col(idCol).asc)
    contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__c")).as("score_micros"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col(idCol), col("score_micros"),
        col("rank"))
  }
}
