package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level heuristic quality rules — the C4 / Gopher filter bank
  * every pretraining corpus passes through before dedup and mixing
  * (Raffel et al. 2020 §2.2; Rae et al. 2021 §A1.1; re-derived here from
  * the published rule lists, not any implementation). The complement of
  * [[graft.operators.PipelineQueries]]'s `doc_repetition` gate: repetition
  * rules reject self-similar text, these reject text whose *surface
  * statistics* say it is not prose — too short/long, degenerate word
  * lengths, no function words, symbol soup.
  *
  * Every metric is doc-LOCAL, computed with higher-order array functions
  * over the whitespace token array of [[Decontaminate.normCol]] — one
  * scan, zero exchanges; the caller's aggregate is the plan's only
  * shuffle. All stored metrics are exact integers (sums and counts, never
  * pre-divided doubles) so downstream gates hash identically across
  * engines; ratios are derived at comparison time from identical integer
  * operands, which makes the threshold comparisons portable too (one
  * IEEE-754 division of equal operands on both sides).
  *
  * Rules (first failing rule wins, in this order — the order is part of
  * the contract since the gate reports per-reason populations):
  *  1. `words`   — word count outside [minWords, maxWords]
  *  2. `wordlen` — mean word length outside [minMeanLen, maxMeanLen]
  *  3. `stop`    — fewer than minStopHits occurrences of the stopword list
  *  4. `alpha`   — fraction of words containing a letter below minAlphaFrac
  *  5. `symbol`  — fraction of hash/ellipsis/brace words above maxSymbolFrac
  */
object QualityRules {

  /** Gopher's 8 function words (Rae et al. §A1.1), plus "a"/"an" from the
    * C4 heuristics — presence of ANY small closed-class set separates
    * prose from keyword soup; the exact list is a parameter, this is the
    * default the gates pin. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "with", "that", "be", "have")

  /** Add exact-integer surface metrics for `textCol`:
    * `n_words`, `sum_word_len`, `n_stop_hits` (occurrences, not distinct),
    * `n_alpha_words`, `n_symbol_words`. NULL texts are dropped (nothing
    * to measure); empty texts yield `n_words = 1` over the empty token,
    * mirroring the split semantics every other text operator shares. */
  def withDocMetrics(df: DataFrame, textCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    require(stopwords.nonEmpty, "stopword list must be non-empty")
    // refuse silent clobbering of caller columns (withColumn REPLACES
    // same-named columns — the Sample/Bloom review-finding class)
    val reserved = Seq("__ws", "n_words", "sum_word_len", "n_stop_hits",
      "n_alpha_words", "n_symbol_words")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"input columns clash with metrics: $clash")
    val words = split(Decontaminate.normCol(col(textCol)), " ")
    val stopArr = array(stopwords.map(lit): _*)
    df.filter(col(textCol).isNotNull)
      .withColumn("__ws", words)
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("sum_word_len",
        aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("n_stop_hits",
        size(filter(col("__ws"), w => array_contains(stopArr, w)))
          .cast("long"))
      .withColumn("n_alpha_words",
        size(filter(col("__ws"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_symbol_words",
        size(filter(col("__ws"), w =>
          w.startsWith("#") || w.contains("...") || w.contains("{")))
          .cast("long"))
      .drop("__ws")
  }

  /** Classify each document: metrics plus a `reason` column — the first
    * failing rule's tag, or "keep". Thresholds default to the published
    * C4/Gopher values. */
  def classify(df: DataFrame, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopHits: Long = 2L, minAlphaFrac: Double = 0.8,
      maxSymbolFrac: Double = 0.1,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    require(!df.columns.contains("reason"),
      "input already has a 'reason' column; rename it before classify")
    val m = withDocMetrics(df, textCol, stopwords)
    val nw = col("n_words").cast("double")
    val meanLen = col("sum_word_len").cast("double") / nw
    m.withColumn("reason",
      when(col("n_words") < minWords || col("n_words") > maxWords, "words")
        .when(meanLen < minMeanLen || meanLen > maxMeanLen, "wordlen")
        .when(col("n_stop_hits") < minStopHits, "stop")
        .when(col("n_alpha_words").cast("double") / nw < minAlphaFrac,
          "alpha")
        .when(col("n_symbol_words").cast("double") / nw > maxSymbolFrac,
          "symbol")
        .otherwise("keep"))
  }

  /** The filter itself — what a pipeline composes: keep-only rows, metric
    * columns dropped. */
  def keepClean(df: DataFrame, textCol: String): DataFrame =
    classify(df, textCol).filter(col("reason") === "keep")
      .drop("reason", "n_words", "sum_word_len", "n_stop_hits",
        "n_alpha_words", "n_symbol_words")
}
