package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-unigram log-probability scoring — the shape of CCNet's
  * language-model perplexity filter (Wenzek et al. 2020 §3.3) with the
  * corpus's own unigram distribution standing in for the external LM
  * (no model weights ship in a SQL engine; swap the frequency table for
  * a real LM's unigram logprobs and nothing else changes). Documents
  * whose tokens are corpus-typical score high; keyword soup, rare-token
  * noise, and wrong-language text score low — the standard
  * quality-partition signal next to the rule-based and compression
  * filters.
  *
  * Determinism contract: per-term log-probabilities are rounded to
  * integer MICROS once (`floor(ln(freq/total)·1e6 + 0.5)` — identical
  * IEEE ops both engines), then every downstream step is exact integer
  * arithmetic — per-doc sums are order-free (integer addition commutes
  * exactly), so the gate hashes identically however partials interleave.
  *
  * Scale shape: the exploded term stream feeds both the frequency
  * aggregate and the probe join (recomputed per consumer — see the
  * cache A/B note in the body), then the per-doc rollup. The
  * vocabulary total rides a broadcast scalar row.
  */
object LmScore {

  /** Per-document unigram surprisal: `(idCol, n_tokens,
    * lp_micros)` where `lp_micros = Σ_tokens micros(ln P(token))` —
    * more negative ⇒ more surprising under the corpus distribution. */
  def unigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val reserved = Seq("__term", "__freq", "__total", "__lpm")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"input columns clash with internals: $clash")
    require(idCol != "n_tokens" && idCol != "lp_micros" && idCol != "__term",
      s"idCol '$idCol' clashes with the output/internal columns")
    // The frequency aggregate and the probe join shuffle on DIFFERENT
    // projections of the term stream ((__term) vs (id, __term)), so
    // exchange reuse never applies and the normalize+split+explode text
    // pass runs TWICE — deliberately (round 19): an A/B with the stream
    // persisted measured the columnar cache encode+decode and its extra
    // materialization wave costing MORE than the second pass (12.8 →
    // 20.2 task-CPU-s at sf0.1), and at corpus scale caching a
    // token-exploded stream spills ~1.5× the corpus to disk where the
    // re-scan reads compressed parquet. Recompute is the cheaper leg on
    // both ends once the pass itself is one regex + codegen'd split.
    val terms = Decontaminate.spreadSmall(
        df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol),
        explode(split(Decontaminate.normCol(col(textCol)), " "))
          .as("__term"))
    val freqs = terms.groupBy(col("__term"))
      .agg(count(lit(1)).as("__freq"))
    val total = freqs.agg(sum(col("__freq")).as("__total"))
    val lp = freqs.crossJoin(broadcast(total))
      .select(col("__term"),
        floor(log(col("__freq").cast("double") /
          col("__total").cast("double")) * 1000000.0 + lit(0.5))
          .cast("long").as("__lpm"))
    terms.join(lp, Seq("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lpm")).as("lp_micros"))
  }

  /** Per-document INTERPOLATED BIGRAM log-probability — one Markov order
    * up from [[unigramLogProb]], the actual model class CCNet's
    * perplexity filter uses (an n-gram LM, Wenzek et al. 2020 §3.3),
    * with Jelinek–Mercer interpolation against the unigram distribution
    * so unseen-history bigrams stay finite without external smoothing
    * tables:
    *
    *   P(w2 | w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/total
    *
    * Returns `(idCol, n_bigrams, lp2_micros)` where `lp2_micros =
    * Σ_bigrams micros(ln P(w2|w1))`. Docs with fewer than two tokens
    * emit no row (they have no bigram evidence — callers treat absence
    * as "unscorable", the same contract as empty-text docs upstream).
    *
    * Determinism contract (the [[unigramLogProb]] pins, one order up):
    * each bigram's probability is ONE fixed-association double tree —
    * `λ·(cb/cu) + (1−λ)·(cw/total)` with every count cast to double
    * first — rounded to integer micros once, then per-doc sums are
    * exact integer arithmetic, order-free across partitions. The DuckDB
    * oracle twin transliterates the identical tree.
    *
    * Scale shape: the normalized-text projection feeds the unigram
    * aggregate, the bigram count aggregate and the per-doc probe join
    * (recomputed per consumer — see the cache A/B note in the body);
    * gram streams are codegen'd WordGramsExpr byte passes, not the old
    * per-bigram struct lambda. The unigram table joins attach to the
    * DISTINCT bigram side (vocabulary-sized, not corpus-sized), and
    * the vocabulary total rides a broadcast scalar row. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"lambda must be in (0, 1) so both mixture legs stay live: $lambda")
    val reserved = Seq("__ws", "__e", "__nrm", "__w1", "__w2", "__bi",
      "__cb", "__cu", "__cw", "__total", "__lpm")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"input columns clash with internals: $clash")
    require(!reserved.contains(idCol) && idCol != "n_bigrams" &&
      idCol != "lp2_micros",
      s"idCol '$idCol' clashes with the output/internal columns")
    // The unigram aggregate, the bigram count aggregate and the probe
    // join each consume a different projection of the token/bigram
    // stream, so exchange reuse never applies and the normalization
    // runs per consumer — deliberately left UNPERSISTED (round 19):
    // the cache A/B on this operator read 22.2 → 35.4 task-CPU-s
    // (columnar encode+decode plus an extra materialization wave beats
    // re-running one regex + codegen'd WordGramsExpr byte passes), and
    // a cached normalized-text projection at corpus scale spills
    // text-sized blocks where the re-scan reads compressed parquet.
    val toks = Decontaminate.spreadSmall(
        df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol),
        Decontaminate.normCol(col(textCol)).as("__nrm"))
    // corpus unigram table + total (token-key exchange, vocab-sized out)
    val unis = toks
      .select(explode(Decontaminate.wordGrams(col("__nrm"), 1)).as("__w1"))
      .groupBy(col("__w1")).agg(count(lit(1)).as("__cu"))
    val total = unis.agg(sum(col("__cu")).as("__total"))
    // scan-side bigram stream: every adjacent pair as ONE space-joined
    // string (docs with < 2 tokens yield the empty gram array — the old
    // size(__ws) >= 2 filter, by construction)
    val bis = toks.select(col(idCol),
      explode(Decontaminate.wordGrams(col("__nrm"), 2)).as("__bi"))
    // a distinct bigram string determines (w1, w2) — tokens carry no
    // spaces, so the halves split back out losslessly AFTER the
    // vocab-sized aggregate, keeping the exchange key narrow and the
    // unigram attachments plain equi-joins
    val bcnt = bis.groupBy(col("__bi")).agg(count(lit(1)).as("__cb"))
      .select(substring_index(col("__bi"), " ", 1).as("__w1"),
        substring_index(col("__bi"), " ", -1).as("__w2"),
        col("__bi"), col("__cb"))
    // per-distinct-bigram interpolated logprob, micros-rounded ONCE
    val lp = bcnt
      .join(unis, Seq("__w1"))
      .join(unis.select(col("__w1").as("__w2"), col("__cu").as("__cw")),
        Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col("__bi"),
        floor(log(lit(lambda) *
            (col("__cb").cast("double") / col("__cu").cast("double")) +
          lit(1.0 - lambda) *
            (col("__cw").cast("double") / col("__total").cast("double")))
          * 1000000.0 + lit(0.5)).cast("long").as("__lpm"))
    bis.select(col(idCol), col("__bi")).join(lp, Seq("__bi"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__lpm")).as("lp2_micros"))
  }
}
