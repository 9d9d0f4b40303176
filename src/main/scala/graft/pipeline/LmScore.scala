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
  * Scale shape: explode → ONE term-key exchange that Catalyst REUSES for
  * both the frequency aggregate and the probe join (same child, same
  * partitioning), then the per-doc rollup. The vocabulary total rides a
  * broadcast scalar row.
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
}
