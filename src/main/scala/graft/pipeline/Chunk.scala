package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window token chunking — the context-window splitting step of
  * pretraining data prep: each document's token stream becomes
  * `ceil((n - max) / (max - overlap)) + 1` chunks of up to `maxTokens`
  * tokens, consecutive chunks sharing `overlap` tokens of context (the
  * "stride" convention of BERT/GPT-2 style preprocessing; RoBERTa §4.1
  * and the HF `return_overflowing_tokens` contract use the same
  * arithmetic). Chunk `i` covers tokens `[i·step, min(i·step + max, n))`
  * with `step = max − overlap`; the final chunk is the only one allowed
  * to run short, and every token belongs to at least one chunk.
  *
  * Shape at any scale: entirely DOC-LOCAL — one scan, a per-row
  * `transform`/`posexplode` over the whitespace token array, ZERO
  * exchanges; output size is a deterministic function of input lengths
  * (bounded ≤ `max/step`× token amplification). Tokens are the
  * whitespace words of [[Decontaminate.normCol]], the same portable
  * normalization the gram operators use, so the gate takes a full
  * DuckDB hash oracle.
  */
object Chunk {

  /** Explode `textCol` into `(idCol, chunk_id, n_tokens, chunk)` rows.
    * NULL texts yield no rows (there is nothing to train on); an empty
    * text yields one empty chunk (its token array is [""], mirroring
    * the split semantics both engines share). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val step = maxTokens - overlap
    val words = split(Decontaminate.normCol(col(textCol)), " ")
    val n = size(words)
    // 1 chunk when n <= max; afterwards one more per started step
    val nChunks = when(n <= maxTokens, lit(1L))
      .otherwise(ceil((n - maxTokens).cast("double") / step) + 1L)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), words.as("__ws"), nChunks.as("__k"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), col("__k") - 1L),
        i => slice(col("__ws"), (i * step + 1L).cast("int"), lit(maxTokens))))
        .as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk"))
  }
}
