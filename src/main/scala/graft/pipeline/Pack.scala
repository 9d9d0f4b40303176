package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing — the context-window bin-packing step that
  * turns a filtered/deduped corpus into fixed-budget training sequences
  * (the "packing" of GPT-style pretraining; Raffel et al. 2020 §2.4 and
  * the T5/LLM data pipelines pack documents contiguously up to the model
  * context length). Each stratum's documents are walked in ascending id
  * order with a running token fill; a document that would overflow
  * `budget` starts a new bin, and an oversized document occupies a bin
  * alone (chunk it first with [[Chunk.chunkTokens]] if splitting is
  * wanted — the two operators compose).
  *
  * Packing is inherently ORDER-SENSITIVE, so the distributed contract is
  * the one production pipelines use: bins are formed per stratum (shard),
  * never across strata, and the stratum is the unit of parallelism. The
  * plan is ONE hash exchange on the stratum key, then a single
  * sequential walk per stratum inside `mapPartitions` — the genuinely
  * imperative per-partition case the DataFrame API cannot express, kept
  * to exactly one narrow stage. Downstream aggregates keyed by
  * `(stratum, bin)` need their own exchange (the object boundary hides
  * the partitioning from Catalyst) — at 100 TB that aggregate is over
  * bins, ~budget× smaller than the corpus.
  *
  * The recurrence (`bin 0, fill = tokens` at a stratum's first doc;
  * overflow ⇒ `bin + 1, fill = tokens`; else `fill += tokens`) is the
  * whole contract — an oracle replaying it sequentially (e.g. a SQL
  * recursive CTE) reproduces bin ids exactly, which is what the
  * `doc_pack` gate hash-checks.
  */
object Pack {

  /** Append a 0-based `bin` column assigning each row of `df` to its
    * stratum-local bin. `tokensCol` must be a LONG (cast upstream);
    * rows are packed in ascending `idCol` order within `stratumCol`.
    * The result is deterministic and independent of the session's
    * partitioning (each stratum is packed by exactly one task). */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      stratumCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!df.columns.contains("bin"),
      "input already has a 'bin' column; rename it before packing")
    val schema = StructType(df.schema.fields :+
      StructField("bin", LongType, nullable = false))
    val stIdx = df.schema.fieldIndex(stratumCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val tkIdx = df.schema.fieldIndex(tokensCol)
    require(df.schema(tkIdx).dataType == LongType,
      s"$tokensCol must be LONG, found ${df.schema(tkIdx).dataType}")
    df.repartition(col(stratumCol))
      .sortWithinPartitions(col(stratumCol), col(idCol))
      .mapPartitions { rows =>
        // a boolean tracks the "no stratum yet" state (null is a legal
        // stratum value, so no sentinel value can be distinct from all)
        var started = false
        var cur: Any = null
        var fill = 0L
        var bin = 0L
        rows.map { r =>
          val st = r.get(stIdx)
          // fail loudly instead of NPE-ing inside codegen: a null token
          // count means the caller forgot to filter/derive upstream
          if (r.isNullAt(tkIdx))
            throw new IllegalArgumentException(
              s"null token count at ${r.get(idIdx)}; filter or coalesce " +
                "the tokens column before packing")
          val tk = r.getLong(tkIdx)
          if (!started || st != cur) {
            started = true; cur = st; bin = 0L; fill = tk
          } else if (fill + tk > budget) {
            bin += 1L; fill = tk
          } else {
            fill += tk
          }
          Row.fromSeq(r.toSeq :+ bin)
        }
      }(Encoders.row(schema))
      .toDF(schema.fieldNames: _*)
  }

  /** Per-bin summary — what a training job reads: one row per
    * `(stratum, bin)` with its document count and token fill. */
  def binStats(packed: DataFrame, idCol: String, tokensCol: String,
      stratumCol: String): DataFrame =
    packed.groupBy(col(stratumCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("bin_tokens"),
        sum(col(idCol)).as("id_checksum"))
}
