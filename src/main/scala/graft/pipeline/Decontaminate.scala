package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus n-gram decontamination: flag training documents sharing
  * word n-grams with an evaluation/benchmark corpus.
  *
  * This is the train/test-leak control every large-scale training-data
  * pipeline runs before a corpus ships (the published recipe: exact word
  * 8-to-13-gram collision against the benchmark set — GPT-3 appendix C,
  * PaLM §6.2, The Pile §6.3; the reference server has no analogue — this
  * is north-star pipeline scope, like Dedup/Similarity).
  *
  * Shape for 100 TB: the EVAL side is always small (benchmarks are
  * thousands of documents, not billions), so its distinct-gram set is
  * broadcast — the train side is a single scan + per-partition hash
  * probe, no shuffle of train grams at all. The per-doc gram explode is
  * map-side; the only shuffle is the final per-doc aggregate, keyed by
  * doc id (pre-aggregated per partition). At petabyte scale swap the
  * broadcast array for a bloom filter built from the same gram set (one
  * false-positive-rate knob away; the exact set is kept here because the
  * gate demands exact counts).
  *
  * Determinism: grams are exact strings of the whitespace-normalized,
  * lowercased text — no hashing, no seeds — so the whole operator is
  * reproducible in ANSI SQL and the gate takes a full hash oracle.
  */
object Decontaminate {

  /** Whitespace-collapse + lowercase, the corpus-wide normalization
    * convention (TextHash.normalize as a codegen'd column expression;
    * DuckDB twin: `trim(regexp_replace(lower(text), '\s+', ' ', 'g'))`). */
  def normCol(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Unlock cores on unsplittable inputs. A small parquet file with one
    * row group scans as ONE task no matter what maxPartitionBytes says
    * (Spark assigns whole row groups), so an operator that does its CPU
    * work scan-side — per-doc gram builds, window hashing — serializes on
    * a single core at gate/bench scale (sf1 measured doc_repetition at
    * 57 s that way). When the scan's planned parallelism is below the
    * cluster's, spend one small shuffle of the input rows to spread
    * them; on any real multi-split table (the 100 TB case) the condition
    * never fires and NO shuffle is added. */
  def spreadSmall(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism, key)
    else df
  }

  /** All word `n`-grams of a normalized text column, space-joined, in
    * document order (possibly with duplicates — callers distinct() as
    * needed). Texts with fewer than `n` words yield the empty array
    * (guarded: Spark's `sequence(1, 0)` would DESCEND, not return empty). */
  def wordGrams(norm: Column, n: Int): Column = {
    val words = split(norm, " ")
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-train-document contamination counts against `eval`'s distinct
    * word `n`-gram set: `(id, n_grams, n_hit)` for every train document
    * with at least one colliding gram, where `n_grams` counts the doc's
    * DISTINCT grams and `n_hit` how many of those appear anywhere in the
    * eval corpus. Downstream drops rows above a hit-ratio threshold. */
  /** As `overlap`, with `hashed = true` probing on `xxhash64(gram)`
    * instead of the gram string: the broadcast set and every probe key
    * shrink to 8 bytes (~6x on word 5-grams), which is the shape to run
    * at corpus scale — a hash collision can only OVERcount a doc's
    * n_hit (never miss one), at ~2^-64 per (gram, eval-gram) pair, the
    * safe direction for a leak control. The gate uses the exact-string
    * form so DuckDB can reproduce it byte-for-byte. */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, hashed: Boolean = false): DataFrame = {
    // per-doc DISTINCT grams doc-locally (array_distinct before the
    // explode): (id, gram) is then unique by construction, so no
    // corpus-wide distinct() — that would shuffle every train gram once
    // more for a dedup the array already did
    def grams(df: DataFrame): DataFrame = {
      val g = df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("__id"),
          explode(array_distinct(wordGrams(normCol(col(textCol)), n)))
            .as("__gram"))
      if (hashed) g.select(col("__id"), xxhash64(col("__gram")).as("__gram"))
      else g
    }
    // distinct eval grams, broadcast: the benchmark side is small by
    // construction at any corpus scale
    val evalGrams = grams(eval).select(col("__gram")).distinct()
      .withColumn("__hit", lit(1L))
    // one scan of train -> map-side explode -> broadcast probe -> the
    // single shuffle is the per-doc aggregate (partials collapse it);
    // spreadSmall only fires on unsplittable single-file inputs
    grams(spreadSmall(train, col(idCol)))
      .join(broadcast(evalGrams), Seq("__gram"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .filter(col("n_hit") > 0L)
      .select(col("__id").as(idCol), col("n_grams"), col("n_hit"))
  }
}
