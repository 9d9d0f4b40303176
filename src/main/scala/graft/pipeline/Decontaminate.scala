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

  /** Whitespace-collapse + lowercase as a codegen'd column expression.
    *
    * The whitespace class is EXPLICIT — `[ \t\n\x0B\f\r]` — because the
    * two engines' `\s` shorthands disagree at the edges (Java `\s` has
    * `\x0B`, RE2's does not) and a gate would diverge on exactly the
    * text neither side controls; the DuckDB twin uses the same literal
    * class: `trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ',
    * 'g'))`. Deliberately ASCII-only: [[TextHash.normalize]] — the hash
    * families' normalization — additionally folds
    * `Character.isWhitespace` extras (`\x1C`-`\x1F`, Unicode space
    * separators), a superset that agrees with this class on ASCII text;
    * the SQL-oracled gates use THIS column form on both sides, so the
    * difference never reaches a gate. */
  def normCol(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Unlock cores on effectively-unsplittable inputs. A parquet file
    * scans with at most one task PER ROW GROUP no matter what
    * maxPartitionBytes says (byte-range splits of a single row group are
    * phantom parallelism: only the split holding the row-group midpoint
    * reads any data), so an operator that does its CPU work scan-side —
    * per-doc gram builds, window hashing — serializes on a handful of
    * cores whenever few-file/few-row-group inputs meet a wide cluster
    * (sf1 measured doc_repetition at 57 s on a one-row-group file).
    *
    * The guard reads the EFFECTIVE scan parallelism, not the planned
    * split count: when the input is a file scan with fewer files than
    * cores, it opens those few footers and totals their row groups; if
    * that total is below the cluster's parallelism, one small shuffle of
    * the input rows spreads them. Everything else is a no-op by
    * construction — more files than cores (any real 100 TB table) never
    * reaches the footer probe, and a derived (non-scan) input returns
    * untouched, deliberately: probing its partitioning would have to
    * materialize the plan (`df.rdd` under AQE executes every upstream
    * shuffle just to report a partition count — double execution for a
    * caller whose train side contains a join). */
  def spreadSmall(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical
    // only a plain scan (filters/projections over a relation) qualifies:
    // anything with its own exchange upstream — repartition, join,
    // aggregate — already spread or is the caller's to lay out, and
    // inputFiles alone can't tell the difference
    def scanShaped(pl: logical.LogicalPlan): Boolean = pl match {
      case _: logical.Filter | _: logical.Project |
           _: logical.SubqueryAlias => pl.children.forall(scanShaped)
      case leaf if leaf.children.isEmpty => true
      case _ => false
    }
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= p ||
      !files.forall(_.endsWith(".parquet")) ||
      !scanShaped(df.queryExecution.analyzed)) df
    else {
      val conf = sc.hadoopConfiguration
      val rowGroups: Option[Long] =
        try Some(files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size.toLong finally r.close()
        }.sum)
        catch { case _: Exception => None } // unreadable: leave as-is
      if (rowGroups.exists(_ < p)) df.repartition(p, key) else df
    }
  }

  /** All word `n`-grams of a normalized text column, space-joined, in
    * document order (possibly with duplicates — callers distinct() as
    * needed). Texts with fewer than `n` words yield the empty array.
    *
    * One codegen'd byte pass ([[WordGramsExpr]], round 19): the previous
    * `transform(sequence(…), i -> array_join(slice(words, i, n), ' '))`
    * formulation ran an interpreted lambda per gram with a slice array
    * and a join buffer each — the dominant task time of every
    * gram-shaped operator. Values (including the `< n` words → empty
    * and null → empty edge cases) are byte-identical. */
  def wordGrams(norm: Column, n: Int): Column =
    TextFunctions.word_grams(norm, n)

  /** Per-train-document contamination counts against `eval`'s distinct
    * word `n`-gram set: `(id, n_grams, n_hit)` for every train document
    * with at least one colliding gram, where `n_grams` counts the doc's
    * DISTINCT grams and `n_hit` how many of those appear anywhere in the
    * eval corpus. Downstream drops rows above a hit-ratio threshold.
    *
    * `hashed = true` probes on `xxhash64(gram)` instead of the gram
    * string: the broadcast set and every probe key shrink to 8 bytes
    * (~6x on word 5-grams), which is the shape to run at corpus scale —
    * a hash collision can only OVERcount a doc's n_hit (never miss
    * one), at ~2^-64 per (gram, eval-gram) pair, the safe direction for
    * a leak control. The gate uses the exact-string form so DuckDB can
    * reproduce it byte-for-byte. */
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

  /** Inter-source content-overlap matrix: for every pair of sources, the
    * number of distinct word `n`-grams they share — the "who copies
    * whom" diagnostic a corpus audit runs before mixing sources (the
    * pairwise generalization of [[overlap]]'s train/eval probe).
    *
    * ONE corpus-wide exchange: per-doc distinct grams explode map-side
    * into `groupBy(gram).collect_set(source)` — partial aggregation
    * dedups sources map-side, and every set is bounded by the number of
    * sources, so ubiquitous grams cannot skew a reducer. Pair expansion
    * then runs on single-gram rows (≤ |sources|² each) and the final
    * rollup moves ≤ C(|sources|, 2) rows. For domain-granular strata
    * (millions of sources) cap gram document-frequency first, the same
    * df-cap discipline [[Dedup.winnowPairs]] applies. Rows with a NULL
    * source contribute no pairs (`collect_set` skips nulls). */
  def sourceOverlapMatrix(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val sets = spreadSmall(df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(sourceCol).as("__src"),
        explode(array_distinct(wordGrams(normCol(col(textCol)), n)))
          .as("__gram"))
      .groupBy(col("__gram"))
      .agg(array_sort(collect_set(col("__src"))).as("__ss"))
      .filter(size(col("__ss")) > 1)
    sets.select(explode(col("__ss")).as("source_a"), col("__ss"))
      .select(col("source_a"), explode(col("__ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
