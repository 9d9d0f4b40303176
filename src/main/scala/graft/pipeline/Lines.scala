package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level duplicate-LINE removal — the boilerplate scrubber of
  * web-corpus assembly (C4, Raffel et al. 2020 §2.2 dedupe "any
  * three-sentence span occurring more than once"; RefinedWeb and Gopher
  * run the same rule at line granularity to strip navigation chrome,
  * cookie banners, and subscribe footers that repeat across millions of
  * pages). A line occurring at more than one (doc, position) in the
  * corpus keeps exactly its FIRST occurrence — minimum (doc id, position)
  * lexicographically, the same owner convention as
  * [[Dedup.substringDup]] — and every other occurrence is deleted from
  * its document; lines shorter than `minLineLen` after trimming never
  * participate (blank separators and one-word bullets repeat naturally
  * and are not boilerplate evidence).
  *
  * Shape for 100 TB — the corpus itself never shuffles:
  *   1. one scan, map-side split + explode of eligible lines;
  *   2. ONE exchange of line keys (map-side combined by the partial
  *      aggregate) to find each duplicated line's count and winner;
  *   3. losers (non-winner occurrences of duplicated lines) collapse to
  *      a per-doc drop-position set — sized by the corpus's boilerplate
  *      mass, a small fraction of rows, so the join back onto the
  *      corpus broadcasts under AQE and the rebuild is doc-local (an
  *      indexed array filter, no second corpus exchange). A corpus
  *      that is MOSTLY boilerplate degrades to a shuffle join — still
  *      linear, just no longer broadcast.
  *
  * `hashed = true` keys step 2 on `xxhash64(line)` instead of the line
  * string (8-byte exchange keys — the corpus-scale shape); a collision
  * can only OVERdelete (two distinct lines merging their occurrence
  * lists), at ~2^-64 per line pair — the same overcount-only trade as
  * [[Decontaminate.overlap]]'s hashed probe. The gate runs the exact
  * form so DuckDB reproduces it byte-for-byte; PipelineSpec certifies
  * hashed ≡ exact on the fixture corpus.
  */
object Lines {

  /** Remove all non-first occurrences of corpus-duplicated lines from
    * `textCol` (rewritten in place; schema otherwise unchanged).
    *
    * @param sep        line separator, treated literally (default "\n")
    * @param minLineLen lines with trimmed length below this always stay
    * @param hashed     key the duplicate search on xxhash64(line)
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minLineLen: Int = 10,
      hashed: Boolean = false): DataFrame = {
    require(minLineLen >= 1, "minLineLen must be >= 1")
    val internals = Seq("__ld_id", "__ld_pos", "__ld_line", "__ld_k",
      "__ld_c", "__ld_win", "__ld_drop")
    val clash = df.columns.filter(internals.contains)
    require(clash.isEmpty,
      s"input columns collide with lineDedup internals: ${clash.mkString(", ")}")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lines = df.select(col(idCol).as("__ld_id"),
      posexplode(split(col(textCol), sepLit)).as(Seq("__ld_pos", "__ld_line")))
    // keyed feeds BOTH the owner aggregate and the loser join, and the
    // aggregate's exchange (above a partial agg) cannot be reused by the
    // join — persistTracked keeps the corpus explode to ONE pass
    // (review finding; the substringDup precedent)
    val keyed = Caches.persistTracked(lines
      .filter(length(trim(col("__ld_line"))) >= minLineLen)
      .select(
        (if (hashed) xxhash64(col("__ld_line")) else col("__ld_line"))
          .as("__ld_k"),
        col("__ld_id"), col("__ld_pos")))
    // the single corpus-wide exchange: line keys, partially aggregated
    // map-side; only keys seen more than once survive
    val owners = keyed.groupBy(col("__ld_k"))
      .agg(count(lit(1)).as("__ld_c"),
        min(struct(col("__ld_id"), col("__ld_pos"))).as("__ld_win"))
      .filter(col("__ld_c") > 1)
      .select(col("__ld_k"), col("__ld_win"))
    // non-winner occurrences -> per-doc positions to drop (small: the
    // boilerplate mass of the corpus)
    val losers = keyed.join(owners, "__ld_k")
      .filter(struct(col("__ld_id"), col("__ld_pos")) =!= col("__ld_win"))
      .groupBy(col("__ld_id"))
      .agg(collect_set(col("__ld_pos")).as("__ld_drop"))
    // doc-local rebuild: indexed array filter over the re-split text;
    // docs without losers (the vast majority) pass through untouched
    df.join(losers, col(idCol) === col("__ld_id"), "left")
      .withColumn(textCol,
        when(col("__ld_drop").isNull, col(textCol))
          .otherwise(array_join(
            filter(split(col(textCol), sepLit),
              (_, i) => !array_contains(col("__ld_drop"), i)),
            sep)))
      .drop("__ld_id", "__ld_drop")
  }
}
