package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Conjunctive (all-terms) keyword retrieval — the inverted-index probe
  * of a text analytics engine, shaped for MANY queries at once.
  *
  * For a single fixed term set the optimal plan is doc-local
  * ([[matchesAll]]: one `array_intersect` per row, zero exchanges — use
  * it in a WHERE clause). The join form ([[conjunctiveJoin]]) is the
  * scale path when a query TABLE runs against the corpus: per-doc
  * distinct terms explode map-side, the broadcast query-term semi-join
  * discards every non-query term BEFORE the exchange, and one
  * `(doc, query)` aggregate counts matched arity — so shuffled rows are
  * bounded by (matching doc, query-term) hits, never corpus × queries.
  */
object Search {

  /** Doc-local predicate: does `textCol` contain every term in `terms`? */
  def matchesAll(textCol: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty && terms == terms.distinct,
      "terms must be non-empty and distinct")
    val words = split(Decontaminate.normCol(textCol), " ")
    size(array_intersect(words, array(terms.map(lit): _*))) === terms.size
  }

  /** All `(query_id, idCol)` pairs where the document contains EVERY
    * term of the query. `queries` has columns `(query_id, term)`; it is
    * broadcast (query tables are small at any corpus scale). */
  def conjunctiveJoin(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame): DataFrame = {
    require(queries.columns.toSet == Set("query_id", "term"),
      "queries must have exactly (query_id, term)")
    // the id column survives into the output next to the join-internal
    // names — a clash would silently corrupt the arity count
    require(!Set("term", "query_id", "__hits", "__arity").contains(idCol),
      s"idCol '$idCol' clashes with join internals")
    val arity = queries.distinct()
      .groupBy(col("query_id")).agg(count(lit(1)).as("__arity"))
    val docTerms = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(array_distinct(
        split(Decontaminate.normCol(col(textCol)), " "))).as("term"))
    docTerms.join(broadcast(queries.distinct()), "term")
      .groupBy(col(idCol), col("query_id"))
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(arity), "query_id")
      .filter(col("__hits") === col("__arity"))
      .select(col("query_id"), col(idCol))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse ranked candidate lists into one, `rrf = Σ_legs 1/(k0+rank)`,
    * the standard score-free combiner for hybrid lexical+vector
    * retrieval. Each leg is a `(idCol, rank)` frame — rank dense from 1
    * in the leg's own order; an id absent from a leg contributes 0.
    *
    * Shape at any scale: legs are top-n lists (bounded by retrieval
    * depth, not corpus size), so the fusion is a chain of broadcast
    * full-outer joins over at most Σ n rows — the corpus is never
    * touched again. Determinism contract (the Bm25/LmScore discipline):
    * contributions are summed left-associatively in leg order as
    * `coalesce(1/(k0+rank), 0)`, each operand an exact IEEE-754 double
    * of integer inputs, so an oracle writing the same tree gets
    * bit-identical doubles before the 1e-6 rounding; the fused rank
    * orders by (rounded rrf desc, id asc).
    *
    * Output: `idCol, rrf, rank_0..rank_{n-1} (null when absent), rank`.
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, k0: Int = 60,
      k: Int = 10): DataFrame = {
    require(legs.size >= 2, "fusion needs at least two legs")
    require(k0 >= 1 && k >= 1, "k0 and k must be positive")
    legs.zipWithIndex.foreach { case (leg, i) =>
      require(leg.columns.toSet == Set(idCol, "rank"),
        s"leg $i must have exactly ($idCol, rank), got " +
          leg.columns.mkString(","))
    }
    val named = legs.zipWithIndex.map { case (leg, i) =>
      leg.select(col(idCol), col("rank").cast("long").as(s"rank_$i"))
    }
    val joined = named.reduceLeft { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    val contribs: Seq[Column] = legs.indices.map(i =>
      coalesce(lit(1.0) / (lit(k0.toDouble) +
        col(s"rank_$i").cast("double")), lit(0.0)))
    val rrf = graft.Det.r(contribs.reduceLeft(_ + _), 6)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col(idCol).asc)
    joined.withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol) +: col("rrf") +:
        legs.indices.map(i => col(s"rank_$i")) :+ col("rank"): _*)
  }

  /** A leg for [[rrfFuse]]: re-rank a scored top-n frame into dense
    * `(idCol, rank)` by (scoreCol desc, idCol asc) — the same order the
    * producing top-k used, so rank i names the list's i-th element. */
  def asLeg(topN: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    topN.select(col(idCol), row_number().over(w).as("rank"))
  }
}
