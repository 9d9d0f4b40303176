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
}
