package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Embedding similarity search over `array<float>` columns.
  *
  * [[cosine]] composes Catalyst higher-order functions (zip_with +
  * aggregate) — no UDF, fully distributed, null-safe. [[bruteTopK]] is the
  * exact baseline (scan + TakeOrdered — one pass, no shuffle of the
  * vectors). [[lshBuckets]] is the scale path: seeded random-hyperplane
  * signatures turn ANN into an equi-join on bucket ids; recall is tunable
  * with signature bits / number of tables.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns, computed
    * in double by the codegen'd [[CosineSim]] expression (the HOF
    * zip_with/aggregate formulation is interpreted per element — ~10x
    * slower in the kNN inner loop). Left-to-right fold order matches
    * DuckDB's, so results are reproducible across engines. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.column(CosineSim(
      org.apache.spark.sql.graftbridge.expression(a),
      org.apache.spark.sql.graftbridge.expression(b)))

  /** Exact top-k most-similar rows to the vector with `queryId`. */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    df.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .withColumn("sim", Det.r(cosine(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k neighbours for every row of `queries` against `corpus`
    * (brute-force; deterministic under rounded-sim ties). */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Det.r(cosine(col("__cvec"), col("__qvec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: component j of
    * plane p = mix(seed, p, j) mapped to [-1, 1]. */
  private def planeComponent(p: Int, j: Int, seed: Long): Double = {
    val h = TextHash.mix(seed + p * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH bucket id: `bits` sign bits from dot products
    * with seeded planes. Uses the codegen'd [[DotProduct]] against float
    * plane literals — bucketing runs scan-side inside whole-stage codegen
    * (the HOF formulation interpreted ~dim lambdas per bit per row). */
  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    def dotCol(p: Int): Column = {
      val plane = array((0 until dim).map(j =>
        lit(planeComponent(p, j, seed).toFloat)): _*)
      org.apache.spark.sql.graftbridge.column(DotProduct(
        org.apache.spark.sql.graftbridge.expression(vec),
        org.apache.spark.sql.graftbridge.expression(plane)))
    }
    (0 until bits).map { p =>
      when(dotCol(p) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN candidate join: rows sharing an LSH bucket in any of `tables`
    * independent hash tables. Returns (query_id, neighbor_id, sim) for
    * candidates, exact-cosine refined and top-k'd — same contract as
    * [[knnJoin]] but candidate-bounded instead of O(n·m). */
  def annJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      bits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    def banded(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"__vec_$id"))
        .withColumn("__table", explode(array((0 until tables).map(lit): _*)))
        .withColumn("__bucket",
          (0 until tables).foldLeft(lit(0L)) { (acc, t) =>
            when(col("__table") === t,
              lshBucket(col(s"__vec_$id"), dim, bits, seed + t * 7919L))
              .otherwise(acc)
          })
    val q = banded(queries, "query_id")
    val c = banded(corpus, "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("__table", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", Det.r(cosine(col("__vec_query_id"), col("__vec_neighbor_id")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
