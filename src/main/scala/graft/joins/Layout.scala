package graft.joins

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for repeated large-scale joins (SURVEY §0
  * "Partitioning & shuffle": bucketing for co-located joins, salting for
  * skew).
  *
  * [[bucketize]] writes a table bucketed+sorted by the join key: two
  * tables bucketed the same way join with NO shuffle exchange on either
  * side — the amortized answer when a 100 TB fact table is joined on the
  * same key by every query. [[saltedJoin]] spreads a hot key across
  * `salt` sub-keys: the skewed side explodes nothing (salt is derived from
  * a hash), the small side replicates `salt` times — turning one straggler
  * partition into `salt` even ones (the manual fallback where AQE's
  * runtime skew split can't apply, e.g. broadcast-ineligible dims).
  */
object Layout {

  /** Write `df` as a managed table bucketed and sorted by `key` into
    * `numBuckets` — subsequent equi-joins between tables bucketed the same
    * way plan without shuffle exchanges. */
  def bucketize(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: left (large, skewed) gets a
    * deterministic salt from a hash of its row; right (small, not
    * broadcastable) is replicated across all salt values. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
