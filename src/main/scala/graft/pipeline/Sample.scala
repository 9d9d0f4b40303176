package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the mixture-weighting step of corpus
  * assembly (down-sample source X to frac f, reproducibly, on any
  * cluster layout).
  *
  * The scale form is HASH-THRESHOLD sampling: keep a row iff the first
  * 8 hex chars of `md5(key)` sort below the fraction's threshold — a
  * stateless scan-side filter (no shuffle, no windows, no RNG state),
  * reproducible across engines/partitionings/reruns, and composable
  * per stratum by keying the threshold off a stratum column. Quotas are
  * binomial-approximate (±O(1/√n) relative), which is what production
  * pipelines accept at corpus scale; md5 (not xxhash64) because both
  * Spark and DuckDB implement it identically, so the gate takes a full
  * hash oracle.
  *
  * [[stratifiedExact]] is the quota-EXACT variant — per-stratum
  * `row_number` over the same hash order, keep rank ≤ ceil(f·n) — for
  * when exact stratum sizes matter more than the full per-stratum
  * sort+shuffle it costs (a window over each stratum; at 100 TB prefer
  * the threshold form, or pre-aggregate stratum counts and run the
  * threshold form with per-stratum fractions). */
object Sample {

  /** First 8 hex chars of md5(key) — the portable order both engines
    * agree on byte-for-byte. */
  def hashKey(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold for a fraction in [0, 1]: rows with
    * `hashKey < thresholdHex(f)` are kept (uniform in expectation —
    * md5 is uniform over the 32-bit prefix). */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    f"${math.min((frac * 4294967296d).toLong, 4294967295L)}%08x"
  }

  /** Deterministic fraction-`frac` sample by hash threshold on `key`. */
  def byHash(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(hashKey(key) < lit(thresholdHex(frac)))

  /** Quota-exact stratified sample: within each stratum, keep the
    * `ceil(frac * n)` rows that sort FIRST by (hashKey, key) — the key
    * tiebreak keeps the selection total-ordered and deterministic even
    * under md5-prefix ties. */
  def stratifiedExact(df: DataFrame, strata: Column, key: Column,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(hashKey(key), key)
    val wc = Window.partitionBy(strata)
    df.withColumn("__srk", row_number().over(w))
      .withColumn("__sn", count(lit(1)).over(wc))
      .filter(col("__srk") <= ceil(col("__sn") * frac))
      .drop("__srk", "__sn")
  }
}
