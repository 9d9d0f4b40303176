package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding for oracle-gated query outputs.
  *
  * `round(x, d)` is NOT portable at full hash precision: Spark rounds via
  * BigDecimal HALF_UP on the exact decimal expansion of the double, DuckDB
  * via float multiply/rint/divide — the two can differ by 1 ulp near half
  * boundaries (round-1 verdict: doc_stats/doc_tokens/mm_decode hash-FAIL).
  *
  * `floor(x * 10^d + 0.5) / 10^d` is portable BY CONSTRUCTION: multiply,
  * add, floor, and divide are individually-rounded IEEE-754 ops that any
  * conforming engine evaluates bit-identically, so as long as both sides
  * start from the same double they end at the same double. (Negative
  * halves round toward +inf instead of away from zero — identically on
  * both sides, which is all the hash compare needs.)
  *
  * Powers of ten up to 1e15 are exactly representable doubles, so the
  * scale factor itself introduces no error.
  */
object Det {

  /** Spark-side deterministic round-to-`digits` decimals. */
  def r(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + lit(0.5)) / s
  }

  /** The same operation as a DuckDB SQL fragment (for oracle twins). */
  def rsql(expr: String, digits: Int): String = {
    val s = "1" + ("0" * digits) + ".0"
    s"floor(($expr) * $s + 0.5) / $s"
  }
}
