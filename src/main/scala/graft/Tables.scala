package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these helpers
  * centralize path construction so queries stay declarative. Reads are plain
  * parquet scans — Catalyst pushes filters/projections into the vectorized
  * reader, which is the same shape an Iceberg DSv2 scan would take in
  * production (SURVEY.md §4: pruning comes free from the declarative plan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some corpus
    * generations and TIMESTAMP(MICROS) in others; normalize both to
    * session-zoned TimestampType so every downstream plan sees one type.
    * Nanos: Spark's reader rejects the physical type outright, so read
    * them as long and convert with integer division (a double division
    * would lose precision — epoch-nanos exceed the 53-bit mantissa).
    * Micros: the reader yields TIMESTAMP_NTZ whose wall clock is the
    * corpus's UTC instants; a bare cast would interpret it in the SESSION
    * zone (correct only for the UTC-pinned mains — a non-UTC serving
    * session would shift every instant by its offset). The instant is
    * derived zone-FREE: `timestampdiff(MICROSECOND, epoch, ts)` on NTZ
    * operands is pure field arithmetic (an NTZ is internally micros
    * since the wall-clock epoch, so this is one subtraction), and
    * `timestamp_micros` wraps the count as a UTC instant — no wall
    * clock is ever re-interpreted in a zone where it could be ambiguous.
    * Two earlier forms both lost: convert-to-session-zone-then-cast
    * round-tripped through the session zone's wall clock, which is
    * ambiguous during a DST fall-back overlap (cast resolves to the
    * earlier offset, shifting second-pass instants by the DST gap), and
    * the make_timestamp(year..second, 'UTC') rebuild was correct but
    * paid six field extractions + a datetime rebuild per row — measured
    * 4x on q16 at sf10 (10M events, 0.54 s -> 2.05 s). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "timestamp_ntz'1970-01-01 00:00:00', ts))"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
