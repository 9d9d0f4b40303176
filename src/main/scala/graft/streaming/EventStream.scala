package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (SURVEY §2.10: the
  * reference has NO stream processing — this is the optional north-star
  * extension §7 step 10, built on the same schema so the batch queries
  * (q16_event_windows) and the streaming ones share semantics).
  *
  * Design: event-time processing with watermarks (late data bounded, state
  * bounded), tumbling-window aggregation identical to the batch plan, and
  * session windows via flatMapGroupsWithState — the canonical custom-state
  * operator. File-sourced for tests (memory sink + processAllAvailable);
  * swap `readStream.parquet` for kafka/etc. in production unchanged.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File stream source over parquet dirs with the events schema. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling event-time windows with watermark — the streaming twin of
    * q16_event_windows; identical grouping so batch backfill and the live
    * stream produce merge-compatible rows. */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Det.r(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, nEvents: Long, total: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Session windows (gap-based) per user via flatMapGroupsWithState —
    * emits a session once `gapMs` passes with no events (or on timeout).
    * State per user is O(1); the shuffle is one hash partition by user. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastTs <= gapMs =>
                cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                  total = s.total + e.value))
              case Some(s) =>
                out += Session(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.lastTs), s.nEvents, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming dedup on event_id within the watermark horizon — exactly-once
    * per id semantics for at-least-once sources. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Stream-stream interval join: each `leftType` event matched to the
    * same user's `rightType` events arriving within `within` AFTER it.
    * Both sides carry watermarks and the join condition bounds event time
    * in both directions, so Spark can expire join state — the canonical
    * bounded-state stream-stream join shape. */
  def intervalJoin(events: DataFrame, leftType: String, rightType: String,
      watermark: String = "2 hours", within: String = "30 minutes"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("l_user") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("l_id"), col("r_id"), col("l_user").as("user_id"),
        col("l_ts"), col("r_ts"), col("r_value"))
  }
}
