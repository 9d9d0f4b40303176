package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed point-in-time (as-of) join: for every probe row, the single
  * reference row with the greatest event time ≤ the probe's time, per key —
  * the temporal-join primitive of feature backfills ("the features as they
  * were when the label happened") and event attribution ("the click this
  * purchase followed").
  *
  * Spark has no AsOfJoin operator (the Python API's `merge_asof` plans a
  * broadcast range join only when one side is small), and the naive SQL
  * form — a `t_ref ≤ t_probe` theta join + per-probe max — explodes to
  * O(probe × ref) per key before aggregating it back down. This is the
  * UNION + ORDERED WINDOW form every scale-out engine uses for temporal
  * joins instead:
  *
  *   1. tag reference rows side=0, probe rows side=1, union them;
  *   2. one hash exchange + sort on (key, time, side, ref tiebreak);
  *   3. `last(ref_payload, ignoreNulls)` over ROWS UNBOUNDED PRECEDING →
  *      CURRENT ROW carries each reference row forward to every later
  *      probe row in the key group;
  *   4. keep side=1, unpack the payload struct.
  *
  * Cost: ONE shuffle of (probe + ref) rows, linear in input, no range
  * explosion — survives any time-density ratio of the two sides. Keys
  * are usually high-cardinality (user/entity ids), so partitioning is
  * even; a pathological single hot key degrades to a single-partition
  * sort (same as any per-key window) — salt upstream if a key holds a
  * material fraction of 100 TB.
  *
  * Semantics pinned for determinism: ties at equal time are INCLUSIVE
  * (a reference row AT the probe's timestamp matches, side=0 sorting
  * before side=1) and broken by the largest `refTiebreak` — so the match
  * is max-(time, tiebreak), the same row a `LATERAL ... ORDER BY t DESC,
  * tiebreak DESC LIMIT 1` picks. Probe rows with no earlier reference
  * keep NULL payload columns (left-outer as-of).
  */
object AsOfJoin {

  /** Backward (most-recent-past, inclusive) as-of join.
    *
    * @param probe       left side: one output row per probe row
    * @param ref         right side: the timeline being matched against
    * @param key         equi-join key column name (present in both)
    * @param probeTime   probe-side event-time column name
    * @param refTime     ref-side event-time column name
    * @param refPayload  ref-side columns to carry onto matches (aliased
    *                    names must not collide with probe columns)
    * @param refTiebreak ref-side column breaking equal-time ties (max
    *                    wins); must be non-null
    * @param toleranceSec optional max probe−ref gap in seconds
    *                    (INCLUSIVE, the merge_asof contract): a match
    *                    older than the tolerance keeps NULL payloads —
    *                    the row still appears (left-outer), it just has
    *                    no usable reference. Applied as a scan-side
    *                    conditional after the window; no extra shuffle.
    */
  def backward(probe: DataFrame, ref: DataFrame, key: String,
      probeTime: String, refTime: String, refPayload: Seq[Column],
      refTiebreak: Column, toleranceSec: Option[Long] = None): DataFrame = {
    val probeCols = probe.columns.toSeq
    val payload = ref.select(refPayload: _*)
    val payloadNames = payload.columns.toSeq
    require(payloadNames.intersect(probeCols).isEmpty,
      s"refPayload names collide with probe columns: " +
        payloadNames.intersect(probeCols).mkString(", "))
    // internal schema names: a probe column with one of these would hit
    // an opaque ambiguous-reference failure deep in the window plan —
    // refuse with the same clarity as the payload check above
    val reserved =
      Set("__k", "__t", "__side", "__tb", "__payload", "__match", "__mt")
    val clash = probeCols.filter(reserved)
    require(clash.isEmpty,
      s"probe columns collide with as-of internals: ${clash.mkString(", ")}")
    // SQL-equi/lateral semantics: a NULL-key or NULL-time reference row
    // can never match anything (NULL = k is never true; NULL <= t is
    // never true) — but a window PARTITION BY groups NULL keys together
    // and ASC NULLS FIRST would sort a NULL-time ref before every probe,
    // silently matching both. Drop them up front so the two formulations
    // agree. (NULL-key/time PROBE rows need no guard: they land in a
    // partition/position with no earlier ref and keep NULL payloads.)
    val refClean = ref.filter(col(key).isNotNull && col(refTime).isNotNull)
    // union schema: key, __t, __side, __tb, probe cols (null on ref rows),
    // payload struct (null on probe rows)
    val refTagged = refClean.select(
      (col(key).as("__k") +: col(refTime).as("__t") +: lit(0).as("__side") +:
        refTiebreak.as("__tb") +:
        probeCols.filter(_ != key).map(c => lit(null).as(c))) :+
        struct(refPayload: _*).as("__payload"): _*)
    val probeTagged = probe.select(
      (col(key).as("__k") +: col(probeTime).as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast(refTagged.schema("__tb").dataType).as("__tb") +:
        probeCols.filter(_ != key).map(col)) :+
        lit(null).cast(refTagged.schema("__payload").dataType)
          .as("__payload"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __mt carries the matched row's TIME through the same window:
    // last(non-null payload) and last(ref-side time) pick the same row
    // (both are "the last ref row in the frame"), so the tolerance test
    // compares the probe against exactly the row it matched
    val matchedRaw = refTagged.unionByName(probeTagged)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(when(col("__side") === 0, col("__t")),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = toleranceSec match {
      case None => matchedRaw
      case Some(tol) => matchedRaw.withColumn("__match",
        when(col("__t").cast("long") - col("__mt").cast("long") <= tol,
          col("__match"))) // else NULL: too stale to use, row survives
    }
    val out = col("__k").as(key) +:
      probeCols.filter(_ != key).map(col) ++:
      payloadNames.map(n => col("__match").getField(n).as(n))
    matched.select(out: _*)
  }
}
