package graft

import org.apache.spark.sql.functions._

import graft.joins.AsOfJoin

/** Semantics pins for the union+window as-of join — the cases a range-join
  * rewrite or an exclusive-tie implementation would get wrong. */
class AsOfJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("backward as-of: past-match, inclusive ties, tiebreak, outer nulls") {
    val probe = Seq(
      (1L, 10L, ts(100)), // after refs 1 and 2 -> latest (t=90)
      (2L, 10L, ts(50)),  // tie AT ref t=50 -> inclusive match
      (3L, 10L, ts(10)),  // before every ref -> null payload
      (4L, 20L, ts(100)), // other key: only key-20 refs visible
      (5L, 30L, ts(100))  // key with no refs at all -> null payload
    ).toDF("event_id", "user_id", "ts")
    val ref = Seq(
      (101L, 10L, ts(50)),
      (102L, 10L, ts(90)),
      (103L, 10L, ts(90)), // same key+time as 102 -> max tiebreak wins
      (201L, 20L, ts(40))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(probe, ref, "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id"), col("ts").as("m_ts")),
        refTiebreak = col("event_id"))
      .select(col("event_id"), col("m_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> Some(103L), // latest past, tiebreak 103 > 102
      2L -> Some(101L), // equal-time ref matches (inclusive)
      3L -> None,
      4L -> Some(201L),
      5L -> None))
  }

  test("backward as-of: one hash exchange, output rows = probe rows") {
    val probe = spark.range(0, 500)
      .select(col("id").as("pid"), (col("id") % 50L).as("k"),
        (col("id") * 7L % 1000L).as("t"))
    val ref = spark.range(0, 2000)
      .select(col("id").as("rid"), (col("id") % 50L).as("k"),
        (col("id") * 13L % 1000L).as("t"))
    val out = AsOfJoin.backward(probe, ref, "k", "t", "t",
      Seq(col("rid").as("m_rid")), refTiebreak = col("rid"))
    assert(out.count() === 500L) // left-outer: every probe row, exactly once
    val exchanges = out.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges === 1, "as-of must cost exactly one shuffle")
  }

  test("backward as-of: tolerance nulls stale matches, inclusive boundary") {
    val probe = Seq(
      (1L, 10L, ts(100)), // gap to nearest ref = 10 -> inside tol
      (2L, 10L, ts(150)), // gap 60 -> exactly AT tol: inclusive, matches
      (3L, 10L, ts(200))  // gap 110 -> stale: row survives, payload NULL
    ).toDF("event_id", "user_id", "ts")
    val ref = Seq((101L, 10L, ts(90))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(probe, ref, "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id")), refTiebreak = col("event_id"),
        toleranceSec = Some(60L))
      .select(col("event_id"), col("m_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(101L), 2L -> Some(101L), 3L -> None))
  }

  test("backward as-of: NULL key/time refs never match (SQL semantics)") {
    val probe = Seq((1L, Some(10L), Some(ts(100))), // normal probe
      (2L, None, Some(ts(100))),                    // NULL key probe
      (3L, Some(10L), None)                         // NULL time probe
    ).toDF("event_id", "user_id", "ts")
    val ref = Seq((101L, Some(10L), Some(ts(50))),
      (900L, None, Some(ts(40))),   // NULL key ref: must never match
      (901L, Some(10L), None)       // NULL time ref: must never match
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(probe, ref, "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id")), refTiebreak = col("event_id"))
      .select(col("event_id"), col("m_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(101L), 2L -> None, 3L -> None))
  }

  test("backward as-of: randomized agreement with a brute-force oracle") {
    // 200 probes x 400 refs over 20 keys with DENSE times (0..30) so
    // equal-time ties and multi-ref timestamps occur constantly — the
    // regime where an ordering bug would survive a hand fixture
    val rnd = new scala.util.Random(42)
    val probes = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, ts(rnd.nextInt(30).toLong)))
    val refs = (1001 to 1400).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, ts(rnd.nextInt(30).toLong)))
    val out = AsOfJoin.backward(
        probes.toDF("event_id", "user_id", "ts"),
        refs.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id")), refTiebreak = col("event_id"))
      .select(col("event_id"), col("m_id"))
      .as[(Long, Option[Long])].collect().toMap
    val brute = probes.map { case (pid, k, pt) =>
      val cands = refs.filter(r => r._2 == k && !r._3.after(pt))
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._3.getTime, r._1))._1))
    }.toMap
    assert(out === brute)
  }

  test("backward as-of: payload name collision refused") {
    val p = Seq((1L, 1L, ts(1))).toDF("event_id", "user_id", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(p, p, "user_id", "ts", "ts",
        Seq(col("event_id")), refTiebreak = col("event_id"))
    }
    // probe columns named like the internals must refuse loudly, not
    // fail with an opaque ambiguous-reference deep in the window plan
    val bad = Seq((1L, 1L, ts(1), 0)).toDF("event_id", "user_id", "ts",
      "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(bad, p, "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id")), refTiebreak = col("event_id"))
    }
    // __mt is created mid-plan by withColumn — a probe column with that
    // name would be silently REPLACED (worse than the ambiguous-ref
    // failures above), so it must be in the reserved set too
    val badMt = Seq((1L, 1L, ts(1), ts(1))).toDF("event_id", "user_id",
      "ts", "__mt")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(badMt, p, "user_id", "ts", "ts",
        Seq(col("event_id").as("m_id")), refTiebreak = col("event_id"))
    }
  }
}
