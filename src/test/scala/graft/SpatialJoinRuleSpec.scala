package graft

import org.apache.spark.sql.functions._

import graft.geo.{GeoIO, GeoFunctions => G}
import graft.plans.SpatialJoinRule

/** The optimizer rule must turn a naive spatial theta-join (which Spark
  * plans as BroadcastNestedLoopJoin) into the grid equi-join, producing
  * exactly the naive join's rows. */
class SpatialJoinRuleSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val pts = (0 until 200).map { i =>
    val lon = -120.0 + (i % 50) * 0.2
    val lat = 25.0 + (i / 50) * 0.3
    (i.toLong, GeoIO.toWkb(GeoIO.point(lon, lat)))
  }.toDF("pid", "geom")

  private lazy val boxes = (0 until 20).map { j =>
    val x = -120.0 + j * 0.5
    val y = 25.0 + (j % 5) * 0.4
    (j.toLong, GeoIO.toWkb(GeoIO.envelope(x, y, x + 0.6, y + 0.5)))
  }.toDF("bid", "bgeom")

  private def naivePairs(cond: org.apache.spark.sql.Column): Set[(Long, Long)] = {
    spark.conf.set(SpatialJoinRule.EnabledKey, "false")
    try {
      val naive = pts.join(boxes, cond)
      assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "control run must be the nested-loop plan")
      naive.select("pid", "bid").as[(Long, Long)].collect().toSet
    } finally spark.conf.set(SpatialJoinRule.EnabledKey, "true")
  }

  test("st_within theta-join rewrites to grid equi-join, same rows") {
    SpatialJoinRule.install(spark)
    val joined = pts.join(boxes, G.st_within(col("geom"), col("bgeom")))
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n${phys.take(1500)}")
    assert(phys.contains("Generate explode"), "cell explode missing")
    val got = joined.select("pid", "bid").as[(Long, Long)].collect().toSet
    val want = naivePairs(G.st_within(col("geom"), col("bgeom")))
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("st_dwithin(literal) theta-join rewrites with envelope expansion") {
    SpatialJoinRule.install(spark)
    val cond = G.st_dwithin(col("geom"), col("bgeom"), lit(0.313))
    val joined = pts.join(boxes, cond)
    assert(!joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val got = joined.select("pid", "bid").as[(Long, Long)].collect().toSet
    val want = naivePairs(cond)
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("swapped-side and reversed predicates still orient correctly") {
    SpatialJoinRule.install(spark)
    // geometry args reversed: right side's geometry first
    val joined = pts.join(boxes, G.st_contains(col("bgeom"), col("geom")))
    assert(!joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val got = joined.select("pid", "bid").as[(Long, Long)].collect().toSet
    val want = naivePairs(G.st_contains(col("bgeom"), col("geom")))
    assert(got === want)
  }

  test("multi-conjunct and non-spatial joins are left untouched") {
    SpatialJoinRule.install(spark)
    // grid-join output (cell equality + refine) must NOT re-match
    val grid = graft.joins.SpatialJoin.grid(pts, col("geom"), boxes,
      col("bgeom"), (l, r) => G.st_within(l, r), cellSize = 0.5)
    assert(grid.count() > 0)
    // plain equi-join unaffected
    val eq = pts.join(boxes, col("pid") === col("bid"))
    assert(eq.count() === 20)
  }

  test("grid contraction is probe-guarded: direct plan on unique data, contracted on clones") {
    // 400 rows carrying only 8 distinct point geometries (50 coincident
    // clones each — the derived soak corpora's regime) vs the unique
    // pts/boxes fixtures. The distinct-ratio probe must pick the
    // contracted shape for the clones and the direct single-scan shape
    // for unique data. Plan shape is read off the optimized logical
    // plan's leaf count: contraction scans each input twice (distinct
    // candidate branch + expansion join), so the join goes 2 -> 4
    // LocalRelation leaves.
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    def leaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collectLeaves()
        .count(_.isInstanceOf[LocalRelation])
    val clonePts = (0 until 400).map { i =>
      val j = i % 8
      (i.toLong, GeoIO.toWkb(GeoIO.point(-119.9 + j * 0.5, 25.1 + j * 0.1)))
    }.toDF("pid", "geom")

    // function API, Contract.Auto (the default)
    val direct = graft.joins.SpatialJoin.grid(pts, col("geom"), boxes,
      col("bgeom"), (l, r) => G.st_within(l, r), cellSize = 0.5)
    assert(leaves(direct) === 2, "unique-geometry data must take the " +
      s"single-scan direct plan:\n${direct.queryExecution.optimizedPlan}")
    val contracted = graft.joins.SpatialJoin.grid(clonePts, col("geom"),
      boxes, col("bgeom"), (l, r) => G.st_within(l, r), cellSize = 0.5)
    assert(leaves(contracted) === 4, "clone-heavy data must take the " +
      s"contracted plan:\n${contracted.queryExecution.optimizedPlan}")

    // both shapes produce identical rows on the same (clone-heavy) input
    def rows(c: graft.pipeline.Dedup.Contract): Set[(Long, Long)] =
      graft.joins.SpatialJoin.grid(clonePts, col("geom"), boxes,
        col("bgeom"), (l, r) => G.st_within(l, r), cellSize = 0.5,
        contract = c)
        .select("pid", "bid").as[(Long, Long)].collect().toSet
    val on = rows(graft.pipeline.Dedup.Contract.On)
    val off = rows(graft.pipeline.Dedup.Contract.Off)
    assert(on.nonEmpty)
    assert(on === off)

    // optimizer rule: the same probe drives the same shape decision on
    // naive theta-join syntax (conf default is auto)
    SpatialJoinRule.install(spark)
    val ruleDirect = pts.join(boxes, G.st_within(col("geom"), col("bgeom")))
    assert(!ruleDirect.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(leaves(ruleDirect) === 2,
      s"rule must go direct on unique data:\n${ruleDirect.queryExecution.optimizedPlan}")
    val ruleContracted = clonePts.join(boxes,
      G.st_within(col("geom"), col("bgeom")))
    assert(leaves(ruleContracted) === 4,
      s"rule must contract on clone data:\n${ruleContracted.queryExecution.optimizedPlan}")
    assert(ruleContracted.select("pid", "bid").as[(Long, Long)]
      .collect().toSet === on)
    // forced shapes via conf override both directions
    try {
      spark.conf.set(SpatialJoinRule.ContractKey, "on")
      assert(leaves(pts.join(boxes,
        G.st_within(col("geom"), col("bgeom")))) === 4)
      spark.conf.set(SpatialJoinRule.ContractKey, "off")
      val forcedOff = clonePts.join(boxes,
        G.st_within(col("geom"), col("bgeom")))
      assert(leaves(forcedOff) === 2)
      assert(forcedOff.select("pid", "bid").as[(Long, Long)]
        .collect().toSet === on)
    } finally spark.conf.set(SpatialJoinRule.ContractKey, "auto")

    // probe observability (round-12 directive #7): Explain output shows
    // WHY a shape was chosen, on both paths of both APIs. The rule's
    // marker is a constant filter conjunct in the OPTIMIZED plan (the
    // rewrite runs in the last optimizer batch, past constant folding);
    // the function API's is a SubqueryAlias in the ANALYZED plan
    // (aliases are eliminated before optimization).
    val ruleDirectPlan = ruleDirect.queryExecution.optimizedPlan.toString
    assert(ruleDirectPlan.contains("graft_grid_direct_auto_l"),
      s"direct marker missing from rule plan:\n$ruleDirectPlan")
    val ruleContractedPlan =
      ruleContracted.queryExecution.optimizedPlan.toString
    assert(ruleContractedPlan.contains("graft_grid_contracted_auto_l"),
      s"contracted marker missing from rule plan:\n$ruleContractedPlan")
    // the marker also survives to the physical plan users explain()
    assert(ruleContracted.queryExecution.executedPlan.toString
      .contains("graft_grid_contracted_auto_l"))
    // measured ratios are embedded: threshold always prints as max0p80
    assert(ruleContractedPlan.contains("_max0p80"))
    val fnDirect = direct.queryExecution.analyzed.toString
    assert(fnDirect.contains("graft_grid_direct_auto_l"),
      s"direct marker missing from function analyzed plan:\n$fnDirect")
    val fnContracted = contracted.queryExecution.analyzed.toString
    assert(fnContracted.contains("graft_grid_contracted_auto_l"),
      s"contracted marker missing from function analyzed plan:\n$fnContracted")
    val fnForced = graft.joins.SpatialJoin.grid(clonePts, col("geom"),
      boxes, col("bgeom"), (l, r) => G.st_within(l, r), cellSize = 0.5,
      contract = graft.pipeline.Dedup.Contract.On)
      .queryExecution.analyzed.toString
    assert(fnForced.contains("graft_grid_contracted_forced"))
  }

  test("knn tie groups larger than the fetch pad resolve deterministically") {
    // 60 COINCIDENT neighbors (a duplicate-heavy corpus: every clone maps
    // to the same geometry) outnumber the k+pad fetch window; the winner
    // by (distance, tiebreak id) must still be the smallest id, which a
    // single bounded STRtree query need not return (sf1 soak regression).
    val near = (0 until 60).map(i =>
      (i.toLong, GeoIO.toWkb(GeoIO.point(1.0, 1.0))))
    val far = (60 until 70).map(i =>
      (i.toLong, GeoIO.toWkb(GeoIO.point(5.0, 5.0 + (i - 60) * 0.1))))
    val neigh = (near ++ far).toDF("nid", "ngeom")
    val queries = Seq((100L, GeoIO.toWkb(GeoIO.point(0.0, 0.0)))).toDF("qid", "qgeom")
    val k1 = graft.joins.SpatialJoin.knnBroadcast(
      queries, "qgeom", neigh, "ngeom", k = 1, tiebreak = "nid")
      .select("nid").as[Long].collect().toSeq
    assert(k1 === Seq(0L))
    val k3 = graft.joins.SpatialJoin.knnBroadcast(
      queries, "qgeom", neigh, "ngeom", k = 3, tiebreak = "nid")
      .select("nid").as[Long].collect().toSeq.sorted
    assert(k3 === Seq(0L, 1L, 2L))
  }

  test("grid kNN matches broadcast kNN; no collect of right rows, no cross join") {
    // irregular density: a dense cluster, a sparse far shell, and a tie
    // clique (coincident points) — the regimes where the expanding-ring
    // candidate bound has to be exact, not just usually-right
    val rng = new scala.util.Random(3)
    val dense = (0 until 150).map(i =>
      (i.toLong, GeoIO.toWkb(GeoIO.point(
        -0.5 + rng.nextDouble(), -0.5 + rng.nextDouble()))))
    val shell = (150 until 180).map(i =>
      (i.toLong, GeoIO.toWkb(GeoIO.point(
        25.0 + rng.nextDouble() * 10, -20.0 + rng.nextDouble() * 40))))
    val ties = (180 until 195).map(i =>
      (i.toLong, GeoIO.toWkb(GeoIO.point(7.25, 7.25))))
    val neigh = (dense ++ shell ++ ties).toDF("nid", "ngeom")
    val queries = (0 until 120).map(i =>
      (1000L + i, GeoIO.toWkb(GeoIO.point(
        -15.0 + (i % 12) * 3.1, -15.0 + (i / 12) * 3.3)))).toDF("qid", "qgeom")
    for (k <- Seq(1, 3, 7)) {
      val grid = graft.joins.SpatialJoin.knnGrid(
        queries, "qid", "qgeom", neigh, "ngeom", k = k, tiebreak = "nid",
        cellSize = 2.0)
      // plan shape: the scale contract — candidate generation is an
      // equi-join, never a cartesian/nested-loop; right rows never ride
      // a broadcast (only the per-cell histogram does, driver-side)
      val phys = grid.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"), phys.take(1200))
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(1200))
      val got = grid.select("qid", "nid", "knn_dist")
        .as[(Long, Long, Double)].collect().toSet
      val want = graft.joins.SpatialJoin.knnBroadcast(
        queries, "qgeom", neigh, "ngeom", k = k, tiebreak = "nid")
        .select("qid", "nid", "knn_dist")
        .as[(Long, Long, Double)].collect().toSet
      assert(want.size === 120 * k)
      assert(got === want, s"k=$k grid/broadcast divergence")
    }
    // empty right side: no rows, no crash (knnBroadcast parity)
    val none = graft.joins.SpatialJoin.knnGrid(
      queries, "qid", "qgeom", neigh.filter(col("nid") < 0), "ngeom",
      k = 2, tiebreak = "nid", cellSize = 2.0)
    assert(none.count() === 0)
  }

  test("grid kNN with extended (polygon) left geometries matches broadcast") {
    // Adversarial construction for the left-anchor contract (round-8
    // verdict #5): the ring walk anchors at the left envelope CENTER but
    // the refine distance is geometry-to-geometry. A 20-wide box centered
    // at (10,0) counts k=1 from the cluster at (10,6) — center distance 6,
    // so the un-widened candidate radius was ⌈√2·7⌉+1 = 11 rings — while
    // the TRUE nearest neighbour sits at (24,0), ring 14 from the center
    // but only 4.0 from the box's right edge. Without the half-diagonal
    // widening this returned nid=0 (dist 5.5) instead of nid=1.
    val neigh = Seq(
      (0L, GeoIO.toWkb(GeoIO.point(10.0, 6.0))),
      (1L, GeoIO.toWkb(GeoIO.point(24.0, 0.0)))).toDF("nid", "ngeom")
    val box = Seq((100L, GeoIO.toWkb(GeoIO.envelope(0.0, -0.5, 20.0, 0.5))))
      .toDF("qid", "qgeom")
    val nearest = graft.joins.SpatialJoin.knnGrid(
      box, "qid", "qgeom", neigh, "ngeom", k = 1, tiebreak = "nid",
      cellSize = 1.0)
      .select("nid", "knn_dist").as[(Long, Double)].collect().toSeq
    assert(nearest === Seq((1L, 4.0)))

    // Randomized parity with knnBroadcast (which is exact for any left
    // geometry): boxes spanning several cells, mixed point clusters.
    val rng = new scala.util.Random(11)
    val pts = (0 until 150).map(i => (i.toLong, GeoIO.toWkb(GeoIO.point(
      -25.0 + rng.nextDouble() * 50, -25.0 + rng.nextDouble() * 50))))
      .toDF("nid", "ngeom")
    val boxes = (0 until 40).map { i =>
      val cx = -20.0 + (i % 8) * 5.5
      val cy = -20.0 + (i / 8) * 5.5
      val w = 1.0 + (i % 5) * 2.0 // up to 9x1 — half-diagonal > 2 cells
      (1000L + i, GeoIO.toWkb(GeoIO.envelope(cx - w, cy - 0.5, cx + w, cy + 0.5)))
    }.toDF("qid", "qgeom")
    for (k <- Seq(1, 3)) {
      val got = graft.joins.SpatialJoin.knnGrid(
        boxes, "qid", "qgeom", pts, "ngeom", k = k, tiebreak = "nid",
        cellSize = 2.0)
        .select("qid", "nid", "knn_dist")
        .as[(Long, Long, Double)].collect().toSet
      val want = graft.joins.SpatialJoin.knnBroadcast(
        boxes, "qgeom", pts, "ngeom", k = k, tiebreak = "nid")
        .select("qid", "nid", "knn_dist")
        .as[(Long, Long, Double)].collect().toSet
      assert(want.size === 40 * k)
      assert(got === want, s"k=$k polygon-left grid/broadcast divergence")
    }
  }
}
