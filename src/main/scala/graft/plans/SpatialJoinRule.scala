package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.geo.{StContains, StDWithin, StEnvelopeBounds, StIntersects, StWithin}

/** Catalyst optimizer rule: rewrite a spatial theta-join into the PBSM
  * grid equi-join automatically.
  *
  * `left.join(right, st_intersects(lgeom, rgeom))` is a cross join with a
  * post-filter to Spark — planned as BroadcastNestedLoopJoin, O(n·m), a
  * non-starter at 100 TB. [[graft.joins.SpatialJoin.grid]] is the scale
  * shape, but callers must know to use it. This rule closes that gap at
  * the OPTIMIZER level: any inner join whose sole condition is a
  * supported spatial predicate (st_intersects / st_within / st_contains /
  * st_dwithin-with-literal-distance) is rewritten into exactly the
  * grid-join plan — per-side envelope bounds, cell-id explodes, an
  * equi-join on (ix, iy), the reference-point dedup filter, and the
  * original predicate as the exact refine — so naive user code gets the
  * scalable plan.
  *
  * The rewritten join's condition is the pure cell equality, so the rule
  * cannot re-match its own output (it fires only when the single join
  * conjunct is spatial). Output attributes are preserved exactly
  * (`left.output ++ right.output`), making the rewrite transparent to
  * every downstream operator.
  *
  * Install per session via [[SpatialJoinRule.install]] (experimental
  * extraOptimizations) or at session build time via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`). Tunables:
  * `spark.graft.spatialJoin.enabled` (default true),
  * `spark.graft.spatialJoin.cellSize` (default 0.5 degrees), and
  * `spark.graft.spatialJoin.contract` (`auto`/`on`/`off`, default auto —
  * see [[graft.joins.SpatialJoin.grid]] for the contracted-vs-direct
  * trade; `auto` runs the same memoized distinct-ratio probe as the
  * function API, one narrow aggregate per join side at optimization
  * time, so naive theta-join syntax gets the same shape decision).
  */
object SpatialJoinRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.spatialJoin.enabled"
  val CellSizeKey = "spark.graft.spatialJoin.cellSize"
  val ContractKey = "spark.graft.spatialJoin.contract"

  /** Idempotently register on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val cell = conf.getConfString(CellSizeKey, "0.5").toDouble
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        matchSpatial(cond, left, right) match {
          case Some((lGeom, rGeom, expand)) =>
            rewrite(left, right, cond, lGeom, rGeom, expand, cell, hint)
          case scala.None => j
        }
    }
  }

  /** The single join conjunct must be a supported spatial predicate with
    * one geometry per side. Returns (leftGeom, rightGeom, expand). */
  private def matchSpatial(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def orient(a: Expression, b: Expression, d: Double) =
      if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b, d))
      else if (a.references.nonEmpty && b.references.nonEmpty &&
        b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a, d))
      else scala.None
    cond match {
      case StIntersects(a, b) => orient(a, b, 0.0)
      case StWithin(a, b) => orient(a, b, 0.0)
      case StContains(a, b) => orient(a, b, 0.0)
      case StDWithin(a, b, Literal(d: Double, DoubleType)) => orient(a, b, d)
      case _ => scala.None
    }
  }

  /** One side's cell pipeline: bounds project -> min/max project -> two
    * cell-id explodes. Mirrors SpatialJoin.withCells exactly. */
  private def cellSide(child: LogicalPlan, geom: Expression, cell: Double,
      pfx: String, expand: Double)
      : (LogicalPlan, Attribute, Attribute, Seq[Attribute]) = {
    val b = Alias(StEnvelopeBounds(geom), s"${pfx}b")()
    val p1 = Project(child.output :+ b, child)
    def elem(i: Int): Expression = ElementAt(b.toAttribute, Literal(i))
    val xmin = Alias(Subtract(elem(1), Literal(expand)), s"${pfx}xmin")()
    val ymin = Alias(Subtract(elem(2), Literal(expand)), s"${pfx}ymin")()
    val xmax = Alias(Add(elem(3), Literal(expand)), s"${pfx}xmax")()
    val ymax = Alias(Add(elem(4), Literal(expand)), s"${pfx}ymax")()
    val p2 = Project(child.output ++ Seq(xmin, ymin, xmax, ymax), p1)
    def cellOf(e: Expression) = Floor(Divide(e, Literal(cell)))
    def explodeRange(lo: Attribute, hi: Attribute, name: String,
        src: LogicalPlan): (LogicalPlan, Attribute) = {
      // Sequence is TimeZoneAwareExpression: without a zone it reports
      // unresolved and fails optimizer plan validation
      val gen = Explode(new Sequence(cellOf(lo), cellOf(hi), scala.None,
        Some(conf.sessionLocalTimeZone)))
      val f = gen.elementSchema.head
      val attr = AttributeReference(name, f.dataType, f.nullable)()
      (Generate(gen, Nil, outer = false, scala.None, Seq(attr), src), attr)
    }
    val (g1, ix) = explodeRange(xmin.toAttribute, xmax.toAttribute, s"${pfx}ix", p2)
    val (g2, iy) = explodeRange(ymin.toAttribute, ymax.toAttribute, s"${pfx}iy", g1)
    (g2, ix, iy, Seq(xmin, ymin, xmax, ymax).map(_.toAttribute))
  }

  /** Contraction decision (parity with [[graft.joins.SpatialJoin.grid]]):
    * `on`/`off` force a shape; `auto` (default) runs the memoized
    * distinct-ratio probe over each side's geometry expression — an
    * eager narrow aggregate executed AT OPTIMIZATION TIME via the
    * graftbridge (its own plan is a Project+Aggregate, so this rule
    * cannot re-match inside the probe; any nested spatial joins in the
    * probed child were already rewritten by transformUp's bottom-up
    * order). A probe failure keeps the contracted shape: on
    * clone-heavy data the direct shape is the catastrophic direction
    * (clone-product candidates), the contracted one merely re-scans. */
  private def shouldContract(left: LogicalPlan, right: LogicalPlan,
      lGeom: Expression, rGeom: Expression): (Boolean, String) =
    conf.getConfString(ContractKey, "auto") match {
      case "on" => (true, "forced")
      case "off" => (false, "forced")
      case _ =>
        try {
          val spark = SparkSession.active
          def ratio(child: LogicalPlan, g: Expression): Double = {
            val df = org.apache.spark.sql.graftbridge.ofRows(spark,
              Project(Seq(Alias(g, "__pg")()), child))
            graft.pipeline.Dedup.distinctRatio(df,
              org.apache.spark.sql.functions.col("__pg"))
          }
          val max = graft.joins.SpatialJoin.AutoMaxRatio
          // same short-circuit as SpatialJoin.grid: no right-side probe
          // job when the left already decided (this runs at OPTIMIZER
          // time — an extra eager count here is doubly unwelcome)
          val lr = ratio(left, lGeom)
          if (lr <= max)
            (true, graft.joins.SpatialJoin.probeNote(lr, None, max))
          else {
            val rr = ratio(right, rGeom)
            (rr <= max,
              graft.joins.SpatialJoin.probeNote(lr, Some(rr), max))
          }
        } catch { case scala.util.control.NonFatal(e) =>
          logWarning(s"spatial-join contraction probe failed, " +
            s"keeping contracted shape: $e")
          (true, "probe_failed")
        }
    }

  /** Probe-observability marker (round-12 directive #7): the chosen shape
    * + measured ratios as a CONSTANT filter conjunct —
    * `isnotnull("graft_grid_contracted_auto_...")` — so plain `explain()`
    * of the rewritten plan shows why a shape was chosen. This rule runs
    * in the last optimizer batch, AFTER ConstantFolding/NullPropagation,
    * so the tautology survives to the physical Filter verbatim; its
    * per-row cost is a null check on a literal, which whole-stage
    * codegen reduces to a loop-invariant constant. (The function API's
    * twin marker is a SubqueryAlias instead — it builds plans BEFORE
    * optimization, where a constant conjunct would fold away and an
    * alias survives to the analyzed plan.) */
  private def marker(shape: String, why: String): Expression =
    IsNotNull(Literal(org.apache.spark.unsafe.types.UTF8String
      .fromString(s"graft_grid_${shape}_$why"),
      org.apache.spark.sql.types.StringType))

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      spatialCond: Expression, lGeom: Expression, rGeom: Expression,
      expand: Double, cell: Double, hint: JoinHint): LogicalPlan = {
    val (doContract, why) = shouldContract(left, right, lGeom, rGeom)
    if (!doContract)
      return rewriteDirect(left, right, spatialCond, lGeom, rGeom, expand,
        cell, hint, why)
    // contraction (parity with SpatialJoin.grid): candidates run over
    // DISTINCT geometries per side — clone-heavy corpora would otherwise
    // multiply every candidate test by the clone product — and hits
    // expand back through output-linear equi-joins on the geometry bytes
    val lgAlias = Alias(lGeom, "__l_geom")()
    val rgAlias = Alias(rGeom, "__r_geom")()
    val lgAttr = lgAlias.toAttribute
    val rgAttr = rgAlias.toAttribute
    // Aggregate directly (not Distinct): this rule runs in
    // extraOptimizations, after ReplaceDistinctWithAggregate has already
    // fired, so a Distinct emitted here would survive to physical
    // planning and fail
    val lgPlan =
      Aggregate(Seq(lgAttr), Seq(lgAttr), Project(Seq(lgAlias), left))
    val rgPlan =
      Aggregate(Seq(rgAttr), Seq(rgAttr), Project(Seq(rgAlias), right))
    val (lp, lix, liy, lb) = cellSide(lgPlan, lgAttr, cell, "__l_", 0.0)
    val (rp, rix, riy, rb) = cellSide(rgPlan, rgAttr, cell, "__r_", expand)
    val Seq(lxmin, lymin, lxmax, lymax) = lb
    val Seq(rxmin, rymin, rxmax, rymax) = rb
    val cellEq = And(EqualTo(lix, rix), EqualTo(liy, riy))
    // reference-point dedup: emit the pair only in the cell holding the
    // min corner of the envelope intersection
    def refCell(a: Attribute, bb: Attribute) =
      Floor(Divide(Greatest(Seq(a, bb)), Literal(cell)))
    val refOk = And(EqualTo(lix, refCell(lxmin, rxmin)),
      EqualTo(liy, refCell(lymin, rymin)))
    // envelope filter-and-refine (parity with SpatialJoin.grid): every
    // supported predicate implies the distance-expanded envelopes
    // overlap, so the codegen'd double compares gate the exact refine
    val envOk = And(
      And(LessThanOrEqual(lxmin, rxmax), GreaterThanOrEqual(lxmax, rxmin)),
      And(LessThanOrEqual(lymin, rymax), GreaterThanOrEqual(lymax, rymin)))
    // the exact refine over the CONTRACTED geometry attributes: the
    // matched geometry subtrees are substituted in place, keeping the
    // predicate's own constructor and argument order
    val refine = spatialCond.transformUp {
      case e if e.semanticEquals(lGeom) => lgAttr
      case e if e.semanticEquals(rGeom) => rgAttr
    }
    val joined = Join(lp, rp, Inner, Some(cellEq), JoinHint.NONE)
    val hits = Project(Seq(lgAttr, rgAttr),
      Filter(And(marker("contracted", why),
        And(refOk, And(envOk, refine))), joined))
    // expansion: re-attach every original row carrying a hit geometry.
    // `left`/`right` each appear twice in the produced tree (inside the
    // Distinct branch and as an expansion side); outputs never collide —
    // the contracted branches surface only the fresh geometry aliases.
    val e1 = Join(hits, left, Inner, Some(EqualTo(lgAttr, lGeom)),
      JoinHint.NONE)
    val e2 = Join(e1, right, Inner, Some(EqualTo(rgAttr, rGeom)), hint)
    Project((left.output ++ right.output).map(a => a: NamedExpression), e2)
  }

  /** The unique-geometry shape: cells over the FULL children (one scan
    * per input, no distinct shuffle, no expansion joins), same
    * cell-equality / reference-point / envelope / exact-refine candidate
    * logic as the contracted form — result-identical by construction. */
  private def rewriteDirect(left: LogicalPlan, right: LogicalPlan,
      spatialCond: Expression, lGeom: Expression, rGeom: Expression,
      expand: Double, cell: Double, hint: JoinHint,
      why: String): LogicalPlan = {
    val (lp, lix, liy, lb) = cellSide(left, lGeom, cell, "__l_", 0.0)
    val (rp, rix, riy, rb) = cellSide(right, rGeom, cell, "__r_", expand)
    val Seq(lxmin, lymin, lxmax, lymax) = lb
    val Seq(rxmin, rymin, rxmax, rymax) = rb
    val cellEq = And(EqualTo(lix, rix), EqualTo(liy, riy))
    def refCell(a: Attribute, bb: Attribute) =
      Floor(Divide(Greatest(Seq(a, bb)), Literal(cell)))
    val refOk = And(EqualTo(lix, refCell(lxmin, rxmin)),
      EqualTo(liy, refCell(lymin, rymin)))
    val envOk = And(
      And(LessThanOrEqual(lxmin, rxmax), GreaterThanOrEqual(lxmax, rxmin)),
      And(LessThanOrEqual(lymin, rymax), GreaterThanOrEqual(lymax, rymin)))
    val joined = Join(lp, rp, Inner, Some(cellEq), hint)
    val filtered = Filter(And(marker("direct", why),
      And(refOk, And(envOk, spatialCond))), joined)
    Project((left.output ++ right.output).map(a => a: NamedExpression),
      filtered)
  }
}

/** Session-build-time registration (`--conf
  * spark.sql.extensions=graft.plans.GraftExtensions`): the same rule, the
  * official SparkSessionExtensions path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SpatialJoinRule)
    ()
  }
}
