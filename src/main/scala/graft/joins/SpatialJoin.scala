package graft.joins

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.{ItemBoundable, ItemDistance, STRtree}

import graft.geo.{GeoFunctions => G, GeoIO}

/** Distributed spatial joins (SURVEY.md §2.3 J1–J5, §7 step 8).
  *
  * The reference only ever does spatial joins as DuckDB nested loops over
  * ≤10k cached rows (query_cookbook cells 15-30); a naive Spark translation
  * is a `BroadcastNestedLoopJoin` — O(n·m) and a non-starter at 100 TB.
  * Two scale paths instead:
  *
  *  - [[grid]] — PBSM-style partitioned join: both sides explode the grid
  *    cells covered by their (optionally distance-expanded) envelope,
  *    equi-join on cell id (a normal shuffle join Catalyst plans, AQE can
  *    skew-split), then refine with the exact JTS predicate. Duplicate-pair
  *    elimination uses the reference-point technique — a pair is emitted
  *    only in the cell containing the min corner of the envelope
  *    intersection — so no `distinct` shuffle is needed.
  *
  *  - [[knnBroadcast]] — small right side broadcast as an STRtree, built
  *    once per partition, queried per left row: k-NN without a cross join.
  *
  * Cell assignment uses only Catalyst built-ins (floor/sequence/explode) so
  * that stage stays inside whole-stage codegen; only the refine predicate
  * is a JTS call.
  */
object SpatialJoin {

  /** Default distinct-geometry-ratio threshold below which [[grid]]'s
    * Contract.Auto engages contraction (see the [[grid]] scaladoc for why
    * it is stricter than the dedup family's 0.95). Shared with
    * [[graft.plans.SpatialJoinRule]] so naive theta-join syntax makes the
    * same decision. */
  val AutoMaxRatio = 0.8

  private def withCells(df: DataFrame, geom: Column, cell: Double,
      pfx: String, expand: Double): DataFrame = {
    // one WKB decode per row for all four bounds (st_envelope_bounds),
    // not four — at scale this is the dominant cost of the cell stage
    df.withColumn(s"${pfx}_b", G.st_envelope_bounds(geom))
      .withColumn(s"${pfx}_xmin", element_at(col(s"${pfx}_b"), 1) - expand)
      .withColumn(s"${pfx}_ymin", element_at(col(s"${pfx}_b"), 2) - expand)
      .withColumn(s"${pfx}_xmax", element_at(col(s"${pfx}_b"), 3) + expand)
      .withColumn(s"${pfx}_ymax", element_at(col(s"${pfx}_b"), 4) + expand)
      .drop(s"${pfx}_b")
      .withColumn(s"${pfx}_ix", explode(sequence(
        floor(col(s"${pfx}_xmin") / cell).cast("long"),
        floor(col(s"${pfx}_xmax") / cell).cast("long"))))
      .withColumn(s"${pfx}_iy", explode(sequence(
        floor(col(s"${pfx}_ymin") / cell).cast("long"),
        floor(col(s"${pfx}_ymax") / cell).cast("long"))))
  }

  /** Grid-partitioned spatial join. `predicate(l, r)` is the exact refine
    * test (st_within / st_intersects / st_dwithin...). For st_dwithin with
    * distance d, pass `expand = d` so near-but-not-touching candidates
    * still share a cell. Left/right must not share column names; the
    * geometry expressions must be deterministic (each is evaluated in the
    * candidate stage and again in the expansion join).
    *
    * Two plan shapes, selected by `contract` (round-11 verdict #5):
    *
    *  - CONTRACTED (clone-heavy corpora): the candidate stage runs over
    *    DISTINCT geometries per side, not rows. Many rows sharing one
    *    geometry (the derived soak corpora place 100 coincident copies of
    *    every box) would otherwise multiply every candidate test by the
    *    clone PRODUCT of the two sides; contraction makes candidate work
    *    scale with distinct-geometry density and the final expansion
    *    joins are output-linear (measured at sf10: geo_pip_join
    *    34.4 s → 2.1 s). The trade: each input is SCANNED TWICE — once
    *    (geometry-column-pruned) for the distinct candidate stage, once
    *    for the expansion join. The same collapse idea as [[knnGrid]]'s
    *    k-per-location window (round-8), applied to the relational join.
    *
    *  - DIRECT (unique-geometry corpora): cells over full rows, one scan
    *    per input, no distinct shuffle and no expansion joins. When
    *    geometries are ~unique, contraction's distinct pass removes
    *    nothing and its second scan is pure extra I/O — at 100 TB a real
    *    cost.
    *
    * [[Dedup.Contract.Auto]] (the default) picks per input: one memoized
    * `approx_count_distinct / count` probe job per side at plan-build
    * time (the [[Dedup.minhashPairs]] policy; a narrow single-column
    * scan, small against the join itself at any scale) engages
    * contraction only when EITHER side is duplicate-heavy — the clone
    * product blows up when one side alone carries cliques. The default
    * threshold is [[AutoMaxRatio]] (0.8), stricter than the dedup
    * family's 0.95: contraction here pays two extra scans plus distinct
    * shuffles and only wins under substantial cloning, and the probe's
    * ±5% rsd makes a 0.95 cutoff coin-flip on genuinely unique
    * geometry columns (a ~200-distinct estimate can read 0.94). Both
    * shapes share the cell/reference-point/envelope/refine candidate
    * logic, so they are result-identical by construction;
    * SpatialJoinRuleSpec pins plan shape and the gates pin results. */
  def grid(left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: (Column, Column) => Column,
      cellSize: Double,
      expand: Double = 0.0,
      contract: graft.pipeline.Dedup.Contract =
        graft.pipeline.Dedup.Contract.Auto(AutoMaxRatio)): DataFrame = {
    import graft.pipeline.Dedup
    val (doContract, why) = contract match {
      case Dedup.Contract.Off => (false, "forced")
      case Dedup.Contract.On => (true, "forced")
      case Dedup.Contract.Auto(maxRatio) =>
        // short-circuit (review finding): when the left probe already
        // decides contraction, the right side's distinct-count job is
        // pure marker decoration — skip it and note `rskip`
        val lr = Dedup.distinctRatio(left.select(leftGeom.as("__pg")),
          col("__pg"))
        if (lr <= maxRatio) (true, probeNote(lr, None, maxRatio))
        else {
          val rr = Dedup.distinctRatio(right.select(rightGeom.as("__pg")),
            col("__pg"))
          (rr <= maxRatio, probeNote(lr, Some(rr), maxRatio))
        }
    }
    val out =
      if (doContract)
        gridContracted(left, leftGeom, right, rightGeom, predicate, cellSize,
          expand)
      else gridDirect(left, leftGeom, right, rightGeom, predicate, cellSize,
        expand)
    // Probe observability (round-12 directive #7): the chosen shape and
    // the measured ratios land in the plan as a subquery alias, so
    // `explain(true)`'s analyzed plan shows WHY this shape was picked
    // (EliminateSubqueryAliases strips it before physical planning —
    // zero runtime cost). The optimizer-rule twin carries the same note
    // as a constant filter conjunct instead, because its rewrite runs
    // after alias elimination (SpatialJoinRule.markerNote).
    out.as(s"graft_grid_${if (doContract) "contracted" else "direct"}_$why")
  }

  /** Compact probe note for plan markers: measured distinct ratios and
    * the threshold, dots spelled `p` so the string stays
    * identifier-safe (`auto_l0p93_r1p00_max0p80`). `rr = None` prints
    * `rskip`: the left probe alone decided, the right job never ran. */
  private[graft] def probeNote(lr: Double, rr: Option[Double],
      maxRatio: Double): String = {
    def f(v: Double) = String.format(java.util.Locale.US, "%.2f",
      java.lang.Double.valueOf(v)).replace(".", "p")
    val r = rr.fold("skip")(f)
    s"auto_l${f(lr)}_r${r}_max${f(maxRatio)}"
  }

  /** Shared candidate filters: reference-point dedup (the candidate
    * envelope intersection's min corner lies in exactly one cell; emit
    * the pair only there) and envelope filter-and-refine (every supported
    * predicate implies the distance-expanded envelopes overlap — within
    * (containment ⇒ overlap), intersects, dwithin (expand already
    * widened the right bounds). These are codegen'd double compares on
    * columns the cell stage already computed, so the JTS refine — two
    * WKB decodes + an exact predicate per candidate — runs only on pairs
    * whose envelopes actually meet, not on every cell cohabitant.) */
  private def candidates(l: DataFrame, r: DataFrame,
      cellSize: Double): DataFrame = {
    val refIx = floor(greatest(col("__l_xmin"), col("__r_xmin")) / cellSize).cast("long")
    val refIy = floor(greatest(col("__l_ymin"), col("__r_ymin")) / cellSize).cast("long")
    l.join(r, col("__l_ix") === col("__r_ix") && col("__l_iy") === col("__r_iy"))
      .filter(col("__l_ix") === refIx && col("__l_iy") === refIy)
      .filter(col("__l_xmin") <= col("__r_xmax") &&
        col("__l_xmax") >= col("__r_xmin") &&
        col("__l_ymin") <= col("__r_ymax") &&
        col("__l_ymax") >= col("__r_ymin"))
  }

  private def gridContracted(left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: (Column, Column) => Column,
      cellSize: Double, expand: Double): DataFrame = {
    val lg = left.select(leftGeom.as("__lgeom")).distinct()
    val rg = right.select(rightGeom.as("__rgeom")).distinct()
    val l = withCells(lg, col("__lgeom"), cellSize, "__l", 0.0)
    val r = withCells(rg, col("__rgeom"), cellSize, "__r", expand)
    val hits = candidates(l, r, cellSize)
      .filter(predicate(col("__lgeom"), col("__rgeom")))
      .select(col("__lgeom"), col("__rgeom"))
    // expansion: re-attach every row carrying a hit geometry (equi-joins
    // on the geometry bytes — null geometries drop on both paths, as the
    // cell explode already dropped them before contraction)
    hits.join(left, col("__lgeom") === leftGeom)
      .join(right, col("__rgeom") === rightGeom)
      .drop("__lgeom", "__rgeom")
  }

  private def gridDirect(left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: (Column, Column) => Column,
      cellSize: Double, expand: Double): DataFrame = {
    val l = withCells(left.withColumn("__lgeom", leftGeom), col("__lgeom"),
      cellSize, "__l", 0.0)
    val r = withCells(right.withColumn("__rgeom", rightGeom), col("__rgeom"),
      cellSize, "__r", expand)
    candidates(l, r, cellSize)
      .filter(predicate(col("__lgeom"), col("__rgeom")))
      .select(left.columns.map(col).toSeq ++ right.columns.map(col): _*)
  }

  /** Partitioned k-NN join — the scale path for a right side that does
    * NOT fit the driver (round-7 verdict #5: [[knnBroadcast]] collects
    * and broadcasts the whole right side, the declared boundary of the
    * reference's J4 cookbook shape at ≤10k rows).
    *
    * Two-phase grid k-NN, no collect of right ROWS and no cross join.
    * Coincident right geometries are first collapsed to their k
    * best-tiebreak rows by a distributed window on the WKB bytes (rows
    * past rank k at one location can never enter a deterministic top-k —
    * the grid analogue of [[knnBroadcast]]'s member collapse), so clone-
    * heavy corpora don't inflate the candidate join. Then:
    *
    *  1. The right side is hashed to grid cells (one cell per row — the
    *     contract is point-like geometries, the reference's J4 shape)
    *     and only the per-cell COUNT histogram is collected + broadcast:
    *     #non-empty cells ≪ #rows by the cell-size choice, the same
    *     driver-budget contract as the IVF codebook.
    *  2. Each left row walks the histogram in expanding Chebyshev rings
    *     from its envelope CENTER until the cumulative count reaches k at
    *     ring r. Any such configuration bounds the true kth distance by
    *     d_k ≤ √2·(r+1)·cell (anchor anywhere in its cell, candidate
    *     anywhere in a ring-r cell), and a cell at ring j has min
    *     distance ≥ (j−1)·cell, so emitting every non-empty cell with
    *     j ≤ ⌈√2·(r+1)⌉ + 1 provably covers the exact top-k INCLUDING
    *     distance ties at the boundary. A LEFT geometry with spatial
    *     extent (line/polygon — the refine distance is geometry-to-
    *     geometry, not center-to-geometry) shifts both sides of that
    *     argument by at most its envelope half-diagonal h: every point of
    *     the geometry is within h of the center, so
    *     d_k(geom) ≤ √2·(r+1)·cell + h and a ring-j cell has
    *     min geometry distance ≥ (j−1)·cell − h — the candidate radius
    *     therefore widens by ⌈2h/cell⌉ cells (round-8 verdict #5; zero
    *     extra cells for the point-like case, so the point fast path is
    *     unchanged). Candidate (left, cell) pairs
    *     then equi-join the celled right side — a normal shuffle join,
    *     AQE-skew-splittable — and the exact distance + row_number over
    *     (distance, tiebreak) keeps k per left row, deterministically
    *     under ties.
    *
    * Each right row lives in exactly ONE cell and each left row emits a
    * cell at most once, so no pair-dedup shuffle is needed. Output
    * matches [[knnBroadcast]]: left ++ right ++ `knn_dist`, k rows per
    * left row (fewer only if the right side has fewer than k rows).
    * `leftId` must be unique per left row (the top-k window partition).
    */
  def knnGrid(left: DataFrame, leftId: String, leftGeomCol: String,
      right: DataFrame, rightGeomCol: String,
      k: Int, tiebreak: String, cellSize: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = left.sparkSession
    import org.apache.spark.sql.functions.{col => c}

    // Collapse coincident right geometries to their k best-tiebreak rows
    // first (a distributed window keyed on the WKB bytes — the grid
    // analogue of knnBroadcast's per-location member collapse): any
    // deterministic top-k can select at most k rows of one location, and
    // among equal distances row_number consumes tiebreak order, so rows
    // past rank k at a location are provably never emitted. On a
    // duplicate-heavy corpus (the sf1 soak: 50 coincident centroids per
    // site) this shrinks every cell — and therefore every candidate
    // join group — by the clone factor; without it the first sf1 run of
    // this operator spent 24 s re-ranking clones (BENCH_NOTES round 8).
    val rkeep = org.apache.spark.sql.expressions.Window
      .partitionBy(c(rightGeomCol)).orderBy(c(tiebreak))
    val collapsed = right
      .withColumn("__rloc", row_number().over(rkeep))
      .filter(c("__rloc") <= k)
      .drop("__rloc")

    // phase 1: right cell histogram (cells, not rows, reach the driver)
    val rb = G.st_envelope_bounds(c(rightGeomCol))
    val rCelled = collapsed
      .withColumn("__rcx", floor((element_at(rb, 1) + element_at(rb, 3))
        / (2 * cellSize)).cast("long"))
      .withColumn("__rcy", floor((element_at(rb, 2) + element_at(rb, 4))
        / (2 * cellSize)).cast("long"))
    val hist: Map[(Long, Long), Long] = rCelled
      .groupBy(c("__rcx"), c("__rcy")).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val bHist = spark.sparkContext.broadcast(hist)

    // phase 2: candidate cells per left row from the broadcast histogram
    val lGeomIdx = left.schema.fieldIndex(leftGeomCol)
    val withCellSchema = StructType(left.schema.fields :+
      StructField("__lcx", org.apache.spark.sql.types.LongType, false) :+
      StructField("__lcy", org.apache.spark.sql.types.LongType, false))
    val leftCells = left.mapPartitions { it =>
      val cells = bHist.value
      val keys = cells.keys.toArray
      // global cell-grid bounds, computed ONCE per partition: each row's
      // max ring is then O(1) from its own cell to the far corners (a
      // per-row fold over all cells cost seconds at the sf1 soak's
      // 150k-row left side)
      var bMinX = Long.MaxValue; var bMaxX = Long.MinValue
      var bMinY = Long.MaxValue; var bMaxY = Long.MinValue
      keys.foreach { case (kx, ky) =>
        if (kx < bMinX) bMinX = kx; if (kx > bMaxX) bMaxX = kx
        if (ky < bMinY) bMinY = ky; if (ky > bMaxY) bMaxY = ky
      }
      it.flatMap { lrow =>
        if (cells.isEmpty) Iterator.empty else {
          val env = GeoIO.fromWkb(lrow.getAs[Array[Byte]](lGeomIdx))
            .getEnvelopeInternal
          val ax = (env.getMinX + env.getMaxX) / 2
          val ay = (env.getMinY + env.getMaxY) / 2
          val ix = math.floor(ax / cellSize).toLong
          val iy = math.floor(ay / cellSize).toLong
          // envelope half-diagonal in cells: the ring-count argument is
          // anchored at the CENTER but the refine distance is geometry-
          // to-geometry, so an extended left geometry both lowers true
          // distances and raises a ring's minimum by up to halfDiag —
          // widen the candidate radius by 2h/cell (scaladoc proof).
          // Zero for point-like rows: the common path pays nothing.
          val halfDiag = math.sqrt(
            env.getWidth * env.getWidth + env.getHeight * env.getHeight) / 2
          val extraCells = math.ceil(2 * halfDiag / cellSize).toLong
          // perimeter lookups for Chebyshev ring r around (ix, iy)
          def countAt(r: Long): Long = {
            if (r == 0L) cells.getOrElse((ix, iy), 0L)
            else {
              var s = 0L
              var d = -r
              while (d <= r) {
                s += cells.getOrElse((ix + d, iy - r), 0L)
                s += cells.getOrElse((ix + d, iy + r), 0L)
                if (d != -r && d != r) {
                  s += cells.getOrElse((ix - r, iy + d), 0L)
                  s += cells.getOrElse((ix + r, iy + d), 0L)
                }
                d += 1
              }
              s
            }
          }
          val maxRing = math.max(
            math.max(math.abs(bMinX - ix), math.abs(bMaxX - ix)),
            math.max(math.abs(bMinY - iy), math.abs(bMaxY - iy)))
          // near-field: walk rings while the CUMULATIVE lookup count
          // stays under the map size (a per-ring guard alone lets a far
          // anchor pay sum(8r) ~ 4r² empty lookups crossing the gap to
          // a distant right-side region); far/sparse rows finish with
          // ONE exact pass bucketing the remaining cells by ring — so a
          // row's candidate-discovery cost is O(#non-empty cells) worst
          // case, O(k / density) typical, never O(maxRing * #cells)
          var r = 0L
          var cum = 0L
          var rk = -1L
          var looked = 0L
          while (rk < 0 && r <= maxRing && looked <= keys.length) {
            cum += countAt(r)
            looked += math.max(8 * r, 1)
            if (cum >= k) rk = r else r += 1
          }
          if (rk < 0 && r <= maxRing) {
            val ringCounts = scala.collection.mutable.LongMap.empty[Long]
            keys.foreach { case (kx, ky) =>
              val j = math.max(math.abs(kx - ix), math.abs(ky - iy))
              if (j >= r)
                ringCounts(j) = ringCounts.getOrElse(j, 0L) + cells((kx, ky))
            }
            val rings = ringCounts.keys.toArray.sorted
            var i = 0
            while (rk < 0 && i < rings.length) {
              cum += ringCounts(rings(i))
              if (cum >= k) rk = rings(i)
              i += 1
            }
          }
          if (rk < 0) rk = maxRing // right side holds fewer than k rows
          // candidate radius covers the √2 diagonal + the anchor-at-edge
          // margin + the left envelope's half-diagonal slack (scaladoc
          // proof)
          val bigR = math.min(
            math.ceil(math.sqrt(2.0) * (rk + 1)).toLong + 1 + extraCells,
            maxRing)
          val out = scala.collection.mutable.ArrayBuffer[Row]()
          if ((2 * bigR + 1) * (2 * bigR + 1) >= keys.length) {
            keys.foreach { case (kx, ky) =>
              if (math.max(math.abs(kx - ix), math.abs(ky - iy)) <= bigR)
                out += Row.fromSeq(lrow.toSeq :+ kx :+ ky)
            }
          } else {
            var dx = -bigR
            while (dx <= bigR) {
              var dy = -bigR
              while (dy <= bigR) {
                if (cells.contains((ix + dx, iy + dy)))
                  out += Row.fromSeq(lrow.toSeq :+ (ix + dx) :+ (iy + dy))
                dy += 1
              }
              dx += 1
            }
          }
          out.iterator
        }
      }
    }(Encoders.row(withCellSchema))

    // equi-join on cell, exact refine, deterministic top-k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(c(leftId))
      .orderBy(c("__knn_d"), c(tiebreak))
    leftCells
      .join(rCelled, c("__lcx") === c("__rcx") && c("__lcy") === c("__rcy"))
      .withColumn("__knn_d", G.st_distance(c(leftGeomCol), c(rightGeomCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(c("__rn") <= k)
      .drop("__lcx", "__lcy", "__rcx", "__rcy", "__rn")
      .withColumnRenamed("__knn_d", "knn_dist")
  }

  /** k-nearest-neighbour join with a broadcast right side.
    *
    * Builds one STRtree per partition from a broadcast row array with
    * coincident geometries collapsed to one entry (k best-tiebreak
    * members kept per location), queries `k + pad` locations per left
    * row (growing the fetch while the boundary distance is tied, so a
    * full tie group is always seen), then re-sorts members by
    * `(distance, numeric tiebreak)` and keeps k — deterministic under
    * distance ties, which raw STRtree k-NN is not, even when coincident
    * geometries outnumber the fetch window.
    *
    * Output: left columns ++ right columns ++ `knn_dist`.
    */
  def knnBroadcast(left: DataFrame, leftGeomCol: String,
      right: DataFrame, rightGeomCol: String,
      k: Int, tiebreak: String): DataFrame = {
    val spark = left.sparkSession
    val rightSchema = right.schema
    val bRight = spark.sparkContext.broadcast(right.collect())
    val rGeomIdx = rightSchema.fieldIndex(rightGeomCol)
    val rTieIdx = rightSchema.fieldIndex(tiebreak)
    val lGeomIdx = left.schema.fieldIndex(leftGeomCol)

    val outSchema = StructType(left.schema.fields ++ rightSchema.fields :+
      StructField("knn_dist", DoubleType, nullable = false))
    val pad = 8

    left.mapPartitions { it =>
      val rows = bRight.value
      def tieOf(idx: Int): Double = rows(idx).get(rTieIdx) match {
        case n: Number => n.doubleValue()
        case other => other.hashCode.toDouble
      }
      // Collapse coincident geometries (exact WKB equality) to ONE tree
      // entry holding that location's k best-tiebreak members — sufficient
      // for any deterministic top-k, since equal-distance members are
      // always consumed in tiebreak order. On a duplicate-heavy corpus
      // (the sf1 soak: 50 coincident centroids per site) this shrinks the
      // tree 50x and makes distance ties RARE instead of universal, so
      // the adaptive refetch below almost never escalates.
      val groupIdx = new java.util.HashMap[java.nio.ByteBuffer, Integer]()
      val memberBufs =
        scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]()
      val repGeoms = scala.collection.mutable.ArrayBuffer[Geometry]()
      var i = 0
      while (i < rows.length) {
        val wkbBytes = rows(i).getAs[Array[Byte]](rGeomIdx)
        val key = java.nio.ByteBuffer.wrap(wkbBytes)
        var gi = groupIdx.get(key)
        if (gi == null) {
          gi = Integer.valueOf(repGeoms.length)
          groupIdx.put(key, gi)
          repGeoms += GeoIO.fromWkb(wkbBytes)
          memberBufs += scala.collection.mutable.ArrayBuffer[Int]()
        }
        memberBufs(gi) += i
        i += 1
      }
      val members: Array[Array[Int]] =
        memberBufs.map(_.sortBy(tieOf).take(k).toArray).toArray
      val geoms = repGeoms.toArray
      val tree = new STRtree()
      var gi = 0
      while (gi < geoms.length) {
        tree.insert(geoms(gi).getEnvelopeInternal, Integer.valueOf(gi))
        gi += 1
      }
      tree.build()
      def geomOf(item: AnyRef): Geometry = item match {
        case idx: Integer => geoms(idx)
        case g: Geometry => g
      }
      val itemDist = new ItemDistance {
        def distance(a: ItemBoundable, b: ItemBoundable): Double =
          geomOf(a.getItem.asInstanceOf[AnyRef])
            .distance(geomOf(b.getItem.asInstanceOf[AnyRef]))
      }
      it.flatMap { lrow =>
        // empty right side: no neighbours (querying an empty STRtree for
        // the dK index would throw; pre-grouping code returned no rows)
        if (geoms.isEmpty) Seq.empty[Row] else {
        val lg = GeoIO.fromWkb(lrow.getAs[Array[Byte]](lGeomIdx))
        // Adaptive tie-complete fetch: STRtree's m-NN picks arbitrarily
        // among equal distances, so if the FARTHEST fetched distance
        // equals the kth kept MEMBER distance, the tie may extend past
        // the fetch window and the deterministic (distance, tie) winner
        // may be missing. Every unfetched location is >= the farthest
        // fetched distance, so once that is STRICTLY greater than the
        // kth member distance the top-k-with-ties set is provably
        // complete.
        var m = math.min(k + pad, geoms.length)
        var cand: Seq[(Double, Int)] = null // (distance, member row idx)
        var done = false
        while (!done) {
          val nn = tree.nearestNeighbour(lg.getEnvelopeInternal, lg,
            itemDist, m)
          var dMax = 0.0
          cand = nn.toSeq.flatMap { item =>
            val g = item.asInstanceOf[Integer].intValue()
            val d = geoms(g).distance(lg)
            if (d > dMax) dMax = d
            members(g).map(idx => (d, idx)).toSeq
          }
          val ds = cand.map(_._1).sorted
          val dK = ds(math.min(k, ds.length) - 1)
          done = m >= geoms.length || dMax > dK
          if (!done) m = math.min(m * 4, geoms.length)
        }
        cand
          .sortBy { case (d, idx) => (d, tieOf(idx)) }
          .take(k)
          .map { case (d, idx) =>
            Row.fromSeq(lrow.toSeq ++ rows(idx).toSeq :+ d)
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}
