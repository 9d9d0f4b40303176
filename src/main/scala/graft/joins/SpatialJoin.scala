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
    * still share a cell. Left/right must not share column names. */
  def grid(left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: (Column, Column) => Column,
      cellSize: Double,
      expand: Double = 0.0): DataFrame = {
    val l = withCells(left, leftGeom, cellSize, "__l", 0.0)
    val r = withCells(right, rightGeom, cellSize, "__r", expand)

    // reference-point dedup: the candidate envelope intersection's min
    // corner lies in exactly one cell; emit the pair only there.
    val refIx = floor(greatest(col("__l_xmin"), col("__r_xmin")) / cellSize).cast("long")
    val refIy = floor(greatest(col("__l_ymin"), col("__r_ymin")) / cellSize).cast("long")

    l.join(r, col("__l_ix") === col("__r_ix") && col("__l_iy") === col("__r_iy"))
      .filter(col("__l_ix") === refIx && col("__l_iy") === refIy)
      .filter(predicate(leftGeom, rightGeom))
      .drop("__l_xmin", "__l_ymin", "__l_xmax", "__l_ymax", "__l_ix", "__l_iy",
        "__r_xmin", "__r_ymin", "__r_xmax", "__r_ymax", "__r_ix", "__r_iy")
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
