package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Distributed PCA over an embedding column — the standard preprocessing
  * step in front of the vector stack (whitening before [[Similarity]]'s
  * cosine dedup, rotation/dimension cut before [[Pq]]/[[Sq]] — the OPQ
  * idea in its unrotated form), and a quality signal in its own right
  * (intrinsic-dimension / variance-concentration audits of an embedding
  * corpus).
  *
  * The fit is ONE pass: a [[SumOuterAggr]] `TypedImperativeAggregate`
  * accumulates `(n, Σx, Σxxᵀ)` per task — map-side partials mean the
  * shuffle carries one `(1 + d + d²)`-double buffer per task (d = 64 →
  * 33 KB), never rows — and the driver finishes closed-form:
  * `cov = Σxxᵀ/n − μμᵀ`, then a cyclic Jacobi eigendecomposition of the
  * d×d symmetric matrix (driver CPU is O(d³) — microseconds at any
  * corpus size; the data-dependent work is all in the single scan).
  * This is the textbook covariance-method PCA (Jolliffe, "Principal
  * Component Analysis") — exact, not the randomized sketch, because at
  * d = 64 exactness is free.
  *
  * Determinism: the aggregate sums doubles, so partial-order effects
  * exist in the last ulps of the covariance — but the fit happens ONCE
  * and every downstream gate consumes the fitted model's literals;
  * Jacobi itself is deterministic given its input, and each
  * eigenvector's sign is pinned (largest-|component| coordinate made
  * positive) so reruns of the same collect cannot flip signs.
  *
  * Scale shape: fit = one scan + one 33 KB-per-task shuffle;
  * [[project]]/[[whiten]] are scan-side HOF columns over broadcast
  * component literals (no shuffle at all). */
object Pca {

  /** Fitted model: `components(j)` is the j-th orthonormal principal
    * axis (length `dim`), eigenvalues descending, `explained(j)` the
    * cumulative variance share of axes 0..j. */
  case class Model(dim: Int, k: Int, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      totalVariance: Double) {
    def explained(j: Int): Double =
      eigenvalues.take(j + 1).sum / totalVariance
  }

  /** One-pass fit: scan → `(n, Σx, Σxxᵀ)` → driver eigensolve. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(dim > 0 && k > 0 && k <= dim, s"need 0 < k <= dim: k=$k dim=$dim")
    val aggCol = org.apache.spark.sql.graftbridge.column(
      SumOuterAggr(org.apache.spark.sql.graftbridge.expression(
        col(vecCol)), dim).toAggregateExpression())
    val row = df.filter(col(vecCol).isNotNull).agg(aggCol.as("m"))
      .head().getSeq[Double](0).toArray
    val n = row(0)
    require(n >= 2.0, s"need at least 2 vectors to fit PCA, got $n")
    val mean = Array.tabulate(dim)(i => row(1 + i) / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      row(1 + dim + i * dim + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue descending, deterministic index tiebreak
    val order = values.zipWithIndex.sortBy { case (v, i) => (-v, i) }
      .map(_._2)
    val comps = order.take(k).map { idx =>
      val v = Array.tabulate(dim)(r => vectors(r)(idx))
      // sign pin: the largest-|x| coordinate is made positive (FIRST
      // such coordinate on exact ties, so the pin is total)
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }
    val eigs = order.take(k).map(values(_))
    val total = values.sum // trace preserved by the rotations
    Model(dim, k, mean, comps, eigs, total)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). O(d³) per sweep, sweeps
    * until off-diagonal mass is ~machine-zero (d = 64 → instant). */
  private[pipeline] def jacobiEigen(mIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64) { // far beyond convergence for d=64; bounded
      var off = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-22) return (Array.tabulate(d)(i => a(i)(i)), v)
      p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-30) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // t = tan of the annihilating rotation, smaller root
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** The COMMITTED fitted rotation (integer micros), trained by
    * `tools/train_pca.py` on the fixture corpus and stored as
    * `src/main/resources/graft/pca_rotation.txt` — the model-as-data
    * provenance pattern of [[Bpe]]'s merge table. Returns
    * `(mu_micros[dim], q_micros[k][dim])`. The emb_pca gate projects
    * against THIS artifact in exact bigint micros so its DuckDB oracle
    * replays the identical arithmetic (the live [[fit]] keeps its own
    * gate: emb_pca_sound re-measures orthonormality, Bessel, and the
    * spectrum against the corpus at every SF). */
  lazy val committedRotationMicros: (Array[Long], Array[Array[Long]]) = {
    val in = getClass.getResourceAsStream("/graft/pca_rotation.txt")
    require(in != null, "pca_rotation.txt missing from resources")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
      finally in.close()
    val mu = scala.collection.mutable.Map.empty[Int, Long]
    val q = scala.collection.mutable.Map.empty[(Int, Int), Long]
    lines.filterNot(l => l.isEmpty || l.startsWith("#")).foreach { l =>
      l.split(' ') match {
        case Array("mu", pos, v) => mu(pos.toInt) = v.toLong
        case Array("q", axis, pos, v) => q((axis.toInt, pos.toInt)) = v.toLong
        case other => throw new IllegalArgumentException(
          s"bad pca_rotation line: ${other.mkString(" ")}")
      }
    }
    val dim = mu.size
    val k = q.keys.map(_._1).max + 1
    require(q.size == k * dim, s"ragged rotation: ${q.size} != $k*$dim")
    (Array.tabulate(dim)(mu(_)),
      Array.tabulate(k, dim)((j, i) => q((j, i))))
  }

  private def meanLit(model: Model): Column =
    array(model.mean.map(lit(_)): _*)

  /** k-dim projection `Qᵀ(x − μ)` as a scan-side column (array<double>,
    * one entry per principal axis). Fused interpreted loop
    * ([[PcaProjectExpr]]) — the HOF formulation (k independent
    * `aggregate(zip_with(...))` chains) allocated per-row lambda frames
    * per axis; the loop computes the identical sequential-order double
    * sums (emb_pca_sound read 14.9 s at sf10 on the HOF form). */
  def project(vec: Column, model: Model): Column =
    org.apache.spark.sql.graftbridge.column(PcaProjectExpr(
      org.apache.spark.sql.graftbridge.expression(vec),
      model.mean, model.components))

  /** Whitened projection: each axis scaled to unit variance
    * (`proj_j / sqrt(λ_j)`) — the preconditioner cosine-style dedup and
    * Mahalanobis-flavoured scoring want. Degenerate axes (λ ≤ 0 from a
    * rank-deficient corpus) whiten to 0 rather than to ±Inf. */
  def whiten(vec: Column, model: Model): Column = {
    val scales = array(model.eigenvalues.map(e =>
      lit(if (e > 1e-12) 1.0 / math.sqrt(e) else 0.0)): _*)
    zip_with(project(vec, model), scales, (p, s) => p * s)
  }
}

/** Fused PCA projection: `out(j) = Σ_d (x_d − μ_d)·Q_jd` as one compact
  * loop, centered differences computed once and reused across the k
  * axes. Per-dim sums run in the SAME sequential array order as the HOF
  * formulation it replaces, so values are bit-identical. Whole-stage
  * codegen calls [[projectRow]] on the expression bound as a reference
  * object (round 20 — CodegenFallback split the projection stage's WSCG
  * span; the model constants stay in the expression OBJECT, never the
  * tree). */
case class PcaProjectExpr(child: Expression, mean: Array[Double],
    components: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  def projectRow(arr: ArrayData): ArrayData = {
    val d = mean.length
    require(arr.numElements() == d,
      s"pca_project: vector has ${arr.numElements()} dims, expected $d")
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) { centered(i) = arr.getFloat(i).toDouble - mean(i); i += 1 }
    val out = new Array[Double](components.length)
    var j = 0
    while (j < components.length) {
      val q = components(j)
      var s = 0.0
      i = 0
      while (i < d) { s += centered(i) * q(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    projectRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("pcaProject", this,
      classOf[PcaProjectExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.projectRow($c)")
  }

  override protected def withNewChildInternal(c: Expression): PcaProjectExpr =
    copy(child = c)
}

/** One-pass `(n, Σx, Σxxᵀ)` accumulator over a float-vector column.
  * Buffer layout: `[n, sum(0..d-1), outer(d*d, row-major)]` — fixed
  * `1 + d + d²` doubles, so partials are constant-size whatever the
  * partition holds (the [[graft.geo.GeoAggregates]] discipline: only
  * serialized partial buffers cross the shuffle). */
case class SumOuterAggr(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val len = 1 + dim + dim * dim

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sum_outer_aggr"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"sum_outer_aggr: vector has ${arr.numElements()} dims, expected $dim")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      buf(0) += 1.0
      i = 0
      while (i < dim) {
        buf(1 + i) += x(i)
        var j = 0
        val base = 1 + dim + i * dim
        while (j < dim) { buf(base + j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): SumOuterAggr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumOuterAggr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
