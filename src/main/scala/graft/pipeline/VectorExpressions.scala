package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector math as native codegen'd expressions.
  *
  * The higher-order-function formulation (zip_with + aggregate) is
  * CodegenFallback — every element evaluates an interpreted lambda, which
  * dominates ANN/kNN runtime. This expression folds the arrays in one
  * tight loop emitted inside whole-stage codegen. Fold order is strictly
  * left-to-right, matching both the HOF formulation and DuckDB's
  * list_cosine_similarity — the differential oracle stays bit-compatible.
  */
object VectorOps {
  def cosine(a: ArrayData, b: ArrayData, floatInput: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (floatInput) {
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def sigOverlap(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  /** `Σ_d micros(q_d·x_d)` over two float vectors — the
    * [[graft.pipeline.ExactDotMicrosExpr]] kernel (static here so
    * whole-stage codegen links it directly). */
  def dotMicros(qa: ArrayData, xa: ArrayData): Long = {
    val d = qa.numElements()
    require(xa.numElements() == d,
      s"exact_dot_micros: got $d/${xa.numElements()} dims")
    var s = 0L
    var i = 0
    while (i < d) {
      val term = qa.getFloat(i).toDouble * xa.getFloat(i).toDouble
      s += math.floor(term * 1000000.0 + 0.5).toLong
      i += 1
    }
    s
  }

  def dot(a: ArrayData, b: ArrayData, floatInput: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    if (floatInput) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }

  /** All `tables` random-hyperplane bucket ids for one vector.
    * `planes` is laid out [(table, bit, dim)] flattened; each plane
    * component is the SAME `planeComponent(p, j, seed_t).toFloat.toDouble`
    * value the per-bit literal-array formulation bound into the plan, and
    * the dot accumulates left-to-right in double exactly like
    * [[dot]]'s float path — bucket values are identical to the old
    * `when(dot >= 0, 1L << p)` chain for every FINITE dot product.
    * NaN is out of contract (r19 advisor): Spark SQL orders NaN greater
    * than any double, so the old SQL chain SET the bit on a NaN dot,
    * while Java's `acc >= 0` leaves it unset. Corpus embeddings are
    * finite by construction (fixtures + oracle certify finite floats,
    * and a NaN component would already have poisoned every distance
    * gate), so no per-element guard is paid here. */
  def lshBuckets(v: ArrayData, planes: Array[Double], dim: Int, bits: Int,
      tables: Int, floatInput: Boolean): ArrayData = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val base = (t * bits + p) * dim
        var acc = 0.0
        var j = 0
        if (floatInput) {
          while (j < dim) { acc += v.getFloat(j).toDouble * planes(base + j); j += 1 }
        } else {
          while (j < dim) { acc += v.getDouble(j) * planes(base + j); j += 1 }
        }
        if (acc >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

abstract class VectorBinaryExpr extends BinaryExpression {
  protected def elementIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if lt == rt && (lt == FloatType || lt == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float|double> of the same type")
    }
  }
}

/** Cosine similarity of two equal-length numeric arrays. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elementIsFloat)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.pipeline.VectorOps.cosine($a, $b, $elementIsFloat)")
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Fraction of positions where two equal-length array<long> signatures
  * agree — the unbiased MinHash Jaccard estimator (std ≈ sqrt(j(1-j)/k)).
  * Used as a cheap pre-filter before exact shingle Jaccard. */
case class SigOverlap(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sig_overlap expects two array<bigint>")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sigOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.pipeline.VectorOps.sigOverlap($a, $b)")
  override def prettyName: String = "sig_overlap"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** All `tables` LSH bucket ids of a vector as ONE array<long> column.
  *
  * The per-bit formulation bound `tables x bits` DotProduct nodes, each
  * against a `dim`-float literal array — ~2,500 literal leaves per
  * banded side for the ANN defaults. Every Catalyst pass (and every
  * AQE stage re-optimization) walks that tree, which at gate scale
  * made DRIVER planning the dominant cost of the ANN join (~150 ms per
  * AQE wave measured); at 100 TB scale the same tree bloats every
  * executor's codegen unit. This expression is one plan node holding
  * the planes as a reference object; values are bit-identical (see
  * [[VectorOps.lshBuckets]]). */
case class LshBucketsExpr(child: Expression, dim: Int, bits: Int,
    tables: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits <= 62, s"bits must fit a long bucket: $bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "lsh_buckets expects array<float|double>")
    }
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      val seedT = seed + t * 7919L
      var p = 0
      while (p < bits) {
        var j = 0
        while (j < dim) {
          out((t * bits + p) * dim + j) =
            Similarity.planeComponentPublic(p, j, seedT).toFloat.toDouble
          j += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }
  override def nullSafeEval(v: Any): Any =
    VectorOps.lshBuckets(v.asInstanceOf[ArrayData], planes, dim, bits,
      tables, elementIsFloat)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.pipeline.VectorOps.lshBuckets($v, $ref, $dim, $bits, " +
        s"$tables, $elementIsFloat)")
  }
  override def prettyName: String = "lsh_buckets"
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Dot product of two equal-length numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elementIsFloat)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.pipeline.VectorOps.dot($a, $b, $elementIsFloat)")
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
