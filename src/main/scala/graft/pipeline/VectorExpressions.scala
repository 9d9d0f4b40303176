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
