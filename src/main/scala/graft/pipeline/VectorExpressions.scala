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
