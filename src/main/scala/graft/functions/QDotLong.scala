package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Exact int64 dot product of a quantized float vector against an
  * already-integer vector (IVF centroid): sum over q(a_i) * b_i with
  * q(x) = round-half-away(x * 10^4). One codegen'd static call — replaces
  * the aggregate(zip_with(..)) HOF pair that dominated the IVF ANN's
  * per-(row x centroid) cost (same discipline as qcosine /
  * hyperplane_bucket). Bit-identical to the HOF formulation.
  */
object QDotLongImpl {
  @inline private def q(v: Double): Long =
    if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"qdot_long: mismatched vector lengths $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += q(a.getFloat(i).toDouble * 10000) * b.getLong(i)
      i += 1
    }
    s
  }

  def norm2(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val x = q(a.getFloat(i).toDouble * 10000)
      s += x * x
      i += 1
    }
    s
  }

  // Registered for arbitrary SQL use, so the equal-length contract is
  // enforced here (loud failure), not assumed by callers: a silent
  // min-length truncation returns a plausible but wrong distance.
  def l2(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"l2_long: mismatched vector lengths $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

case class QDotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdot_long expects (array<float>, array<bigint>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    QDotLongImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[QDotLongImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.dot($a, $b)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "qdot_long"
}

/** Exact int64 squared norm of a quantized float vector — the unary
  * companion of QDotLong, one static call in codegen.
  */
case class QNorm2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qnorm2 expects array<float>, got $other")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    QDotLongImpl.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[QDotLongImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$m.norm2($a)")
  }
  override protected def withNewChildInternal(newChild: Expression): QNorm2 =
    copy(child = newChild)
  override def prettyName: String = "qnorm2"
}

/** Exact int64 squared L2 distance between two already-integer vectors
  * (PQ subvectors / codewords): sum of (a_i - b_i)^2, one static call in
  * codegen — replaces the aggregate(zip_with(..)) HOF pair in the PQ
  * encode/ADC hot path, same discipline as qdot_long.
  */
case class L2Long(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_long expects (array<bigint>, array<bigint>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    QDotLongImpl.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[QDotLongImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.l2($a, $b)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Long =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "l2_long"
}
