package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Quantized cosine similarity of two float vectors, one pass.
  *
  * Exactly the engine's oracle-portable cosine semantics (see
  * graft.ops.Similarity): components quantized to round(x*10^4) as int64,
  * dot and norms accumulated exactly in int64, final value =
  * dot / (sqrt(na) * sqrt(nb)) in IEEE doubles — bit-identical to the
  * HOF (zip_with/aggregate) formulation it replaces, but generated code
  * is one static call instead of three array-lambda loops (whose one-time
  * Janino compilation dominated the similarity queries).
  */
object QCosineImpl {
  /** round-half-AWAY-FROM-ZERO, matching Spark's round() and DuckDB's
    * round() — math.round would round -312.5 to -312 instead of -313.
    */
  @inline private def q(v: Double): Long =
    if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong

  def qcosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = q(a.getFloat(i).toDouble * 10000)
      val y = q(b.getFloat(i).toDouble * 10000)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

case class QCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qcosine expects (array<float>, array<float>), got $other")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    QCosineImpl.qcosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[QCosineImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.qcosine($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "qcosine"
}
