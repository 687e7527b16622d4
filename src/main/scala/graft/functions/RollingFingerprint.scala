package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint (Rabin-Karp / winnowing-style).
  *
  * One pass over the UTF-8 bytes computes the polynomial hash
  * h(i) = sum b[i+j] * B^(w-1-j) mod P of every w-byte window via the
  * rolling update (multiply, add, subtract the outgoing byte's power);
  * the fingerprint is the MINIMUM window hash — stable under edits that
  * do not touch the minimizing window, which is what makes it a useful
  * near-identity for shingled dedup pipelines (robustness asserted in
  * RollingFingerprintSpec). Texts shorter than the window hash whole.
  *
  * B = 257, P = 1e9+7: products stay < 2^38, so the arithmetic is exact
  * int64 with no overflow under ANSI mode.
  */
object RollingFingerprintImpl {
  val B = 257L
  val P = 1000000007L
  val Window = 64

  def fingerprint(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(Window, n)
    // B^(w-1) mod P for removing the outgoing byte
    var powW = 1L
    var i = 0
    while (i < w - 1) { powW = powW * B % P; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * powW % P + P) % P
      h = (h * B + (bytes(i) & 0xff)) % P
      if (h < min) min = h
      i += 1
    }
    min
  }
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingFingerprintImpl.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[RollingFingerprintImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.fingerprint($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}
