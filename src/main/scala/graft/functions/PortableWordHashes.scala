package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable per-word hashes of a text, in one pass.
  *
  * Bit-for-bit equal to the HOF/DuckDB formulation used by the d6b/d7b
  * portable twins (see graft.ops.Dedup):
  *
  *   words  = filter(split(text, ' '), w -> w != '')
  *   h(w)   = fold(chars, 7, (acc, c) -> (acc*31 + codepoint(c)) % 1e9+7)
  *   out(w) = ((h(w) * 48271) % (2^31-1) * 48271) % (2^31-1)
  *
  * All intermediates < 2^62 (ANSI-safe); the double MINSTD multiply
  * diffuses the polynomial's low bits across the 31-bit range. Chars are
  * compared as code units, matching Spark/DuckDB `ascii()` on BMP text
  * (the fixtures are pure ASCII, where byte = char = codepoint).
  *
  * Replaces a per-char HOF lambda chain with one static call in codegen.
  */
object PortableWordHashesImpl {
  val PolyP = 1000000007L
  val SigP = 2147483647L
  val Lehmer = 48271L

  def wordHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var acc = 7L
        while (i < n && s.charAt(i) != ' ') {
          acc = (acc * 31 + s.charAt(i).toLong) % PolyP
          i += 1
        }
        out += ((acc * Lehmer) % SigP * Lehmer) % SigP
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class PortableWordHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_word_hashes expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PortableWordHashesImpl.wordHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[PortableWordHashesImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.wordHashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableWordHashes =
    copy(child = newChild)

  override def prettyName: String = "portable_word_hashes"
}
