package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a shingle set, as a single Catalyst expression.
  *
  * Semantically identical to the higher-order-function formulation
  *   array(min((pmod(xxhash64(s), P) * A_j + B_j) % P) for j < K)
  * but generated code is ONE static call instead of K transform loops —
  * the HOF version compiled to a huge Janino class whose one-time codegen
  * cost (~90 s) dwarfed execution. One traversal of the shingle array
  * updates all K mins (SURVEY §7.3: custom Expression where the builtin
  * composition can't express the computation efficiently).
  *
  * Hash matches Spark's xxhash64 (XXH64, seed 42) so results are
  * interchangeable with the HOF pipeline.
  */
object MinHashImpl {
  val P: Long = 2147483647L // 2^31 - 1
  val K: Int = 32
  val Bands: Int = 8
  val Rows: Int = K / Bands

  // Fixed-seed permutation coefficients — stable across sessions/runs,
  // which resumable dedup state requires.
  private val rnd = new scala.util.Random(42)
  val A: Array[Long] = Array.fill(K)(1L + rnd.nextInt(Int.MaxValue - 1))
  val B: Array[Long] = Array.fill(K)(rnd.nextInt(Int.MaxValue).toLong)

  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        update(mins, ((h % P) + P) % P)
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Signature from pre-hashed (pmod P) shingles, e.g. shingle_hashes(). */
  def sigFromHashes(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) update(mins, hashes.getLong(i))
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def update(mins: Array[Long], hp: Long): Unit = {
    var j = 0
    while (j < K) {
      val v = (hp * A(j) + B(j)) % P
      if (v < mins(j)) mins(j) = v
      j += 1
    }
  }
}

case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> or array<long>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def fromStrings: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromStrings) MinHashImpl.sig(input.asInstanceOf[ArrayData])
    else MinHashImpl.sigFromHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[MinHashImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (fromStrings) "sig" else "sigFromHashes"
    defineCodeGen(ctx, ev, c => s"$m.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
