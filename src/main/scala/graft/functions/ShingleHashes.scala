package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word 3-gram shingles of a text, in one pass.
  *
  * Equivalent to transform(distinct 3-grams of split(text,' '),
  * s -> pmod(xxhash64(s), P)) but with no intermediate strings: because
  * words are single-space separated, the 3-gram "w_i w_i+1 w_i+2" is
  * exactly the byte slice of the original text from w_i's start to
  * w_i+2's end — so each shingle hash is XXH64 over a slice of the input
  * buffer (seed 42 = Spark's xxhash64), deduplicated via a hash set.
  * Texts with fewer than 3 words hash as a single whole-text shingle.
  *
  * Replaces a split-per-lambda HOF pipeline whose repeated regex splits
  * and Janino codegen dominated the near-dup query's runtime.
  */
object ShingleHashesImpl {
  import MinHashImpl.P

  def shingleHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // materialized once; slices index into it
    val n = bytes.length
    // word start offsets
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    var inWord = false
    while (i < n) {
      if (bytes(i) == ' '.toByte) inWord = false
      else if (!inWord) { starts += i; inWord = true }
      i += 1
    }
    def wordEnd(wi: Int): Int = {
      var e = if (wi + 1 < starts.length) starts(wi + 1) - 1 else n
      // trim trailing spaces between words (single-space text: e is exact)
      while (e > 0 && e - 1 < n && bytes(e - 1) == ' '.toByte) e -= 1
      e
    }
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(starts.length - 2, 1))
    if (starts.length < 3) {
      val h = XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, n, 42L)
      out += ((h % P) + P) % P
    } else {
      var w = 0
      while (w + 2 < starts.length) {
        val from = starts(w)
        val until = wordEnd(w + 2)
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
        val hp = ((h % P) + P) % P
        if (seen.add(hp)) out += hp
        w += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashesImpl.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[ShingleHashesImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.shingleHashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}
