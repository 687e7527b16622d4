package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of a float vector, one pass.
  *
  * bit j = sign of <quantized vec, plane j> over the fixed seeded plane
  * table; exact int64 arithmetic (|dot| <= 64 * 10^4*|x| * 500 << 2^63),
  * identical semantics to the 8-aggregate HOF formulation it replaces
  * (graft.ops.Similarity LSH bucketing) but the generated code is ONE
  * static call instead of eight array-lambda loops — the same
  * HOF-vs-codegen tradeoff as qcosine/portable_word_hashes.
  *
  * The plane table here is the single source of truth: the DataFrame API
  * and the oracle SQL's literal VALUES table both read it, so the bucket
  * assignment stays cross-engine exact.
  */
object HyperplaneBucketImpl {
  val NPlanes = 8
  val Dim = 64

  /** Deterministic random-hyperplane coefficients (fixed seed — bucket
    * assignment must be stable across runs and engines).
    */
  val planes: Array[Array[Int]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NPlanes)(Array.fill(Dim)(rnd.nextInt(1001) - 500))
  }

  /** Wider table for BANDED near-dup search: 32 planes = 4 independent
    * 8-bit band signatures (256 buckets per band — bucket count must be
    * large enough that per-bucket populations, not the corpus, bound the
    * candidate join; a 2-bit band key made candidates quadratic at 10x
    * scale). Separate seed keeps the 8-plane table (v3's oracle) stable.
    */
  val NPlanesWide = 32
  val planesWide: Array[Array[Int]] = {
    val rnd = new scala.util.Random(11)
    Array.fill(NPlanesWide)(Array.fill(Dim)(rnd.nextInt(1001) - 500))
  }

  /** Full-width table for CORPUS-SIZED banding: 64 planes = 4 independent
    * 16-bit band signatures (65,536 buckets per band). Band width is a
    * function of corpus size — with B buckets per band the candidate
    * join costs ~ n²/B pairs on non-dup data, so B must track n to keep
    * per-bucket populations (and therefore candidates per vector)
    * constant: 8-bit bands are right up to ~10^5 vectors, 16-bit bands
    * carry ~10^7; beyond that, widen again. The DedupScaleProbe tool
    * measures exactly this knee. Separate seed keeps the 8/32-plane
    * tables (v3/d22 oracles) stable.
    */
  val NPlanes64 = 64
  val planes64: Array[Array[Int]] = {
    val rnd = new scala.util.Random(13)
    Array.fill(NPlanes64)(Array.fill(Dim)(rnd.nextInt(1001) - 500))
  }

  /** round-half-AWAY-FROM-ZERO, matching Spark round() / DuckDB round(). */
  @inline private def q(v: Double): Long =
    if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong

  def bucket(a: ArrayData): Long = {
    val n = math.min(a.numElements(), Dim)
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) { qv(i) = q(a.getFloat(i).toDouble * 10000); i += 1 }
    var b = 0L
    var j = 0
    while (j < NPlanes) {
      val p = planes(j)
      var dot = 0L
      i = 0
      while (i < n) { dot += qv(i) * p(i); i += 1 }
      if (dot > 0) b |= 1L << j
      j += 1
    }
    b
  }

  /** 32-bit signature over the wide plane table (bit j = sign against
    * planesWide(j)); band b of the near-dup search reads bits
    * [8b, 8b+8).
    */
  def sig32(a: ArrayData): Long = {
    val n = math.min(a.numElements(), Dim)
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) { qv(i) = q(a.getFloat(i).toDouble * 10000); i += 1 }
    var b = 0L
    var j = 0
    while (j < NPlanesWide) {
      val p = planesWide(j)
      var dot = 0L
      i = 0
      while (i < n) { dot += qv(i) * p(i); i += 1 }
      if (dot > 0) b |= 1L << j
      j += 1
    }
    b
  }

  /** 64-bit signature over the full-width plane table (bit j = sign
    * against planes64(j)); band b of a 16-bit banding reads bits
    * [16b, 16b+16). Bit 63 uses the sign bit — band extraction must
    * mask after the shift (`shiftright(sig, 48) & 65535`), which both
    * Spark and DuckDB arithmetic shifts satisfy.
    */
  def sig64(a: ArrayData): Long = {
    val n = math.min(a.numElements(), Dim)
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) { qv(i) = q(a.getFloat(i).toDouble * 10000); i += 1 }
    var b = 0L
    var j = 0
    while (j < NPlanes64) {
      val p = planes64(j)
      var dot = 0L
      i = 0
      while (i < n) { dot += qv(i) * p(i); i += 1 }
      if (dot > 0) b |= 1L << j
      j += 1
    }
    b
  }
}

case class HyperplaneBucket(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket expects array<float>, got $other")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneBucketImpl.bucket(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[HyperplaneBucketImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$m.bucket($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

/** 32-bit wide-table signature (see HyperplaneBucketImpl.sig32). */
case class HyperplaneSig32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig32 expects array<float>, got $other")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneBucketImpl.sig32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[HyperplaneBucketImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$m.sig32($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig32 =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig32"
}

/** 64-bit full-width signature (see HyperplaneBucketImpl.sig64). */
case class HyperplaneSig64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig64 expects array<float>, got $other")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneBucketImpl.sig64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[HyperplaneBucketImpl.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$m.sig64($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig64 =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig64"
}
