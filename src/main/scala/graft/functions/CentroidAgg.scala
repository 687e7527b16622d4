package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable buffer: exact int64 per-dimension sums of quantized components
  * plus the row count. Quantization matches the engine's similarity math
  * (round(x*10^4) half-away-from-zero as int64) so merges are exact and
  * order-independent — the property that makes the result reproducible
  * across any partitioning and oracle-hashable.
  */
final case class CentroidBuf(sums: Array[Long], n: Long)

/** Typed Aggregator (the engine's UDAF surface, SURVEY §2.8): per-group
  * centroid of embedding vectors in quantized units. reduce/merge are the
  * partial/final pattern — map-side combine happens automatically, so at
  * scale only (dim longs + count) per group crosses the shuffle.
  */
class CentroidAgg(dim: Int)(
    implicit bufEnc: Encoder[CentroidBuf], outEnc: Encoder[Array[Double]])
    extends Aggregator[(Int, Array[Float]), CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(new Array[Long](dim), 0L)

  @inline private def q(v: Double): Long =
    if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong

  override def reduce(b: CentroidBuf, a: (Int, Array[Float])): CentroidBuf = {
    val vec = a._2
    // a NULL embedding carries no signal: skip it (no count increment)
    // instead of NPEing the task — nullable vectors are routine in
    // scraped corpora and the fixture schema declares them nullable
    if (vec == null) return b
    val m = math.min(dim, vec.length)
    var i = 0
    while (i < m) { b.sums(i) += q(vec(i).toDouble * 10000); i += 1 }
    CentroidBuf(b.sums, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    CentroidBuf(x.sums, x.n + y.n)
  }

  override def finish(b: CentroidBuf): Array[Double] =
    b.sums.map(_.toDouble / b.n) // quantized units; exact int -> IEEE double

  override def bufferEncoder: Encoder[CentroidBuf] = bufEnc
  override def outputEncoder: Encoder[Array[Double]] = outEnc
}
