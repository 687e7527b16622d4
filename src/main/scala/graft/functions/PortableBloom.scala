package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A portable Bloom filter over long keys, built and probed entirely with
  * codegen'd column arithmetic — no UDF, no driver-side hashing of data
  * rows, no serialized sketch object in the plan.
  *
  * Shape at scale: `build` runs one scan of the (small) key side, shuffles
  * at most `Words` rows (word_idx, bits), and collects ≤ 8 KiB to the
  * driver — control-sized, like a centroid table. `mightContain` embeds
  * the bitset as ONE array literal and tests k bit positions with integer
  * ops, so the big side is pruned during its own scan, before any join
  * shuffle — the semi-join pushdown pattern (Spark's own runtime bloom
  * filter does the same thing; this one is explicit and portable).
  *
  * False positives are possible (eliminated by the exact join that
  * follows); false negatives are not — so composing
  * `where(mightContain) . join(dim, semi)` is result-identical to the
  * plain semi join, which is exactly what the oracle checks.
  */
object PortableBloom {

  /** 2^16 bits = 1024 longs (8 KiB) — sized so a dim side of a few
    * thousand keys stays well under ~10% fill (k=3 → FP rate < 1%).
    */
  val Bits: Long = 65536L
  val Words: Int = (Bits / 64).toInt

  /** Odd multipliers < 2^31: pmod(k, 2^32) * a stays below 2^63, so the
    * hash arithmetic never overflows under ANSI mode for any long key.
    */
  private val Hashes: Seq[(Long, Long)] =
    Seq((1540483477L, 104729L), (1103515245L, 12345L), (1013904223L, 7919L))

  private def positions(k: Column): Seq[Column] =
    Hashes.map { case (a, b) =>
      pmod(pmod(k, lit(4294967296L)) * lit(a) + lit(b), lit(Bits))
    }

  private def bitOf(p: Column): Column =
    call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))

  /** Build the bitset from a DataFrame of keys (distributed scan + one
    * word-keyed combine); returns the driver-side literal-to-be.
    */
  def build(keys: DataFrame, keyCol: String): Array[Long] = {
    // driver-sized: at most Words (= 1024) rows, 8 KiB of bitset
    val rows = keys
      .select(explode(array(positions(col(keyCol)): _*)).as("pos"))
      .select(expr("pos div 64").as("w"), bitOf(col("pos")).as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val arr = new Array[Long](Words)
    rows.foreach(r => arr(r.getAs[Long]("w").toInt) = r.getAs[Long]("bits"))
    arr
  }

  /** Membership probe as a pure Column over the literal bitset. */
  def mightContain(k: Column, bits: Array[Long]): Column = {
    val words = typedlit(bits.toSeq)
    positions(k).map { p =>
      val word = element_at(words, shiftright(p.cast("int"), 6) + lit(1))
      word.bitwiseAND(bitOf(p)) =!= lit(0L)
    }.reduce(_ && _)
  }
}
