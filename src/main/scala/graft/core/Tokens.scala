package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-ring partitioning: the reference's core source-partitioning scheme
  * (adaptive_token_split, snapshot_use_pyspark.py:107-137): split the token
  * domain into n contiguous half-open ranges `(start, end]` with no gaps or
  * overlaps, last end clamped to the domain max. The split is pure driver
  * math — it deliberately ignores size estimates "to guarantee no gaps".
  *
  * Token functions (reference F1, token(pk) at snapshot_use_pyspark.py:217):
  *  - [[tokenOracle]]: a multiplicative hash into [0, 2^32) that DuckDB can
  *    evaluate with identical integer arithmetic — used for oracle-checked
  *    queries (the token function is pluggable per SURVEY.md §7.4).
  *  - [[tokenXx]]: xxhash64 over the full signed-64 ring — the scale path.
  *  - graft.functions.cassandra_murmur3_token: exact Cassandra Murmur3
  *    partitioner parity (custom codegen Expression).
  */
object Tokens {

  /** Half-open token range `(start, end]`. */
  final case class TokenRange(rangeId: Int, start: Long, end: Long)

  val RingMin: Long = Long.MinValue // exclusive lower bound of the full ring
  val RingMax: Long = Long.MaxValue

  /** Oracle ring: tokens live in [0, 2^32); lower bound exclusive at -1. */
  val OracleRingMin: Long = -1L
  val OracleRingMax: Long = (1L << 32) - 1

  /** Split `(min, max]` into n contiguous half-open ranges. BigInt math so
    * the full signed-64 ring (2^64 wide) cannot overflow; mirrors the
    * reference's `step = 2^64 // n` + clamp-last-end-to-MAX semantics.
    */
  def split(n: Int, min: Long = RingMin, max: Long = RingMax): Seq[TokenRange] = {
    require(n > 0, "n ranges must be positive")
    // domain width = max - min (min itself is exclusive); for the full ring
    // this is 2^64 - 1 tokens over (MIN, MAX] which matches Cassandra's
    // Murmur3Partitioner (MIN is never emitted).
    val lo = BigInt(min)
    val hi = BigInt(max)
    // Inclusive-domain width, like the reference's TOTAL_TOKENS = 2^64
    // (snapshot_use_pyspark.py:114): for the full ring this makes
    // step = 2^64 / n exactly; the remainder lands in the clamped last range.
    val width = hi - lo + 1
    val step = width / n
    require(step > 0, s"n=$n too large for domain ($min, $max]")
    (0 until n).map { i =>
      val s = lo + step * i
      val e = if (i == n - 1) hi else lo + step * (i + 1)
      TokenRange(i, s.toLong, e.toLong)
    }
  }

  /** The split as a DataFrame (range_id, range_start, range_end) — driver
    * compute shipped to the cluster as a (tiny, broadcastable) relation.
    */
  def splitDf(spark: SparkSession, n: Int, min: Long = RingMin, max: Long = RingMax): DataFrame = {
    import spark.implicits._
    split(n, min, max).toDF("range_id", "range_start", "range_end")
  }

  // ---- token functions --------------------------------------------------

  /** Multiplicative (Knuth-style) hash into [0, 2^32): deterministic,
    * DuckDB-expressible with plain BIGINT arithmetic, overflow-free for
    * non-negative keys < 2^32 (key * 2654435761 < 2^63). Used so the oracle
    * can recompute identical tokens.
    */
  def tokenOracle(key: Column): Column =
    (key * lit(2654435761L) + lit(104729L)) % lit(4294967296L)

  /** Same hash as DuckDB SQL text (for SparkEntry.oracleSql). */
  def tokenOracleSql(key: String): String =
    s"((($key) * 2654435761 + 104729) % 4294967296)"

  /** Full-ring 64-bit token (scale path): xxhash64 of the key. */
  def tokenXx(key: Column): Column = xxhash64(key)

  /** range_id of an oracle-ring token for an n-way split (n must divide
    * 2^32, e.g. a power of two): integer division by the step.
    */
  def oracleRangeId(tok: Column, n: Int): Column = {
    val step = 4294967296L / n
    floor(tok / lit(step)).cast("long")
  }

  def oracleRangeIdSql(tok: String, n: Int): String = {
    val step = 4294967296L / n
    s"(($tok) // $step)"
  }

  /** range_id for an n-way split of any supported ring.
    *
    * Full signed-64 ring (power-of-two n): arithmetic-shift bucketing —
    * `((tok - 1) >> (64 - log2 n)) + n/2` after Cassandra-style
    * normalization of MIN to MAX (MIN is excluded from the ring, so
    * tok - 1 cannot overflow). The -1 makes the closed range END
    * (MIN + (i+1)*step) land in bucket i, matching the half-open
    * `(start, end]` split.
    *
    * Compact non-negative rings (oracle ring): plain floor division.
    */
  def rangeId(tok: Column, n: Int, min: Long = RingMin, max: Long = RingMax): Column =
    if (min == RingMin && max == RingMax) {
      require(Integer.bitCount(n) == 1 && n > 1, s"full-ring split needs power-of-two n, got $n")
      val shift = 64 - Integer.numberOfTrailingZeros(n)
      val norm = when(tok === lit(Long.MinValue), lit(Long.MaxValue)).otherwise(tok)
      (shiftright(norm - lit(1L), shift) + lit(n / 2L)).cast("long")
    } else {
      require(min == OracleRingMin && max == OracleRingMax,
        s"unsupported ring ($min, $max]")
      oracleRangeId(tok, n)
    }

  /** Half-open range predicate `(start, end]` — reference P4
    * (snapshot_use_pyspark.py:219-220).
    */
  def inRange(tok: Column, r: TokenRange): Column =
    tok > lit(r.start) && tok <= lit(r.end)

  def inRangeSql(tok: String, r: TokenRange): String =
    s"(($tok) > ${r.start} AND ($tok) <= ${r.end})"
}
