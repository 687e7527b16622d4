package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tokens._

/** Split invariants from the reference (snapshot_use_pyspark.py:107-137,
  * FIXTURES.md): n contiguous half-open ranges, no gaps/overlaps, full
  * coverage, last end clamped to ring max.
  */
class TokensSpec extends AnyFunSuite {

  test("full-ring split: 256 ranges tile (-2^63, 2^63-1] with no gaps") {
    val rs = split(256)
    assert(rs.size == 256)
    assert(rs.head.start == Long.MinValue)
    assert(rs.last.end == Long.MaxValue)
    rs.sliding(2).foreach { case Seq(a, b) =>
      assert(a.end == b.start, s"gap/overlap between ${a.rangeId} and ${b.rangeId}")
    }
    // step = 2^64/256 = 2^56 exactly, like the reference's math split
    assert(rs.head.end - rs.head.start == (1L << 56))
  }

  test("split covers every token exactly once (small domains, exhaustive)") {
    for (n <- 1 to 16; (lo, hi) <- Seq((0L, 257L), (-50L, 203L), (10L, 11L + n))) {
      val rs = split(n, lo, hi)
      (lo + 1 to hi).foreach { t =>
        val owners = rs.filter(r => t > r.start && t <= r.end)
        assert(owners.size == 1, s"n=$n domain=($lo,$hi] token $t owned by ${owners.size}")
      }
      assert(rs.head.start == lo && rs.last.end == hi)
      rs.sliding(2).foreach {
        case Seq(a, b) => assert(a.end == b.start)
        case _         =>
      }
    }
  }

  test("oracle ring split agrees with oracleRangeId floor-division") {
    val n = 16
    val rs = split(n, OracleRingMin, OracleRingMax)
    val step = 4294967296L / n
    rs.foreach { r =>
      // both the first and last token OF the range floor-divide to its id
      assert((r.start + 1) / step == r.rangeId)
      assert(r.end / step == r.rangeId)
    }
    // last range end is the ring max and maps into the last bucket
    assert(rs.last.end == OracleRingMax && OracleRingMax / step == n - 1)
  }

  test("no wrapped ranges (reference P8 invariant)") {
    for (n <- Seq(1, 2, 3, 7, 16, 64, 256, 1024))
      split(n).foreach(r => assert(r.start < r.end, s"wrapped range at n=$n"))
  }

  // Bridge between the property suite's pure mirror (TokensProps
  // .fullRingIdMirror) and the REAL Column arithmetic: evaluate
  // Tokens.rangeId through Spark on every range edge (+/-1) and MIN/MAX
  // specials, and require table-lookup agreement. A divergence between
  // the Catalyst expression and the pure mirror would invalidate the
  // 500-sample property runs silently; this pins them together.
  test("rangeId Column evaluated by Spark matches the split table at all edges") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    for (n <- Seq(2, 16, 256, 4096)) {
      val rs = split(n)
      val toks = (rs.flatMap(r => Seq(r.start - 1, r.start, r.start + 1,
                                       r.end - 1, r.end, r.end + 1)) ++
        Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue))
        .filter(t => t > Long.MinValue || t == Long.MinValue) // keep MIN: normalization path
        .distinct
      val got = toks.toDF("tok")
        .select($"tok", Tokens.rangeId($"tok", n).as("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      toks.foreach { t =>
        // MIN is not on the ring; the Column normalizes it to MAX's bucket
        val expect =
          if (t == Long.MinValue) Some((n - 1).toLong)
          else rs.find(r => t > r.start && t <= r.end).map(_.rangeId.toLong)
        expect.foreach { e =>
          assert(got(t) == e, s"n=$n tok=$t: Spark says ${got(t)}, table says $e")
        }
      }
    }
  }
}
