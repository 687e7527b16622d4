package graft.core

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.rng.Seed

import graft.core.Tokens.{RingMax, RingMin, TokenRange}

/** Property-based pins for the ring math that every scan partition at
  * 100 TB depends on. The unit specs pin hand-picked cases; these
  * generalize the same invariants over generated inputs with
  * boundary-biased token generators (range edges are exactly where
  * off-by-one ring bugs live). Seeded for reproducible CI runs.
  */
object TokensProps extends Properties("Tokens") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(0xC0FFEEL)).withMinSuccessfulTests(500)

  // --- generators --------------------------------------------------------

  /** Arbitrary split widths, biased toward small and power-of-two. */
  private val genN: Gen[Int] =
    Gen.oneOf(Gen.choose(1, 64), Gen.choose(1, 8192),
              Gen.oneOf(1, 2, 4, 8, 256, 1024, 65536))

  /** Power-of-two widths for the full-ring O(1) bucketing path. */
  private val genPow2: Gen[Int] = Gen.choose(1, 20).map(1 << _)

  /** A proper subring (min < max) within the signed-64 domain wide enough
    * for the largest generated n.
    */
  private val genSubring: Gen[(Long, Long)] = for {
    a <- Gen.choose(Long.MinValue, Long.MaxValue - (1L << 20))
    w <- Gen.choose(1L << 17, Long.MaxValue)
    b = if (a + w < a) Long.MaxValue else a + w // overflow clamp
  } yield (a, b)

  /** Tokens biased to the edges of an n-way split of (min, max]. */
  private def genToken(ranges: Seq[TokenRange], min: Long, max: Long): Gen[Long] = {
    val edges = ranges.flatMap(r => Seq(r.start, r.end)).flatMap(e =>
      Seq(e - 1, e, e + 1)).filter(t => t > min && t <= max)
    Gen.oneOf(Gen.choose(min + 1, max), Gen.oneOf(edges))
  }

  // --- split shape -------------------------------------------------------

  property("split tiles (min, max]: contiguous, ordered, clamped") =
    Prop.forAll(genN, genSubring) { case (n, (min, max)) =>
      val rs = Tokens.split(n, min, max)
      val contiguous = rs.sliding(2).forall {
        case Seq(a, b) => a.end == b.start
        case _         => true
      }
      Prop.all(
        Prop(rs.size == n) :| "n ranges",
        Prop(rs.head.start == min) :| "first start = ring min (exclusive)",
        Prop(rs.last.end == max) :| "last end clamped to ring max",
        Prop(contiguous) :| "no gaps or overlaps between neighbors",
        Prop(rs.forall(r => r.start < r.end)) :| "no empty or wrapped range (P8)",
        Prop(rs.map(_.rangeId) == (0 until n)) :| "dense range ids"
      )
    }

  property("every token lands in exactly one half-open range") =
    Prop.forAll(genN, genSubring) { case (n, (min, max)) =>
      val rs = Tokens.split(n, min, max)
      Prop.forAll(genToken(rs, min, max)) { t =>
        val hits = rs.count(r => t > r.start && t <= r.end)
        Prop(hits == 1) :| s"token $t hit $hits ranges"
      }
    }

  // --- O(1) bucketing vs the range table ---------------------------------

  /** Pure mirror of the full-ring rangeId Column arithmetic
    * (Tokens.rangeId): MIN normalized to MAX, then arithmetic shift.
    */
  private def fullRingIdMirror(tok: Long, n: Int): Long = {
    val shift = 64 - Integer.numberOfTrailingZeros(n)
    val norm = if (tok == Long.MinValue) Long.MaxValue else tok
    ((norm - 1L) >> shift) + n / 2L
  }

  property("full-ring O(1) rangeId agrees with linear search over split") =
    Prop.forAll(genPow2.suchThat(_ > 1)) { n =>
      val rs = Tokens.split(n, RingMin, RingMax)
      Prop.forAll(genToken(rs, RingMin, RingMax)) { t =>
        val byTable = rs.find(r => t > r.start && t <= r.end).map(_.rangeId.toLong)
        val byArith = fullRingIdMirror(t, n)
        Prop(byTable.contains(byArith)) :|
          s"token $t: table says $byTable, arithmetic says $byArith (n=$n)"
      }
    }

  property("oracle-ring rangeId agrees with linear search over split") =
    Prop.forAll(Gen.oneOf(2, 4, 8, 64, 256, 65536)) { n =>
      val rs = Tokens.split(n, Tokens.OracleRingMin, Tokens.OracleRingMax)
      val step = 4294967296L / n
      Prop.forAll(genToken(rs, Tokens.OracleRingMin, Tokens.OracleRingMax)) { t =>
        val byTable = rs.find(r => t > r.start && t <= r.end).map(_.rangeId.toLong)
        val byArith = t / step // mirror of oracleRangeId floor division
        Prop(byTable.contains(byArith)) :|
          s"token $t: table says $byTable, floor-div says $byArith (n=$n)"
      }
    }

  // --- Murmur3 token contract --------------------------------------------

  property("cassandra token never emits MIN_TOKEN (normalize contract)") =
    Prop.forAll(Gen.long) { k =>
      Prop(graft.functions.CassandraMurmur3.tokenOfLong(k) != Long.MinValue)
    }

  property("cassandra text token never emits MIN_TOKEN, any byte content") =
    Prop.forAll(Gen.listOfN(32, Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      Prop.forAll(Gen.choose(0, 32)) { len =>
        val tok = graft.functions.CassandraMurmur3.tokenOfBytes(bs.take(len).toArray)
        Prop(tok != Long.MinValue)
      }
    }

  /** The split + token functions must compose: any long key's token falls
    * in exactly one of the 256 production ranges — the invariant the whole
    * migrate pipeline (T1 x F1) rests on.
    */
  property("token(key) lands in exactly one production range") = {
    val rs = Tokens.split(256, RingMin, RingMax)
    Prop.forAll(Gen.long) { k =>
      val t = graft.functions.CassandraMurmur3.tokenOfLong(k)
      Prop(rs.count(r => t > r.start && t <= r.end) == 1)
    }
  }
}
