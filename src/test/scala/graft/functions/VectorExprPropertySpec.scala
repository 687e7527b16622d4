package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property check of the vector codegen expressions against an
  * independent BigInt formulation (no overflow possible in the
  * reference, so any int64 overflow or rounding bug in the fast path
  * diverges): 2000 seeded random vectors across dims 1..64, plus the
  * documented edge shapes (zeros, extreme components, dim mismatch).
  */
class VectorExprPropertySpec extends AnyFunSuite {

  private def q(x: Float): BigInt = {
    val v = x.toDouble * 10000
    BigInt(if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong)
  }
  private def arr(a: Array[Float]) = new GenericArrayData(a.map(x => x: Any))
  private def arrL(a: Array[Long]) = new GenericArrayData(a.map(x => x: Any))

  test("qdot_long and qnorm2 match the BigInt reference on random vectors") {
    val rnd = new scala.util.Random(42)
    for (i <- 0 until 2000) {
      val dim = 1 + rnd.nextInt(64)
      val a = Array.fill(dim)(rnd.nextFloat() * 4 - 2)
      val c = Array.fill(dim)(rnd.nextLong() % 20001L)
      val dotRef = (0 until dim).map(j => q(a(j)) * BigInt(c(j))).sum
      val n2Ref = (0 until dim).map(j => q(a(j)) * q(a(j))).sum
      assert(BigInt(QDotLongImpl.dot(arr(a), arrL(c))) == dotRef, s"dot diverged at trial $i")
      assert(BigInt(QDotLongImpl.norm2(arr(a))) == n2Ref, s"norm2 diverged at trial $i")
    }
  }

  test("l2_long matches the BigInt reference on random integer vectors") {
    val rnd = new scala.util.Random(13)
    for (i <- 0 until 2000) {
      val dim = 1 + rnd.nextInt(64)
      val a = Array.fill(dim)(rnd.nextLong() % 20001L)
      val b = Array.fill(dim)(rnd.nextLong() % 20001L)
      val ref = (0 until dim).map(j => (BigInt(a(j)) - BigInt(b(j))).pow(2)).sum
      assert(BigInt(QDotLongImpl.l2(arrL(a), arrL(b))) == ref, s"l2 diverged at trial $i")
    }
  }

  test("hyperplane_bucket, sig32 and sig64 match a BigInt sign computation on random vectors") {
    val rnd = new scala.util.Random(7)
    val planes = HyperplaneBucketImpl.planes
    val wide = HyperplaneBucketImpl.planesWide
    val full = HyperplaneBucketImpl.planes64
    for (i <- 0 until 2000) {
      val dim = 1 + rnd.nextInt(64)
      val a = Array.fill(dim)(rnd.nextFloat() * 4 - 2)
      def sig(ps: Array[Array[Int]]): Long = {
        var ref = 0L
        for (j <- ps.indices) {
          val dot = (0 until dim).map(k => q(a(k)) * BigInt(ps(j)(k))).sum
          if (dot > 0) ref |= 1L << j
        }
        ref
      }
      assert(HyperplaneBucketImpl.bucket(arr(a)) == sig(planes), s"bucket diverged at trial $i")
      assert(HyperplaneBucketImpl.sig32(arr(a)) == sig(wide), s"sig32 diverged at trial $i")
      assert(HyperplaneBucketImpl.sig64(arr(a)) == sig(full), s"sig64 diverged at trial $i")
    }
  }

  test("edge shapes: zeros, extremes, dim mismatch fails loudly") {
    val zeros = Array.fill(64)(0.0f)
    assert(QDotLongImpl.norm2(arr(zeros)) == 0L)
    assert(HyperplaneBucketImpl.bucket(arr(zeros)) == 0L)
    // extreme quantized components still fit int64 accumulation
    val big = Array.fill(64)(2.0f)
    val n2 = QDotLongImpl.norm2(arr(big))
    assert(n2 == 64L * 20000L * 20000L)
    // mismatched dims fail loudly: qdot_long/l2_long are registered for
    // arbitrary SQL use, and a silent min-length truncation would return
    // a plausible but wrong distance
    val c3 = Array(1L, 2L, 3L)
    intercept[IllegalArgumentException](QDotLongImpl.dot(arr(big), arrL(c3)))
    intercept[IllegalArgumentException](QDotLongImpl.l2(arrL(c3), arrL(Array(1L, 2L))))
    // negative half-away rounding: float(-0.00015) * 10^4 ~= -1.50000007
    // rounds AWAY to -2 (math.round would give -1); norm2 = 4
    val neg = Array(-0.00015f)
    assert(QDotLongImpl.norm2(arr(neg)) == 4L)
  }

  test("jaccard_sorted matches the set formulation on random sorted-distinct arrays") {
    val rnd = new scala.util.Random(99)
    for (i <- 0 until 2000) {
      // overlapping draws from a small domain force real intersections
      val dom = 1 + rnd.nextInt(400)
      val a = Array.fill(1 + rnd.nextInt(250))(rnd.nextInt(dom).toLong).distinct.sorted
      val b = Array.fill(1 + rnd.nextInt(250))(rnd.nextInt(dom).toLong).distinct.sorted
      val sa = a.toSet; val sb = b.toSet
      val ref = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      val got = JaccardSortedImpl.jaccard(arrL(a), arrL(b))
      assert(got == ref, s"jaccard diverged at trial $i: got $got want $ref")
    }
    // empty edges: the SQL 0/0 would raise under ANSI; the expression is
    // total and returns 0.0 (documented contract)
    assert(JaccardSortedImpl.jaccard(arrL(Array.empty[Long]), arrL(Array.empty[Long])) == 0.0)
    assert(JaccardSortedImpl.jaccard(arrL(Array(1L, 2L)), arrL(Array.empty[Long])) == 0.0)
    // disjoint and identical
    assert(JaccardSortedImpl.jaccard(arrL(Array(1L, 2L)), arrL(Array(3L, 4L))) == 0.0)
    assert(JaccardSortedImpl.jaccard(arrL(Array(1L, 2L, 3L)), arrL(Array(1L, 2L, 3L))) == 1.0)
  }
}
