package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CassandraMurmur3Spec extends AnyFunSuite {

  test("empty input hashes to 0 (murmur3 x64_128 seed 0 canonical)") {
    assert(CassandraMurmur3.hash3_x64_128_first(Array.emptyByteArray) == 0L)
  }

  test("Long.MinValue result would normalize to MaxValue") {
    // normalize is private; exercise via the public contract: tokens never
    // equal Long.MinValue (Cassandra's Murmur3Partitioner invariant that
    // makes half-open (MIN, hi] ranges cover the ring)
    (0L until 20000L).foreach { k =>
      assert(CassandraMurmur3.tokenOfLong(k) != Long.MinValue)
    }
  }

  test("bigint token equals token of its 8-byte big-endian serialization") {
    for (k <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)) {
      val b = java.nio.ByteBuffer.allocate(8).putLong(k).array()
      assert(CassandraMurmur3.tokenOfLong(k) == CassandraMurmur3.tokenOfBytes(b))
    }
  }

  test("sign-extension path: high-bit tail bytes produce the Cassandra variant") {
    // 0x80 in a tail position must be sign-extended ((long)b = -128), not
    // masked (0x80). If someone "fixes" the tail to the canonical masked
    // form these regression values change.
    val t1 = CassandraMurmur3.tokenOfBytes(Array(0x80.toByte))
    val t2 = CassandraMurmur3.tokenOfBytes(Array(0x7f.toByte))
    assert(t1 != t2)
    // deterministic across calls
    assert(t1 == CassandraMurmur3.tokenOfBytes(Array(0x80.toByte)))
  }

  test("matches an independent implementation (cross-language vectors)") {
    // Expected values computed by a separately-written Python
    // implementation of Cassandra's Murmur3 variant (sign-extended tail,
    // MIN->MAX normalization) — covers negative keys whose big-endian
    // serialization exercises the 0xFF sign-extension path.
    val longVectors = Seq(
      -1L -> 7071048584287372947L,
      -42L -> 3581121715631347611L,
      Long.MinValue -> 9204767954415360687L,
      1L -> 6292367497774912474L,
      42L -> 8623491988607824794L,
      Long.MaxValue -> -1722304415079482439L)
    longVectors.foreach { case (k, expected) =>
      assert(CassandraMurmur3.tokenOfLong(k) == expected, s"key $k")
    }
    assert(CassandraMurmur3.tokenOfBytes("hello".getBytes("UTF-8")) ==
      -3758069500696749310L)
    assert(CassandraMurmur3.tokenOfBytes("key with ÿ high bytes".getBytes("UTF-8")) ==
      1152624536983467756L)
  }

  test("all tail lengths 1..16 hash without error and differ") {
    val tokens = (1 to 16).map { len =>
      CassandraMurmur3.tokenOfBytes(Array.tabulate(len)(i => (i * 37 + 128).toByte))
    }
    assert(tokens.distinct.size == tokens.size)
  }
}
