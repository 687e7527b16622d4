package graft.functions

/** Cassandra-compatible Murmur3 partitioner token (reference F1:
  * `token(pk)` — snapshot_use_pyspark.py:217, ring domain [-2^63, 2^63-1]
  * at :14-15).
  *
  * Spark's builtin `hash()` is Murmur3_x86_32 and `xxhash64` is xxHash —
  * neither matches Cassandra's token (SURVEY.md §2.6 F1). Cassandra uses
  * MurmurHash3_x64_128 with seed 0 over the serialized partition key and
  * takes the first 64-bit half, with two quirks that are part of the wire
  * contract and are reproduced here:
  *
  *  1. tail bytes are SIGN-EXTENDED (Cassandra's Java port casts signed
  *     bytes to long without masking — a known deviation from the canonical
  *     algorithm, kept forever for ring compatibility);
  *  2. a result of Long.MinValue is normalized to Long.MaxValue
  *     (Murmur3Partitioner.normalize), so MIN_TOKEN is never emitted —
  *     which is why half-open (MIN, hi] ranges cover the ring.
  *
  * Key serialization follows Cassandra's type layout: bigint keys as
  * 8-byte big-endian, text keys as UTF-8 bytes.
  */
object CassandraMurmur3 {

  /** Token of a bigint partition key (8-byte big-endian serialization). */
  def tokenOfLong(key: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (key >>> (56 - 8 * i)).toByte; i += 1 }
    normalize(hash3_x64_128_first(b))
  }

  /** Token of a text partition key (UTF-8 serialization). */
  def tokenOfBytes(key: Array[Byte]): Long = normalize(hash3_x64_128_first(key))

  private def normalize(v: Long): Long =
    if (v == Long.MinValue) Long.MaxValue else v

  /** First 64 bits of Cassandra's MurmurHash3_x64_128, seed 0. */
  def hash3_x64_128_first(data: Array[Byte]): Long = {
    val length = data.length
    val nblocks = length >> 4
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = 0L
    var h2 = 0L

    var i = 0
    while (i < nblocks) {
      var k1 = getBlock(data, i * 16)
      var k2 = getBlock(data, i * 16 + 8)

      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // tail — NOTE: bytes are sign-extended ((long) b), matching Cassandra's
    // Java implementation, NOT the canonical (b & 0xff) variant.
    val off = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = length & 15
    if (rem >= 15) k2 ^= data(off + 14).toLong << 48
    if (rem >= 14) k2 ^= data(off + 13).toLong << 40
    if (rem >= 13) k2 ^= data(off + 12).toLong << 32
    if (rem >= 12) k2 ^= data(off + 11).toLong << 24
    if (rem >= 11) k2 ^= data(off + 10).toLong << 16
    if (rem >= 10) k2 ^= data(off + 9).toLong << 8
    if (rem >= 9) { k2 ^= data(off + 8).toLong
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2 }
    if (rem >= 8) k1 ^= data(off + 7).toLong << 56
    if (rem >= 7) k1 ^= data(off + 6).toLong << 48
    if (rem >= 6) k1 ^= data(off + 5).toLong << 40
    if (rem >= 5) k1 ^= data(off + 4).toLong << 32
    if (rem >= 4) k1 ^= data(off + 3).toLong << 24
    if (rem >= 3) k1 ^= data(off + 2).toLong << 16
    if (rem >= 2) k1 ^= data(off + 1).toLong << 8
    if (rem >= 1) { k1 ^= data(off).toLong
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1 }

    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2 // h2 + h1 would be the second half; we only need the first
    h1
  }

  private def getBlock(d: Array[Byte], off: Int): Long = {
    // little-endian 8-byte block
    (d(off) & 0xffL) |
      ((d(off + 1) & 0xffL) << 8) |
      ((d(off + 2) & 0xffL) << 16) |
      ((d(off + 3) & 0xffL) << 24) |
      ((d(off + 4) & 0xffL) << 32) |
      ((d(off + 5) & 0xffL) << 40) |
      ((d(off + 6) & 0xffL) << 48) |
      ((d(off + 7) & 0xffL) << 56)
  }

  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }
}
