package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class RollingFingerprintSpec extends AnyFunSuite {
  private def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** Brute-force reference: hash every window independently. */
  private def ref(text: String, w0: Int = RollingFingerprintImpl.Window): Long = {
    val b = text.getBytes("UTF-8")
    if (b.isEmpty) return 0L
    val w = math.min(w0, b.length)
    val hashes = (0 to b.length - w).map { s =>
      b.slice(s, s + w).foldLeft(0L)((h, c) =>
        (h * RollingFingerprintImpl.B + (c & 0xff)) % RollingFingerprintImpl.P)
    }
    hashes.min
  }

  test("rolling computation equals independent per-window hashing") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog and keeps on running far away",
      "a" * 200, "short", "", "x" * 63, "y" * 64, "z" * 65,
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    samples.foreach { s =>
      assert(RollingFingerprintImpl.fingerprint(u8(s)) == ref(s), s"text='${s.take(20)}...'")
    }
  }

  test("fingerprint is robust to edits away from the minimizing window") {
    val spark = graft.SparkTestBase.spark
    val texts = graft.core.Tables.documents(spark, graft.SparkTestBase.Sf0001)
      .select("text").collect().map(_.getString(0)).take(200)
    val stable = texts.count { t =>
      RollingFingerprintImpl.fingerprint(u8(t)) ==
        RollingFingerprintImpl.fingerprint(u8(t + " trailing edit"))
    }
    // appending text can only add windows at the end; the min survives
    // unless a new window hashes lower — expect the vast majority stable
    assert(stable >= texts.length * 0.8, s"only $stable/${texts.length} stable")
  }
}
