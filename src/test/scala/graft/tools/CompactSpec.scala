package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Compaction must (1) size output from input bytes, (2) lose nothing,
  * and (3) restore the range-clustered layout so later range predicates
  * prune whole files — checked the same way WriterShapeSpec checks
  * first-write layout.
  */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("compaction: many tiny files -> byte-sized file count, rows intact, disjoint ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // simulate streaming-ingest debris: 32 tiny files in random key order
    spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
      .repartition(32)
      .write.parquet(s"$base/tiny")
    val tinyFiles = new java.io.File(s"$base/tiny").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(tinyFiles.length == 32)
    val bytes = tinyFiles.map(_.length).sum

    // target ~ half the input -> expect exactly 2 output files
    val (before, after, seenBytes) =
      Compact.run(spark, s"$base/tiny", s"$base/compacted", "o_orderkey",
        targetBytes = (bytes + 1) / 2)
    assert(before == 32 && seenBytes == bytes)
    assert(after == 2, s"expected 2 compacted files, got $after")

    // nothing lost, nothing duplicated
    val src = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
    val out = spark.read.parquet(s"$base/compacted")
    assert(out.count() == src.count())
    assert(out.select(sum(col("o_orderkey"))).head.getLong(0) ==
      src.select(sum(col("o_orderkey"))).head.getLong(0))

    // pruning layout restored: per-file key ranges disjoint again
    val ranges = new java.io.File(s"$base/compacted").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("o_orderkey"), max("o_orderkey")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"compacted file ranges overlap: hi=$hi lo2=$lo2")
      case _ =>
    }
  }
}
