package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The streaming LSH near-dup pipeline must produce exactly the batch
  * pipeline's candidate pairs on the same corpus — signatures and band
  * keys are shared column programs, so the only thing under test is the
  * stateful bucket membership (pairs across micro-batches, no pair lost
  * when members arrive in different batches, no self/duplicate pairs).
  */
class DedupStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming LSH candidate pairs equal the batch banded pairs across batches") {
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real corpus + one planted exact dup so at least one candidate
      // pair is guaranteed to span the two micro-batches
      val docs = spark.read.parquet(s"${SparkTestBase.Sf0001}/documents.parquet")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val planted = (999999L, docs.head._2)
      val all = docs :+ planted
      val (batch1, batch2) = all.splitAt(all.size / 2)

      val mem = MemoryStream[(Long, String)](spark)
      val out = DedupStreams.candidatePairs(mem.toDF().toDF("doc_id", "text"))
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("stream_pairs").start()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()

      val streamed = spark.sql("SELECT * FROM stream_pairs").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

      val batchDocs = spark.createDataFrame(all).toDF("doc_id", "text")
      val expected = graft.ops.Dedup.portableCandidatePairs(
          graft.ops.Dedup.portableSignatures(batchDocs))
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

      assert(expected.nonEmpty, "corpus produced no candidate pairs; test is vacuous")
      assert(streamed == expected,
        s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
      // the planted dup pair must have spanned the batch boundary or not —
      // either way it is present
      assert(streamed.exists { case (a, b) => b == 999999L || a == 999999L })
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // Streaming EXACT dedup — the watermark-bounded counterpart of
  // d1/d2: dropDuplicatesWithinWatermark keys state by id but evicts
  // entries once the watermark passes (eventTime + delay), so state
  // stays bounded by the dup-arrival window instead of growing with
  // the full key universe — the property that makes streaming exact
  // dedup viable at 100 TB/day ingest.
  test("dropDuplicatesWithinWatermark: cross-batch dups dropped, state evicted after the watermark") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)](spark)
    val deduped = mem.toDF().toDF("id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("exact_dedup").start()
    // batch 1: id 1 arrives twice in-batch, id 2 once
    mem.addData((1L, 100L), (2L, 110L), (1L, 105L))
    q.processAllAvailable()
    // batch 2: id 1 repeats across the batch boundary (within watermark) — dropped
    mem.addData((1L, 130L), (3L, 140L))
    q.processAllAvailable()
    // batch 3: jump event time far ahead so the watermark passes every
    // earlier entry's expiry and their state is evicted
    mem.addData((9L, 10000L))
    q.processAllAvailable()
    // batch 4: id 2 reappears AFTER its state expired — re-emitted
    mem.addData((2L, 10100L))
    q.processAllAvailable()
    q.stop()

    val ids = spark.sql("SELECT id FROM exact_dedup").collect().map(_.getLong(0)).toSeq
    assert(ids.count(_ == 1L) == 1, s"id 1 must be emitted exactly once, got $ids")
    assert(ids.count(_ == 3L) == 1 && ids.count(_ == 9L) == 1)
    assert(ids.count(_ == 2L) == 2,
      s"id 2 must re-emit after its dedup state expired with the watermark, got $ids")
  }
}
