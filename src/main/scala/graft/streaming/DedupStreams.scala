package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash-LSH near-dup detection — the d6b pipeline running
  * continuously on a document stream via the v2 arbitrary-state API.
  *
  * Shape: the signature/banding stages are the SAME deterministic column
  * programs as batch (graft.ops.Dedup.portableSignatures / bandedKeys —
  * scan-side codegen, no state), so the only stateful piece is the
  * bucket membership: keyed by (band, bucket-hash), a ListState holds
  * the doc ids seen in that bucket, and each arriving doc emits one
  * candidate pair per existing member, then joins the list.
  *
  * At scale this is the streaming twin of the batch band-key equi-join:
  * state is partitioned by the same band keys the batch job shuffles on,
  * and only (band, bh, doc_id) longs cross the network. A production
  * deployment would put a TTL on the bucket state (TTLConfig) and cap
  * membership like the batch spam-bucket guard; both knobs are where
  * this processor points at them.
  */
object DedupStreams {

  final case class BandKey(band: Long, bh: Long)
  final case class BandRow(band: Long, bh: Long, doc_id: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  class BucketPairProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[BandKey, BandRow, CandidatePair] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig, TimerValues}

    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // production knob: TTLConfig(Duration) ages buckets out; the twin
      // of the batch pipeline's spam-bucket cap
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: BandKey, rows: Iterator[BandRow], tv: TimerValues): Iterator[CandidatePair] = {
      val existing = if (seen.exists()) seen.get().toArray else Array.empty[Long]
      val fresh = rows.map(_.doc_id).toArray.distinct.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
      val members = scala.collection.mutable.ArrayBuffer.empty[Long] ++ existing
      fresh.foreach { id =>
        if (!members.contains(id)) {
          members.foreach { m =>
            out += CandidatePair(math.min(m, id), math.max(m, id))
          }
          members += id
          seen.appendValue(id)
        }
      }
      out.iterator
    }
  }

  /** Candidate near-dup pairs from a streaming (doc_id, text) source.
    * Pairs may repeat across band keys (two docs sharing several bands),
    * exactly like the pre-`distinct` batch pair stream — the consumer
    * dedupes (batch does it with `.distinct()`, a streaming consumer
    * with `dropDuplicates` within a watermark).
    */
  def candidatePairs(docStream: DataFrame): Dataset[CandidatePair] = {
    val spark = docStream.sparkSession
    import spark.implicits._
    graft.ops.Dedup.bandedKeys(graft.ops.Dedup.portableSignatures(docStream))
      .as[BandRow]
      .groupByKey(r => BandKey(r.band, r.bh))
      .transformWithState(
        new BucketPairProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[CandidatePair]])
  }
}
