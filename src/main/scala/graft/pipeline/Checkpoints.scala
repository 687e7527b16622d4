package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tokens
import graft.core.Tokens.TokenRange

/** Checkpoint state table — the reference's resumability spine (T2):
  * one row per token range, `checkpoint = range_end` iff the range is
  * fully migrated; progress is only ever recorded at whole-range
  * completion, so a resume re-runs whole ranges and relies on the
  * idempotent sink (snapshot_use_pyspark.py:143-177, 284-286).
  *
  * Test binding is a parquet path; the production binding is a small JDBC
  * table — same three columns, same semantics (seed once, fetch incomplete,
  * mark complete).
  */
final case class CheckpointRange(range_id: Long, range_start: Long, range_end: Long, checkpoint: Long) {
  def complete: Boolean = checkpoint == range_end
}

class Checkpoints(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Seed the state table iff empty/absent (reference seed_ranges_if_empty). */
  def seedIfEmpty(ranges: Seq[TokenRange]): Unit =
    if (!exists) {
      ranges.map(r => CheckpointRange(r.rangeId.toLong, r.start, r.end, r.start))
        .toDF().write.mode(SaveMode.Overwrite).parquet(path)
    }

  def exists: Boolean =
    try { spark.read.parquet(path).schema.nonEmpty }
    catch { case _: Throwable => false }

  def all(): Seq[CheckpointRange] =
    spark.read.parquet(path).as[CheckpointRange].collect().toSeq.sortBy(_.range_id)

  /** Ranges still to migrate: checkpoint < range_end (reference S6/P5). */
  def fetchIncomplete(): Seq[CheckpointRange] =
    all().filter(r => !r.complete)

  /** Mark ranges complete (whole-range granularity, like the reference). */
  def markComplete(rangeIds: Seq[Long]): Unit = {
    val ids = rangeIds.toSet
    val updated = all().map { r =>
      if (ids.contains(r.range_id)) r.copy(checkpoint = r.range_end) else r
    }
    // rewrite-in-place via temp path (parquet has no in-place update; the
    // JDBC binding does an UPDATE instead)
    val tmp = path + ".tmp"
    updated.toDF().write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  def stateDf(): DataFrame = spark.read.parquet(path)
}
