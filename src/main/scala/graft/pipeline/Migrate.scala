package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sanitize, Tokens}
import graft.core.Tokens.TokenRange

/** The end-to-end migration pipeline — the reference's main() re-expressed
  * Spark-first (SURVEY.md §3.1):
  *
  *   split ring (T1) -> seed checkpoints (T2) -> loop:
  *     scan incomplete ranges (S1/P4) -> sanitize (P7) -> project/rename
  *     (P1/P3) -> idempotent range-partitioned sink (K1) -> verify counts
  *     per range (T5) -> mark checkpoints (K3)
  *   -> global validation row (T6/K4).
  *
  * Differences from the reference, deliberate and Spark-idiomatic:
  *  - one Spark job processes ALL incomplete ranges (partition pruning by
  *    range predicate), not a Python loop over per-range connections;
  *  - the idempotent sink is dynamic-partition-overwrite parquet keyed by
  *    range_id: re-running a range atomically replaces its output — the
  *    same effectively-once contract as INSERT IGNORE on a unique key,
  *    without row-level conflict churn (at-least-once + idempotent sink);
  *  - batch ids are deterministic (range_id), not time-derived — fixing the
  *    reference's collision-prone time.time()*1000+i (SURVEY §7.4).
  *
  * Test binding: parquet source/sink. Production binding: Cassandra
  * connector source (token ranges = native input splits) and the JDBC
  * INSERT IGNORE sink in JdbcSink.
  */
final case class MigrateConfig(
    srcPath: String,
    keyCol: String,
    numRanges: Int,
    sinkPath: String,
    checkpointPath: String,
    policy: Sanitize.NullPolicy = Sanitize.NullPolicy(),
    renames: Map[String, String] = Map.empty,
    // Token function + ring are pluggable (SURVEY §7.4): the oracle-ring
    // multiplicative hash by default (DuckDB-checkable), full signed-64
    // ring with xxhash64 or cassandra_token for production parity.
    tokenFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column = Tokens.tokenOracle,
    ringMin: Long = Tokens.OracleRingMin,
    ringMax: Long = Tokens.OracleRingMax,
    // test hook: ranges whose processing throws (simulates executor death)
    failRanges: Set[Long] = Set.empty)

final case class ValidationRow(
    table_name: String, src_count: Long, dst_count: Long, diff: Long, status: String)

class Migrate(spark: SparkSession, cfg: MigrateConfig) {
  import spark.implicits._

  private val ranges: Seq[TokenRange] =
    Tokens.split(cfg.numRanges, cfg.ringMin, cfg.ringMax)
  private val checkpoints = new Checkpoints(spark, cfg.checkpointPath)

  private def source(): DataFrame = spark.read.parquet(cfg.srcPath)

  private def tokenized(): DataFrame =
    source()
      .withColumn("token_key", cfg.tokenFn(col(cfg.keyCol)))
      .withColumn("range_id", Tokens.rangeId(col("token_key"), cfg.numRanges, cfg.ringMin, cfg.ringMax))

  /** One driver iteration: process every incomplete range in a single
    * distributed job; returns the ranges completed this pass.
    */
  def runOnce(): Seq[Long] = {
    checkpoints.seedIfEmpty(ranges)
    val todo = checkpoints.fetchIncomplete()
    if (todo.isEmpty) return Seq.empty
    val todoIds = todo.map(_.range_id)

    if (cfg.failRanges.intersect(todoIds.toSet).nonEmpty)
      throw new RuntimeException(s"induced failure for ranges ${cfg.failRanges}")

    val renamed = cfg.renames.foldLeft(
      Sanitize.sanitize(tokenized(), cfg.policy)) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }

    // Idempotent sink: overwrite exactly the range_id partitions being
    // (re)processed; untouched partitions survive (dynamic mode).
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    renamed
      .where(col("range_id").isin(todoIds: _*))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("range_id")
      .parquet(cfg.sinkPath)

    // Per-range verification (T5): expected vs written counts.
    val expected = tokenized().where(col("range_id").isin(todoIds: _*))
      .groupBy("range_id").agg(count(lit(1)).as("e"))
    val actual = spark.read.parquet(cfg.sinkPath)
      .where(col("range_id").isin(todoIds: _*))
      .groupBy("range_id").agg(count(lit(1)).as("a"))
    val mismatched = expected.join(actual, Seq("range_id"), "left")
      .where(col("a").isNull || col("e") =!= col("a"))
      .select("range_id").as[Long].collect()
    if (mismatched.nonEmpty)
      throw new RuntimeException(s"range verification failed: ${mismatched.mkString(",")}")

    checkpoints.markComplete(todoIds)
    todoIds
  }

  /** Drive to completion (reference main loop), bounded passes. */
  def run(maxPasses: Int = 3): Unit = {
    var pass = 0
    while (checkpointsIncomplete() && pass < maxPasses) {
      runOnce()
      pass += 1
    }
  }

  def checkpointsIncomplete(): Boolean = {
    checkpoints.seedIfEmpty(ranges)
    checkpoints.fetchIncomplete().nonEmpty
  }

  /** Global validation (T6): source count vs sink count, persisted row. */
  def validate(): ValidationRow = {
    val srcCount = source().count()
    val dstCount =
      try spark.read.parquet(cfg.sinkPath).count()
      catch { case _: Throwable => 0L }
    val diff = math.abs(srcCount - dstCount)
    ValidationRow("migrated", srcCount, dstCount, diff,
      if (diff == 0) "OK" else "MISMATCH")
  }
}
