package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sanitize, Tokens}

/** Interleaved A/B for the t2 sink-write path (r16). The r16 ProfileQuery
  * run at sf10 put ~90% of t2's CPU in ONE stage — `parquet at
  * Migrate.scala:43` (354/305/269 CPU-s over three reps, 10.42 GB memory
  * spill, 10-12 s GC each): the dynamic-partition parquet write inserts a
  * per-task SORT on range_id so only one file writer is open at a time,
  * and that sort buffers the task's entire slice.
  *
  * A = status-quo write: partitionBy("range_id") with the planner's
  *     sort-based dynamic-partition writer.
  * B = same write with spark.sql.maxConcurrentOutputFileWriters > #ranges:
  *     Spark's concurrent-writer path keeps one open writer per range and
  *     skips the sort entirely (falling back to sort-the-rest only if a
  *     task exceeds the cap — the safety net at high range counts).
  *
  * Both arms write the EXACT t2 frame (tokenize -> sanitize -> rename ->
  * range filter) to separate sink dirs; each round asserts the two sinks
  * hold identical content via per-range (count, xxhash64-sum) checksums.
  *
  *   sbt "runMain graft.tools.T2WriteAB /tmp/sf10 3"
  */
object T2WriteAB {

  private val NumRanges = 16

  /** The t2 out-frame, mirroring Migrate.runOnce at its judged config. */
  private def outFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val tokenized = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("token_key", Tokens.tokenOracle(col("l_orderkey")))
      .withColumn("range_id", Tokens.rangeId(col("token_key"), NumRanges,
        Tokens.OracleRingMin, Tokens.OracleRingMax))
    Sanitize.sanitize(tokenized, Sanitize.NullPolicy())
      .withColumnRenamed("l_orderkey", "file_id")
      .where(col("range_id").isin((0L until NumRanges.toLong): _*))
  }

  private def checksum(spark: SparkSession, path: String): Seq[String] = {
    val df = spark.read.parquet(path)
    val dataCols = df.columns.sorted.map(col).toSeq
    df.groupBy("range_id")
      .agg(count(lit(1)).as("n"),
           // DECIMAL(38,0): 60M summed int64 hashes overflow long under ANSI
           sum(xxhash64(dataCols: _*)
             .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
      .orderBy("range_id")
      .collect().map(_.toString).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)

    val base = java.nio.file.Files.createTempDirectory("graft_t2ab").toString
    val sinkA = s"$base/sinkA"
    val sinkB = s"$base/sinkB"
    val key = "spark.sql.maxConcurrentOutputFileWriters"

    def write(tag: String, sinkPath: String): Unit = {
      if (tag == "B") spark.conf.set(key, NumRanges + 1)
      val t0 = System.nanoTime()
      outFrame(spark, sfDir)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("range_id")
        .parquet(sinkPath)
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      if (tag == "B") spark.conf.unset(key)
      println(f"AB $tag wall=$wall%6.1fs ${metrics.snapshotAndReset()}")
    }

    for (r <- 1 to rounds) {
      println(s"--- round $r ---")
      write("A", sinkA)
      write("B", sinkB)
      val csA = checksum(spark, sinkA)
      val csB = checksum(spark, sinkB)
      require(csA == csB, s"A/B sink mismatch:\nA=$csA\nB=$csB")
      println(s"sinks identical: ok (${csA.size} ranges)")
    }
    spark.stop()
  }
}
