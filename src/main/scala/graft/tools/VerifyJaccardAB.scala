package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Interleaved A/B for the MinHash verify stage's Jaccard formulation
  * (r15): A = size(array_intersect)/size(array_union) (two hash sets +
  * two materialized arrays per pair), B = jaccard_sorted merge walk
  * over sort_array'd shingle sets (sorted once per DOCUMENT side).
  * Runs the full portable verify pipeline (band candidates + verify)
  * both ways over the same persisted signature table, checks exact
  * result equality (count + order-independent checksum over doc_a,
  * doc_b, jaccard), and reports wall + listener CPU per arm.
  *
  *   sbt "runMain graft.tools.VerifyJaccardAB /tmp/sf10 3"
  */
object VerifyJaccardAB {

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
    graft.GraftExtensions.register(spark)
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)

    def verified(base: DataFrame, sorted: Boolean): DataFrame = {
      val pairs = Dedup.portableCandidatePairs(base)
      val hs =
        if (sorted) base.select(col("doc_id"), sort_array(col("hpos")).as("hpos"))
        else base.select(col("doc_id"), col("hpos"))
      val joined = pairs
        .join(hs.select(col("doc_id").as("doc_a"), col("hpos").as("h_a")), Seq("doc_a"))
        .join(hs.select(col("doc_id").as("doc_b"), col("hpos").as("h_b")), Seq("doc_b"))
      val jac =
        if (sorted) call_function("jaccard_sorted", col("h_a"), col("h_b"))
        else size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
          size(array_union(col("h_a"), col("h_b")))
      joined.withColumn("jaccard", jac)
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    }

    var sums = Map.empty[String, (Long, java.math.BigDecimal)]
    def run(tag: String, sorted: Boolean): Unit = {
      val base = Dedup.portableSigTable(spark, sfDir).persist()
      base.count() // materialize the shared input outside the timed window
      ProfileD39.drainListenerBus(spark)
      metrics.snapshotAndReset()
      val t0 = System.nanoTime()
      val row = verified(base, sorted)
        .agg(count(lit(1)).as("n"),
             sum(xxhash64(col("doc_a"), col("doc_b"), col("jaccard"))
               .cast("decimal(38,0)")).as("h"))
        .collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      sums += tag -> (row.getLong(0), row.getDecimal(1))
      println(f"AB $tag wall=$wall%6.1fs pairs=${row.getLong(0)} ${metrics.snapshotAndReset()}")
      base.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }

    for (r <- 1 to rounds) {
      println(s"--- round $r ---")
      run("A", sorted = false)
      run("B", sorted = true)
      require(sums("A") == sums("B"),
        s"A/B mismatch: A=${sums("A")} B=${sums("B")}")
      println("count+checksum identical: ok")
    }
    spark.stop()
  }
}
