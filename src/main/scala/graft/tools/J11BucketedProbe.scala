package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded A/B for j11_pagerank's remaining 100x constant (round-10
  * verdict task #3): the dominant cost at scale is the orders |><|
  * lineitem DISTINCT edge build — would materializing the two
  * projections as orderkey-bucketed tables (the layout a real warehouse
  * amortizes across queries) make the build join shuffle-free and move
  * the headline?
  *
  *   A: the registered j11 shape — trades built by a plain shuffled
  *      join from parquet (graft/ops/Joins.scala j11_pagerank).
  *   B: identical query, but the build join reads bucketBy(32, orderkey)
  *      tables written ONCE outside the timed region. Spark's bucketed
  *      SMJ then needs no exchange on either join side; the (c, sp)
  *      distinct still shuffles (its key is not the bucket key — true in
  *      any layout).
  *
  * Protocol: per variant, 3 reps of min-of-2 (same as the bench's
  * honesty rule), fresh cache state between reps. Run at 100x
  * (/tmp/sf10) under a >=8x heap. Result lands in PLANS.md; either
  * outcome closes j11 permanently per the round-10 adjudication.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.J11BucketedProbe /tmp/sf10 3"
  */
object J11BucketedProbe {

  // The ENTIRE query body is the shared Joins.pagerankRanked — the A/B
  // varies only the trades build, so it can never again measure a
  // variant that silently diverged from the registered j11.
  private def pagerankFromTrades(s: SparkSession, trades: DataFrame): DataFrame =
    graft.ops.Joins.pagerankRanked(s, trades)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val warehouse = java.nio.file.Files.createTempDirectory("graft_j11_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tradesPlain(): DataFrame =
      graft.core.Tables.orders(spark, sfDir)
        .join(graft.core.Tables.lineitem(spark, sfDir),
              col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
        .distinct()

    // One-time bucketed materialization (amortized layout, untimed):
    // only the two join columns per side — the projection a warehouse
    // would cluster for this workload.
    println("[j11ab] writing bucketed projections (untimed layout step)...")
    val t0 = System.nanoTime()
    graft.core.Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .write.mode("overwrite").bucketBy(32, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("j11_orders_b")
    graft.core.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .write.mode("overwrite").bucketBy(32, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("j11_lineitem_b")
    println(f"[j11ab] bucketed write took ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def tradesBucketed(): DataFrame =
      spark.table("j11_orders_b")
        .join(spark.table("j11_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
        .distinct()

    def once(mk: () => DataFrame): Double = {
      graft.ops.PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t = System.nanoTime()
      pagerankFromTrades(spark, mk()).count()
      (System.nanoTime() - t) / 1e9
    }
    def minOf2(mk: () => DataFrame): Double = math.min(once(mk), once(mk))

    // warm both paths once (codegen/classload outside the measurement)
    once(tradesPlain _); once(tradesBucketed _)

    // evidence the bucketed build join is actually exchange-free
    val bPlan = tradesBucketed().queryExecution.executedPlan
    val buildKeys = ScanAudit.exchangeKeys(bPlan).flatten
    println(s"[j11ab] bucketed trades-build exchange keys: $buildKeys " +
      "(orderkey-keyed exchanges should be ABSENT; the (c,sp) distinct's remain)")

    val a = (1 to reps).map(_ => minOf2(tradesPlain _))
    val b = (1 to reps).map(_ => minOf2(tradesBucketed _))
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("[", ", ", "]")
    println(f"""{"probe":"j11_bucketed_ab","sf":"$sfDir","reps":$reps,""" +
      f""""plain_sec":${fmt(a)},"bucketed_sec":${fmt(b)},""" +
      f""""plain_best":${a.min}%.1f,"bucketed_best":${b.min}%.1f}""")
    spark.stop()
  }
}
