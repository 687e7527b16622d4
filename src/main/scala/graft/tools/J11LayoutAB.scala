package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Edges, Joins}

/** Interleaved A/B for the r15 j11 cache-layout change, because the box
  * inflates CPU totals 2-3x between back-to-back reps (the r14 lesson:
  * adjudicate layout changes inside ONE session, alternating variants,
  * and compare per-variant BEST — box noise hits both arms equally).
  *
  * A = the r14 shape: unpartitioned edge cache + degree-annotated second
  *     117M-row cache (src, dst, d), per-edge `rank div d`.
  * B = the r15 shape: ONE edge cache hash-partitioned by src, degree
  *     joined into the 1.6M-row rank table per superstep.
  *
  * Both arms run the full query body (trades -> ranked top-20) and are
  * checked to return identical rows. Storage footprint per arm is read
  * from the storage status right after the loop materializes.
  *
  *   sbt "runMain graft.tools.J11LayoutAB /tmp/sf10 3"
  */
object J11LayoutAB {

  private def trades(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()

  private def finish(loop: DataFrame): DataFrame =
    loop
      .withColumn("kind", when(col("node") % 2 === 1, "supplier").otherwise("customer"))
      .withColumn("key", expr("node div 2"))
      .orderBy(col("rank").desc, col("node"))
      .select("kind", "key", "rank")
      .limit(20)

  /** r14 shape, reconstructed verbatim from Joins.scala@e23f463. */
  private def variantA(spark: SparkSession, sfDir: String): DataFrame = {
    val unit = 1000000L
    val edges = Edges.symmetrize(trades(spark, sfDir), col("c"), col("sp")).persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
    val edgesD = edges.repartition(col("src")).join(deg, "src")
      .select("src", "dst", "d").persist()
    graft.ops.PipelineCache.retain(edges, deg, edgesD)
    val rank0 = deg.select(col("src").as("node"), lit(unit).as("rank"))
    val damp = 850000L; val base = 150000L
    def superstepA(rank: DataFrame): DataFrame =
      edgesD.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("rank div d").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("in_sum"))
        .select(col("dst").as("node"),
                (lit(base) + expr(s"($damp * in_sum) div $unit")).as("rank"))
    // same checkpointed loop discipline as pagerankLoop, A-shaped step
    edgesD.count()
    var rank = rank0
    var prev: Set[Int] = Set.empty
    val sc = spark.sparkContext
    for (i <- 1 to 3) {
      val next = superstepA(rank)
      rank = if (i < 3) {
        val before = sc.getPersistentRDDs.keySet.toSet
        val cp = next.localCheckpoint(true)
        val mine = sc.getPersistentRDDs.keySet.toSet -- before
        prev.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        prev = mine
        cp
      } else next
    }
    val last = prev
    graft.ops.PipelineCache.retainCleanup { () =>
      last.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    finish(rank)
  }

  /** r15 shape = the registered query body. */
  private def variantB(spark: SparkSession, sfDir: String): DataFrame =
    Joins.pagerankRanked(spark, trades(spark, sfDir))

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

    var rowsA: Seq[String] = Nil
    var rowsB: Seq[String] = Nil
    def run(tag: String, body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = body.collect().map(_.toString).toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      if (tag == "A") rowsA = out else rowsB = out
      println(f"AB $tag wall=$wall%6.1fs cachedMB=${spark.sparkContext.getRDDStorageInfo.map(_.memSize / 1e6).sum}%8.0f ${metrics.snapshotAndReset()}")
      graft.ops.PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
    }

    for (r <- 1 to rounds) {
      println(s"--- round $r ---")
      run("A", variantA(spark, sfDir))
      run("B", variantB(spark, sfDir))
      require(rowsA == rowsB, s"A/B result mismatch:\nA=$rowsA\nB=$rowsB")
      println("rows identical: ok")
    }
    spark.stop()
  }
}
