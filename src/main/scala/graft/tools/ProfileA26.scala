package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Analytics, PipelineCache}

/** Scratch profiler for a26_market_basket (VERDICT r14 ask 2: a26 is now
  * the #1 cost row at sf0.1 — 3.21 s — and leaves the largest resident
  * state after j11 at sf10, 918 MB). Replays the query phase by phase
  * with the shared stage-metrics listener so a fix (if any) is aimed at
  * the measured stage: the distinct order-part projection, the per-item
  * support counts, basket assembly (semi-join + collect_list), the
  * map-side pair explode + count, and the lift join-back.
  *
  *   sbt "runMain graft.tools.ProfileA26 /tmp/sf10"
  */
object ProfileA26 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    def phase(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      println(f"PHASE $name%-22s wall=$wall%7.1fs rows=$rows%-12d ${metrics.snapshotAndReset()}")
    }

    // === the a26 pipeline, phase-bracketed (mirrors Analytics.scala a26) ===
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .persist()
    phase("op-distinct")(op.count())

    val nOrders = op.select(countDistinct(col("o")).as("n_orders"))
    val pc = op.groupBy("p").agg(count(lit(1)).as("c")).persist()
    phase("support-counts")(pc.count())

    val baskets = op
      .join(pc.where(col("c") >= 3).select("p"), Seq("p"), "left_semi")
      .groupBy("o").agg(sort_array(collect_list(col("p"))).as("ps"))
      .where(size(col("ps")) <= Analytics.MaxBasket && size(col("ps")) >= 2)
    phase("baskets")(baskets.count())

    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ps) - 2),
           i -> transform(slice(ps, i + 2, size(ps) - i - 1),
                          q -> struct(ps[i] AS pa, q AS pb))))""")).as("pr"))
      .select(col("pr.pa"), col("pr.pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("both_c"))
      .where(col("both_c") >= 3)
    phase("pair-explode-agg")(pairs.count())

    val lifted = pairs
      .join(pc.toDF("pa", "ca"), "pa")
      .join(pc.toDF("pb", "cb"), "pb")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_micro",
        expr("cast(both_c as decimal(38,0)) * n_orders * 1000000 div (cast(ca as decimal(38,0)) * cb)"))
      .select("pa", "pb", "both_c", "ca", "cb", "lift_micro")
      .orderBy(col("both_c").desc, col("lift_micro").desc, col("pa"), col("pb"))
      .limit(50)
    phase("joinback-lift")(lifted.count())

    op.unpersist(); pc.unpersist()
    PipelineCache.release()
    phase("full-query")(
      graft.SparkEntry.queries("a26_market_basket")(spark, sfDir).count())
    PipelineCache.release()
    spark.stop()
  }
}

/** Same harness for j11_pagerank (the other r14-ask-2 target: #2 cost
  * row at sf0.1 — 3.18 s — and the largest resident state at sf10,
  * 2.65 GB). Phases: the distinct trade-pair build, edge symmetrize,
  * degree table, the degree-annotated pre-partitioned edge cache, ONE
  * un-truncated superstep, the full 3-iteration checkpointed loop, and
  * the registered query end-to-end.
  *
  *   sbt "runMain graft.tools.ProfileJ11 /tmp/sf10"
  */
object ProfileJ11 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    def phase(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      println(f"PHASE $name%-22s wall=$wall%7.1fs rows=$rows%-12d ${metrics.snapshotAndReset()}")
    }

    // === the j11 pipeline, phase-bracketed (mirrors Joins.scala j11) ===
    def trades: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()
    phase("trades-distinct")(trades.count())

    val edges = graft.ops.Edges.symmetrize(trades, col("c"), col("sp"))
      .repartition(col("src")).persist()
    phase("edges-cache")(edges.count())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
    phase("degree")(deg.count())

    val unit = 1000000L
    val rank0 = deg.select(col("src").as("node"), lit(unit).as("rank"))
    phase("superstep-x1")(graft.ops.Joins.pagerankSuperstep(edges, deg, rank0).count())
    phase("loop-3-iters")(graft.ops.Joins.pagerankLoop(spark, edges, deg, rank0, 3).count())

    edges.unpersist(); deg.unpersist()
    PipelineCache.release()
    phase("full-query")(
      graft.SparkEntry.queries("j11_pagerank")(spark, sfDir).count())
    PipelineCache.release()
    spark.stop()
  }
}
