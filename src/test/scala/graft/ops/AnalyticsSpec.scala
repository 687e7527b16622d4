package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("approx_count_distinct is within its configured error of exact") {
    import org.apache.spark.sql.functions._
    // raw estimate (the judged query exposes only the accuracy contract)
    val r = graft.core.Tables.lineitem(spark, graft.SparkTestBase.Sf0001)
      .agg(countDistinct(col("l_orderkey")).as("exact_keys"),
           approx_count_distinct(col("l_orderkey"), 0.02).as("approx_keys"))
      .head()
    val exact = r.getAs[Long]("exact_keys")
    val approx = r.getAs[Long]("approx_keys")
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
    // and the judged contract row must say the bound holds
    val judged = SparkEntry_q("a9_approx_distinct").head
    assert(judged.getAs[Boolean]("approx_within_5pct"))
  }

  test("rollup emits the grand total and per-status subtotals") {
    val rows = SparkEntry_q("a8_rollup")
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getAs[Long]("n")).sum
    assert(grand.head.getAs[Long]("n") == total)
  }

  private def SparkEntry_q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTestBase.Sf0001).collect()

  test("a26 basket-array pair enumeration equals the self-join formulation on cap edges") {
    // Crafted corpus forcing the edges the fixture may not hit: a basket
    // of exactly MaxBasket (=64, kept), one of MaxBasket+1 (dropped
    // whole), 1-item baskets (no pairs), duplicate (order, part) lines
    // (distinct-collapsed before counting), parts straddling the
    // apriori c >= 3 prune, and support ties so the lift tiebreak in the
    // final ordering is exercised.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = scala.collection.mutable.Buffer.empty[(Long, Long)]
    // parts 1..5 co-occur across orders 1..4 (support >= 3 for 1,2,3)
    rows ++= Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
                 (3L, 1L), (3L, 2L), (3L, 3L), (4L, 4L), (4L, 5L))
    rows += ((1L, 1L)) // duplicate line: must collapse before pair counts
    // order 10: exactly MaxBasket surviving items (parts 100..163, each
    // also in orders 11,12 so every part passes the c >= 3 prune)
    (100L to 163L).foreach { p => rows ++= Seq((10L, p), (11L, p), (12L, p)) }
    // order 20: MaxBasket+1 surviving items -> entire basket dropped
    (200L to 264L).foreach { p => rows ++= Seq((20L, p), (21L, p), (22L, p)) }
    // 1-item baskets
    rows ++= Seq((30L, 1L), (31L, 2L))
    val dir = java.nio.file.Files.createTempDirectory("a26spec").toString
    rows.toSeq.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // naive reference: the pre-rewrite self-join formulation, inline
    val MaxBasket = 64L
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nOrders = op.select(countDistinct(col("o")).as("n_orders"))
    val pc = op.groupBy("p").agg(count(lit(1)).as("c"))
    val opPruned = op
      .join(pc.where(col("c") >= 3).select("p"), Seq("p"), "left_semi")
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("o")))
      .where(col("bsz") <= MaxBasket)
      .select("o", "p")
    val expected = opPruned.toDF("o", "pa")
      .join(opPruned.toDF("o", "pb"), "o")
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("both_c"))
      .where(col("both_c") >= 3)
      .join(pc.toDF("pa", "ca"), "pa")
      .join(pc.toDF("pb", "cb"), "pb")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_micro",
        expr("cast(both_c as decimal(38,0)) * n_orders * 1000000 div (cast(ca as decimal(38,0)) * cb)"))
      .select("pa", "pb", "both_c", "ca", "cb", "lift_micro")
      .orderBy(col("both_c").desc, col("lift_micro").desc, col("pa"), col("pb"))
      .limit(50)
      .collect().map(_.toSeq).toSeq

    val got = graft.SparkEntry.queries("a26_market_basket")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == expected, s"expected:\n${expected.mkString("\n")}\ngot:\n${got.mkString("\n")}")

    // the cap edges actually bit: order 10's 64-basket contributes pairs,
    // order 20's 65-basket contributes none
    val pairs = got.map(r => (r(0), r(1)))
    assert(pairs.exists { case (a, _) => a == 100L },
      "exactly-MaxBasket basket must survive")
    assert(!pairs.exists { case (a, _) => a.asInstanceOf[Long] >= 200L },
      "over-cap basket must be dropped whole")
    graft.ops.PipelineCache.release()
    spark.sharedState.cacheManager.clearCache()
  }
}
