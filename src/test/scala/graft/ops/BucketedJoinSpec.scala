package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketing = the co-located join story at scale: when both sides of a
  * join are bucketed by the join key into the same bucket count, Spark
  * joins bucket-to-bucket with NO shuffle exchange of either side — the
  * 100 TB pattern for repeated joins against the same key (load once,
  * bucketed; every later join is exchange-free). This spec proves the
  * property at the plan level, against the contrast case.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    import spark.implicits._
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tOrders = s"b_orders_$suffix"
    val tLines = s"b_lines_$suffix"
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val l = spark.read.parquet(s"${SparkTestBase.Sf0001}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(tOrders)
      l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tLines)

      val joined = spark.table(tLines)
        .join(spark.table(tOrders), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val plan = executedPlan(joined)
      // the join itself must be exchange-free: both sides arrive
      // pre-partitioned by bucket, and the aggregation reuses that
      // partitioning — so the WHOLE plan has no shuffle
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free bucketed join plan, got:\n$plan")

      // contrast: the same join over the raw (unbucketed) parquet MUST
      // shuffle both sides
      val rawPlan = executedPlan(
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("q")))
      assert(rawPlan.contains("Exchange"),
        "contrast case should shuffle — did the fixture shrink below join thresholds?")

      // and the bucketed join returns the same result as the raw join
      val a = joined.orderBy("o_orderkey").collect()
      val b = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("o_orderkey").collect()
      assert(a.length == b.length && a.zip(b).forall { case (x, y) => x.toSeq == y.toSeq })
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql(s"DROP TABLE IF EXISTS $tOrders")
      spark.sql(s"DROP TABLE IF EXISTS $tLines")
    }
  }
}
