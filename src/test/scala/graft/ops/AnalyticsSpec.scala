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
}
