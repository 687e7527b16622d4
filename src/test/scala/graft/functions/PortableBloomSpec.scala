package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The portable Bloom filter's two contracts: NO false negatives (the
  * pruned semi join must equal the plain semi join — this is what makes
  * the j10 composition sound), and real pruning power (the reason to
  * bother: most non-matching rows are dropped at the scan).
  */
class PortableBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def customer = spark.read.parquet(s"${SparkTestBase.Sf0001}/customer.parquet")
  private def orders = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")

  test("no false negatives: every dim key passes its own filter") {
    val dim = customer.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = PortableBloom.build(dim, "c_custkey")
    val dropped = dim.where(!PortableBloom.mightContain(col("c_custkey"), bloom)).count()
    assert(dropped == 0L, s"$dropped keys from the build set failed the membership probe")
  }

  test("pruned semi join is result-identical to the plain semi join") {
    val dim = customer.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = PortableBloom.build(dim, "c_custkey")
    val plain = orders
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    val pruned = orders
      .where(PortableBloom.mightContain(col("o_custkey"), bloom))
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    assert(plain.exceptAll(pruned).isEmpty && pruned.exceptAll(plain).isEmpty)
  }

  test("the filter actually prunes: most non-matching rows drop at the scan") {
    val dim = customer.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = PortableBloom.build(dim, "c_custkey")
    val total = orders.count()
    val surviving = orders
      .where(PortableBloom.mightContain(col("o_custkey"), bloom)).count()
    val matching = orders
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(surviving >= matching) // FPs only add, never subtract
    // ~20% of customers are BUILDING; with <1% FP the survivors must sit
    // far below the full table (the pruning the 100 TB path relies on)
    assert(surviving < (total * 4) / 10,
      s"bloom pruned nothing: $surviving of $total rows survived for $matching matches")
  }

  test("no false negatives on adversarial keys: extremes, negatives, random longs") {
    // fixture custkeys are small non-negative; the hash arithmetic's
    // sign handling (pmod of negative keys) only gets exercised here
    import spark.implicits._
    val rnd = new scala.util.Random(0xB100D)
    val keys = (Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
                    Long.MaxValue, Long.MaxValue - 1, -4294967296L, 4294967296L) ++
      Seq.fill(2000)(rnd.nextLong())).distinct
    val dim = keys.toDF("k")
    val bloom = PortableBloom.build(dim, "k")
    val dropped = dim.where(!PortableBloom.mightContain(col("k"), bloom)).count()
    assert(dropped == 0L, s"$dropped adversarial keys failed their own membership probe")
  }

  test("probe stays codegen arithmetic: no UDF node in the filter plan") {
    val dim = customer.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = PortableBloom.build(dim, "c_custkey")
    val plan = orders
      .where(PortableBloom.mightContain(col("o_custkey"), bloom))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
