package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tokens

/** The custom DataSource V2: correctness vs the library split, partition
  * pruning from pushed range_id predicates (a filtered read must not even
  * SCHEDULE the pruned ranges), and column pruning.
  */
class TokenRingSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ring(n: Int) =
    spark.read.format("graft.sources.TokenRingSource")
      .option("numRanges", n.toString).load()

  test("full scan equals Tokens.split, one input partition per range") {
    val df = ring(16)
    assert(df.rdd.getNumPartitions == 16)
    val got = df.orderBy("range_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Tokens.split(16, Tokens.OracleRingMin, Tokens.OracleRingMax)
      .map(r => (r.rangeId.toLong, r.start, r.end))
    assert(got.toSeq == want)
  }

  test("range_id predicates prune partitions at planning time") {
    val one = ring(16).where(col("range_id") === 3)
    assert(one.rdd.getNumPartitions == 1, "equality must prune to one partition")
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(3L))

    val band = ring(16).where(col("range_id") >= 4 && col("range_id") < 8)
    assert(band.rdd.getNumPartitions == 4, "range band must prune to its width")
    assert(band.orderBy("range_id").collect().map(_.getLong(0)).toSeq ==
      Seq(4L, 5L, 6L, 7L))

    val in = ring(16).where(col("range_id").isin(1L, 9L))
    assert(in.rdd.getNumPartitions == 2)
  }

  test("non-range predicates stay residual; column pruning reaches the reader") {
    // a predicate on range_end is NOT pushed (stays a Spark filter) but
    // must still evaluate correctly
    val df = ring(8).where(col("range_end") > 0L).select("range_id")
    assert(df.count() == 8)
    assert(df.schema.fieldNames.toSeq == Seq("range_id"))
    // pruned-schema scan returns the right values
    assert(df.orderBy("range_id").collect().map(_.getLong(0)).toSeq ==
      (0L until 8L).toSeq)
  }

  test("joins against real tables: ranged lineitem counts match the column-derived path") {
    val li = spark.read.parquet(s"${SparkTestBase.Sf0001}/lineitem.parquet")
      .withColumn("token_key", Tokens.tokenOracle(col("l_orderkey")))
    val viaSource = ring(8)
      .join(li, col("token_key") >= col("range_start") && col("token_key") < col("range_end"))
      .groupBy("range_id").agg(count(lit(1)).as("n"))
    val viaColumn = li
      .withColumn("range_id", Tokens.oracleRangeId(col("token_key"), 8))
      .groupBy("range_id").agg(count(lit(1)).as("n"))
    val a = viaSource.orderBy("range_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = viaColumn.orderBy("range_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }
}
