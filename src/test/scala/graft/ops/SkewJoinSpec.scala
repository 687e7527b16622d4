package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** AQE skew handling — the automatic complement to j7's manual salting:
  * when one join key dominates, adaptive execution must split the hot
  * partition into multiple tasks (OptimizeSkewedJoin) instead of letting
  * one straggler own the stage. Asserted on the executed plan against a
  * deliberately skewed build (90% of rows share one key).
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // make the test's hot partition register as "skewed"
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of the left side lands on key 7, with a fat payload carried
      // THROUGH the join so the hot shuffle partition is megabytes.
      // NOTE: no keyed aggregation directly over the join — an operator
      // that REQUIRES the join's output partitioning legitimately
      // suppresses the skew split (splitting would break co-partitioning);
      // the global aggregate has no such requirement.
      val left = spark.range(500000)
        .select(when($"id" % 10 =!= 0, 7L).otherwise($"id" % 100).as("k"),
                concat(lit("payload_"), lpad($"id".cast("string"), 64, "x")).as("v"))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length($"v")).as("bytes"))
      val total = joined.collect().head.getLong(0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$plan")
      // correctness under the split: every row of the hot key survived
      assert(total == 500000L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
