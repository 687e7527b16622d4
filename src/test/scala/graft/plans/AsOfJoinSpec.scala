package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("custom as-of operator matches the window-composition twin exactly") {
    val custom = graft.SparkEntry.queries("j6_asof_custom")(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq)
    val composed = graft.SparkEntry.queries("j5_asof_join")(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq)
    assert(custom.length == composed.length)
    custom.zip(composed).foreach { case (a, b) => assert(a == b) }
  }

  test("left-only filters are pushed below the as-of join by the optimizer rule") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
      .withColumn("rts", timestamp_micros(col("rt")))
    val joined = AsOfJoinApi.asofJoin(spark, left, right, "k", "ts", "rk", "rts")
      .where(col("k") === 1L)
    val optimized = joined.queryExecution.optimizedPlan
    // after the rule, no Filter remains ABOVE the AsOfJoin node
    val filterAboveJoin = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[AsOfJoin] => f
    }
    assert(filterAboveJoin.isEmpty, s"filter not pushed:\n$optimized")
    assert(joined.count() == 1)
  }

  test("as-of operator handles empty right side (all nulls) and point hits") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val rightEmpty = Seq.empty[(Long, Long, Double)].toDF("rk", "rt", "v")
      .withColumn("rts", timestamp_micros(col("rt")))
    val outEmpty = AsOfJoinApi.asofJoin(spark, left, rightEmpty, "k", "ts", "rk", "rts")
    assert(outEmpty.count() == 3)
    assert(outEmpty.where(col("v").isNotNull).count() == 0)

    // inclusive match at equal time; latest-of-several; no-match before first
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 6L, 9.0)).toDF("rk", "rt", "v")
      .withColumn("rts", timestamp_micros(col("rt")))
    val rows = AsOfJoinApi.asofJoin(spark, left, right, "k", "ts", "rk", "rts")
      .select(col("k"), col("t"), col("v")).orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1L, 10L, 1.0),  // inclusive: rt=10 matches ts=10
      (1L, 20L, 2.0),  // latest prior (15), not the first (10)
      (2L, 5L, null))) // before the key's first right row
  }

  test("NULL keys/times never match (SQL ASOF semantics, DuckDB parity)") {
    import spark.implicits._
    // left: null key, null time, and a normal row
    val left = Seq(
      (Option.empty[Long], Option(10L)),  // null key
      (Option(1L), Option.empty[Long]),   // null time
      (Option(1L), Option(20L))           // matchable
    ).toDF("k", "t")
      .withColumn("ts", when(col("t").isNotNull, timestamp_micros(col("t"))))
    // right: a null-key row and a null-time row that would otherwise win
    // (null time reads as long 0 -> would match any ts >= 0 if unguarded),
    // plus one legitimate row
    val right = Seq(
      (Option.empty[Long], Option(1L), 666.0),  // null key
      (Option(1L), Option.empty[Long], 777.0),  // null time
      (Option(1L), Option(5L), 1.0)             // the only legal match
    ).toDF("rk", "rt", "v")
      .withColumn("rts", when(col("rt").isNotNull, timestamp_micros(col("rt"))))
    val rows = AsOfJoinApi.asofJoin(spark, left, right, "k", "ts", "rk", "rts")
      .select(col("k"), col("t"), col("v")).orderBy(col("k").asc_nulls_first, col("t").asc_nulls_first)
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
                 if (r.isNullAt(1)) null else r.getLong(1),
                 if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (null, 10L, null), // null left key -> no match
      (1L, null, null),  // null left time -> no match
      (1L, 20L, 1.0)))   // matches the legal v=1.0, not the null-time 777
  }

  test("mixed NTZ/LTZ time columns are refused, not silently joined") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
      .withColumn("ts", timestamp_micros(col("t"))) // TIMESTAMP (LTZ)
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
      .withColumn("rts", timestamp_micros(col("rt")).cast("timestamp_ntz"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(spark, left, right, "k", "ts", "rk", "rts")
    }
    assert(e.getMessage.contains("share one type"))
    // mismatched key types refuse too (long vs int)
    val rightIntKey = Seq((1, 5L, 1.0)).toDF("rk", "rt", "v")
      .withColumn("rts", timestamp_micros(col("rt")))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(spark, left, rightIntKey, "k", "ts", "rk", "rts")
    }
    assert(e2.getMessage.contains("key columns"))
  }

  test("matched right-time column keeps the input timestamp type (no NTZ leak)") {
    // j6's output rate_ts must be TimestampType when inputs are TimestampType
    // — the r7 regression was the custom node propagating fixture NTZ while
    // j5's twin pinned LTZ.
    val j6 = graft.SparkEntry.queries("j6_asof_custom")(spark, SparkTestBase.Sf0001)
    val j5 = graft.SparkEntry.queries("j5_asof_join")(spark, SparkTestBase.Sf0001)
    assert(j6.schema("rate_ts").dataType == j5.schema("rate_ts").dataType)
    assert(j6.schema("rate_ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
