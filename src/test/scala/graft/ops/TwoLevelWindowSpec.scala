package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Adversarial pins for the round-8 two-level window rewrites (d16, d20,
  * e11): each test crafts a corpus that forces the edges the shared
  * fixtures may not hit — rows straddling the range-bucket boundary,
  * single-row strata (the percent_rank n=1 edge), exact ties at a bucket
  * edge, and out-of-order event times whose high-water mark comes from an
  * earlier bucket — and compares the registered query against the naive
  * single-window formulation computed inline on the same data. d38's
  * equivalent pin lives in DedupSpec.
  */
class TwoLevelWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def cleanup(): Unit = {
    graft.ops.PipelineCache.release()
    spark.sharedState.cacheManager.clearCache()
  }

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("twolevel").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d16 two-level prefix sum equals the single window across the doc_id bucket edge") {
    // doc_ids straddle the div-1024 boundary; lang bb is a single doc
    val words = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val docs = (1018L to 1030L).map(id =>
        (id, words(200 + id.toInt % 7 * 100), "aa", "s0", 0L)) ++
      Seq((2048L, words(513), "bb", "s0", 0L)) ++ // lone doc ON a boundary
      (3070L to 3074L).map(id => (id, words(512), "cc", "s0", 0L)) // exact budget fills
    val dir = writeDocs(docs)

    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nWords = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
      .cast("long")
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), nWords.as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum_before") / 512).cast("long"))
      .groupBy("lang", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens_packed"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val got = graft.SparkEntry.queries("d16_pack_sequences")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"missing: ${expected -- got}\nextra: ${got -- expected}")
    cleanup()
  }

  test("d20 two-level rank equals single-window percent_rank incl. n=1 and boundary ties") {
    // lang aa: 21 docs with n_chars tied in pairs across the div-64 edge
    // (63,63,64,64,...); lang bb: single doc (percent_rank = 0 edge);
    // lang cc: all-identical n_chars (doc_id breaks every tie)
    val docs = (1L to 21L).map(id => (id, "t", "aa", "s0", 60L + (id / 2))) ++
      Seq((100L, "t", "bb", "s0", 1000L)) ++
      (200L to 209L).map(id => (id, "t", "cc", "s0", 64L))
    val dir = writeDocs(docs)

    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= 0.1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
           min(col("n_chars")).cast("long").as("min_len"),
           max(col("n_chars")).cast("long").as("max_len"),
           sum(col("n_chars").cast("long")).as("chars_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    val got = graft.SparkEntry.queries("d20_quality_percentile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected, s"missing: ${expected -- got}\nextra: ${got -- expected}")
    cleanup()
  }

  test("e11 two-level running max equals the single window with cross-bucket high-water marks") {
    import spark.implicits._
    // event_ids straddle the div-4096 edge; the global max ts sits BEFORE
    // the boundary so every post-boundary row's hwm comes from the earlier
    // bucket; type B has one event (null hwm edge)
    val base = 1700000000000000L
    val evs = Seq(
      (4090L, "A", base + 100L), (4091L, "A", base + 900000000L), // early high-water mark
      (4092L, "A", base + 200L), (4095L, "A", base + 300L),
      (4096L, "A", base + 400L), (4097L, "A", base + 500L), // late rows, hwm from bucket 0
      (4100L, "A", base + 999000000L),
      (5000L, "B", base + 1L) // lone event: hwm null
    )
    val dir = java.nio.file.Files.createTempDirectory("twolevel_ev").toString
    evs.toDF("event_id", "event_type", "us")
      .select(col("event_id"), col("event_type"),
              timestamp_micros(col("us")).as("ts"),
              lit(0L).as("user_id"), lit(0.0).as("value"), lit("").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("hwm", max("us").over(w))
      .withColumn("late_us",
        when(col("hwm") - lit(600000000L) > col("us"),
             col("hwm") - lit(600000000L) - col("us")).otherwise(lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
           max("late_us").as("max_late_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val got = graft.SparkEntry.queries("e11_late_data_audit")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"missing: ${expected -- got}\nextra: ${got -- expected}")
    // the crafted data must actually produce late rows, or the test is vacuous
    assert(expected.exists(_._3 > 0), "crafted corpus produced no late events")
    cleanup()
  }
}
