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

  test("w5 two-level pattern match equals the single window across time-bucket edges") {
    import spark.implicits._
    // Bucket width is 1 day of microseconds. Crafted edges:
    //  u1: run fully inside one bucket (within-pass baseline)
    //  u2: view = LAST row of bucket 0, click/purchase = first rows of
    //      bucket 1 (lead-2 crosses the edge from rn_desc=1)
    //  u3: view = second-to-last of bucket 0, click = last, purchase =
    //      first of bucket 1 (crosses from rn_desc=2)
    //  u4: view is the ONLY row of its bucket (rn_asc = rn_desc = 1 —
    //      must enter the boundary set exactly once), click/purchase
    //      open the next bucket
    //  u8: three single-row buckets view->click->purchase — spans two
    //      bucket edges, so the gap necessarily exceeds the 24h limit;
    //      pins that the stitched chain computes the leads yet rejects it
    //  u5: 5-row bucket view,view,view,click,purchase — row 2's leads in
    //      the BOUNDARY subsequence alone would falsely be (click,
    //      purchase); only row 3 (rn_desc=3, within pass) truly matches.
    //      Proves the rn_desc<=2 guard on the stitch pass.
    //  u6: run crossing the edge but slower than 24h (time-window reject)
    //  u7: us tie at a bucket edge broken by event_id
    val day = 86400000000L
    val t0 = 1700000000000000L - (1700000000000000L % day) // bucket-aligned
    val evs = Seq(
      (1L, 10L, "view", t0 + 1000L), (1L, 11L, "click", t0 + 2000L),
      (1L, 12L, "purchase", t0 + 3000L),
      (2L, 20L, "click", t0 + 100L), (2L, 21L, "view", t0 + day - 1L),
      (2L, 22L, "click", t0 + day + 1L), (2L, 23L, "purchase", t0 + day + 2L),
      (3L, 30L, "click", t0 + 100L), (3L, 31L, "view", t0 + day - 2L),
      (3L, 32L, "click", t0 + day - 1L), (3L, 33L, "purchase", t0 + day + 5L),
      (4L, 40L, "view", t0 + day - 5L), (4L, 41L, "click", t0 + day + 1L),
      (4L, 42L, "purchase", t0 + day + 2L),
      (8L, 80L, "view", t0 + 1L), (8L, 81L, "click", t0 + day + 1L),
      (8L, 82L, "purchase", t0 + 2 * day - 1L),
      (5L, 50L, "view", t0 + 10L), (5L, 51L, "view", t0 + 20L),
      (5L, 52L, "view", t0 + 30L), (5L, 53L, "click", t0 + 40L),
      (5L, 54L, "purchase", t0 + 50L),
      (6L, 60L, "view", t0 + day - 1L), (6L, 61L, "click", t0 + day + 1L),
      (6L, 62L, "purchase", t0 + 2 * day + 10L), // > 24h after the view
      (7L, 70L, "view", t0 + day), (7L, 71L, "click", t0 + day), // us tie
      (7L, 72L, "purchase", t0 + day + 1L)
    )
    val dir = java.nio.file.Files.createTempDirectory("twolevel_w5").toString
    evs.toDF("user_id", "event_id", "event_type", "us")
      .select(col("user_id"), col("event_id"), col("event_type"),
              timestamp_micros(col("us")).as("ts"),
              lit(0.0).as("value"), lit("").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("t2", lead("event_type", 2).over(w))
      .withColumn("us2", lead("us", 2).over(w))
      .where(col("event_type") === "view" && col("t1") === "click" &&
             col("t2") === "purchase" && col("us2") - col("us") <= 86400000000L)
      .select(col("user_id"), col("us"), col("us2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val got = graft.SparkEntry.queries("w5_pattern_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"missing: ${expected -- got}\nextra: ${got -- expected}")
    // the crafted corpus must exercise BOTH passes: u1/u5 within, u2/u3/u4 cross
    assert(expected.exists(_._1 == 1L) && expected.exists(_._1 == 2L) &&
           expected.exists(_._1 == 3L) && expected.exists(_._1 == 4L) &&
           expected.exists(_._1 == 5L) && expected.exists(_._1 == 7L),
      s"crafted corpus lost a planted match: $expected")
    assert(!expected.exists(_._1 == 6L), "the >24h run must not match")
    assert(!expected.exists(_._1 == 8L),
      "the three-single-bucket chain necessarily exceeds 24h and must not match")
    assert(expected.count(_._1 == 5L) == 1, "u5 must match exactly once (row 3)")
    cleanup()
  }

  test("d17 two-level top-K equals the single window incl. small strata and h-bucket edges") {
    // Stratum (aa, s0): 100 sequential doc_ids — the oracle-token h
    // values spread golden-ratio-evenly over [0, 2^32), and at n=100 the
    // five smallest land in div-2^26 buckets {0,0,1,2,3}, so the global
    // top-5 must assemble from several bucket-local top-5s.
    // (bb, s0): 3 docs (< K rows); (cc, s0): exactly 5; (dd, s0): 1.
    val docs = (1L to 100L).map(id => (id, "t", "aa", "s0", 0L)) ++
      (400L to 402L).map(id => (id, "t", "bb", "s0", 0L)) ++
      (500L to 504L).map(id => (id, "t", "cc", "s0", 0L)) ++
      Seq((600L, "t", "dd", "s0", 0L))
    val dir = writeDocs(docs)

    val w = Window.partitionBy("lang", "source")
      .orderBy(col("h"), col("doc_id"))
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
              graft.core.Tokens.tokenOracle(col("doc_id")).as("h"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 5)
      .select("lang", "source", "rnk", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val got = graft.SparkEntry.queries("d17_stratified_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"missing: ${expected -- got}\nextra: ${got -- expected}")
    // aa's top-5 must straddle more than one h bucket or the edge is untested
    val aaBuckets = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang") === "aa")
      .select(graft.core.Tokens.tokenOracle(col("doc_id")).as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("h"))))
      .where(col("rnk") <= 5)
      .select(expr("h div 67108864").as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(aaBuckets.size > 1,
      s"crafted aa stratum's top-5 sits in one h bucket ($aaBuckets) — edge untested")
    cleanup()
  }

  test("two-level lag family (e3/e7/e12/e13) equals the single-window formulations") {
    import spark.implicits._
    // One corpus, every boundary edge the per-(user, day) rewrites must
    // survive:
    //  u1: three rows in one bucket (within-pass baseline; one session)
    //  u2: rows at day-1 / day / day+1 — adjacent ACROSS the bucket edge
    //      with tiny gaps, so the session must MERGE across buckets and
    //      the cross-bucket lag is exercised at distance 1
    //  u3: two rows separated by an EMPTY day bucket — the boundary
    //      subsequence must bridge non-adjacent buckets, and e12's carry
    //      must skip the touchless gap
    //  u4: a lone row (lag null; 1-session; purchase with no touch)
    //  u5: us TIE exactly at the bucket edge, broken by event_id
    //  u6: purchase whose only touch lies in the PREVIOUS day (carry) but
    //      outside the 1h lookback — touch found, yet unattributed; then
    //      a same-day click+purchase pair that attributes
    //  u7: gap of exactly 30min straddling the edge (== threshold is NOT
    //      a session break; pins the > vs >= boundary under the rewrite)
    val day = 86400000000L
    val t0 = 1700000000000000L - (1700000000000000L % day)
    val evs = Seq(
      (1L, 10L, "view", t0 + 1000000L), (1L, 11L, "click", t0 + 2000000L),
      (1L, 12L, "purchase", t0 + 3000000L),
      (2L, 20L, "view", t0 + day - 1L), (2L, 21L, "click", t0 + day),
      (2L, 22L, "purchase", t0 + day + 1L),
      (3L, 30L, "click", t0 + 100L), (3L, 31L, "purchase", t0 + 2 * day + 5L),
      (4L, 40L, "purchase", t0 + 50L),
      (5L, 50L, "view", t0 + day), (5L, 51L, "purchase", t0 + day),
      (6L, 60L, "view", t0 + day - 7200000000L), // 2h before its purchase
      (6L, 61L, "purchase", t0 + day + 10L),
      (6L, 62L, "click", t0 + day + 100L), (6L, 63L, "purchase", t0 + day + 200L),
      (7L, 70L, "view", t0 + day - 900000000L), (7L, 71L, "view", t0 + day + 900000000L)
    )
    val dir = java.nio.file.Files.createTempDirectory("twolevel_lag").toString
    evs.toDF("user_id", "event_id", "event_type", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
              col("user_id"), col("event_type"),
              lit(0.0).as("value"), lit("").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def base = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("ts"), unix_micros(col("ts")).as("us"))

    // e13 reference: single-window inter-arrival gaps
    val e13Exp = base
      .withColumn("gap_us", col("us") - lag("us", 1).over(w))
      .where(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("gap_us").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val e13Got = graft.SparkEntry.queries("e13_dwell_percentiles")(spark, dir)
      .select("event_type", "n_gaps", "max_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    cleanup()
    assert(e13Got == e13Exp, s"e13: expected $e13Exp got $e13Got")

    // e7 reference: single-window bigrams
    val e7Exp = base
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val e7Got = graft.SparkEntry.queries("e7_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    cleanup()
    assert(e7Got == e7Exp, s"e7: expected $e7Exp got $e7Got")

    // e3 reference: single-window sessionization
    val e3Exp = base
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_s").over(wCum))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("st"), max("ts").as("en"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString,
                           r.get(3).toString, r.getLong(4))).toSet
    val e3Got = graft.SparkEntry.queries("e3_sessionization")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString,
                           r.get(3).toString, r.getLong(4))).toSet
    cleanup()
    assert(e3Got == e3Exp, s"e3: expected $e3Exp got $e3Got")
    // u2's session must SPAN the bucket edge (3 events, one session), and
    // u7's ==30min gap must not split
    assert(e3Exp.exists(s => s._1 == 2L && s._5 == 3L), s"u2 session split: $e3Exp")
    assert(e3Exp.count(_._1 == 7L) == 1, s"u7 ==threshold gap split a session: $e3Exp")
    assert(e3Exp.count(_._1 == 3L) == 2, s"u3 empty-day gap must split: $e3Exp")

    // e12 reference: single-window last-touch attribution
    val isTouch = col("event_type").isin("click", "view")
    val e12Exp = base
      .withColumn("touch_us", last(when(isTouch, col("us")), ignoreNulls = true).over(wCum))
      .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(wCum))
      .where(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("touch_us").isNotNull &&
             col("us") - col("touch_us") <= 3600000000L, col("touch_type"))
          .otherwise("unattributed"))
      .groupBy("channel").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val e12Got = graft.SparkEntry.queries("e12_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    cleanup()
    assert(e12Got == e12Exp, s"e12: expected $e12Exp got $e12Got")
    // the corpus must exercise both the carry (u3: cross-empty-day click)
    // and the carried-but-stale edge (u6's first purchase): attributed and
    // unattributed channels both present
    assert(e12Exp.exists(_._1 == "unattributed") && e12Exp.exists(_._1 != "unattributed"),
      s"crafted corpus lost an attribution class: $e12Exp")
  }
}
