package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming tumbling window equals the batch (oracle-checked) twin") {
    EventStreams.runTumblingToMemory(spark, SparkTestBase.Sf0001, "stream_tumbling")
    val stream = spark.sql(
      "SELECT * FROM stream_tumbling ORDER BY win_start, event_type").collect()
    val batch = graft.SparkEntry.queries("e1_tumbling_counts")(spark, SparkTestBase.Sf0001)
      .collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[java.sql.Timestamp]("win_start") == b.getAs[java.sql.Timestamp]("win_start"))
      assert(s.getAs[String]("event_type") == b.getAs[String]("event_type"))
      assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(s.getAs[Double]("sum_value") == b.getAs[Double]("sum_value"))
    }
  }

  test("streaming sliding windows equal the batch (oracle-checked) e2 twin") {
    val q = EventStreams.slidingCounts(
      EventStreams.readEventStream(spark, SparkTestBase.Sf0001))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_sliding").start()
    q.processAllAvailable()
    q.stop()
    val stream = spark.sql("SELECT * FROM stream_sliding ORDER BY win_start").collect()
    val batch = graft.SparkEntry.queries("e2_sliding_counts")(spark, SparkTestBase.Sf0001)
      .collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[java.sql.Timestamp]("win_start") == b.getAs[java.sql.Timestamp]("win_start"))
      assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
    }
  }

  test("watermarked append-mode windows finalize only after the watermark passes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](spark)
    // (event_id, minutes) -> event-time rows
    val withTs = mem.toDF().toDF("event_id", "mins")
      .withColumn("ts", timestamp_micros(col("mins") * 60L * 1000000L))
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_windows").start()

    mem.addData((1L, 10L), (2L, 70L)) // windows [0h,1h) and [1h,2h)
    q.processAllAvailable()
    val afterBatch1 = spark.sql("SELECT * FROM wm_windows").count()
    mem.addData((3L, 210L)) // 3h30 -> watermark 2h30 -> both earlier windows close
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM wm_windows ORDER BY win_start").collect()
    q.stop()

    assert(afterBatch1 == 0, "append mode must not emit unfinalized windows")
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(1L, 1L))
  }

  test("streaming exact dedup drops duplicates within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)](spark)
    val withTs = mem.toDF().toDF("doc_key", "mins")
      .withColumn("ts", timestamp_micros(col("mins") * 60L * 1000000L))
    val deduped = withTs
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_dedup").start()
    mem.addData((100L, 0L), (100L, 5L), (200L, 6L)) // 100 duplicated in-batch
    q.processAllAvailable()
    mem.addData((100L, 10L), (300L, 12L)) // 100 duplicated across batches
    q.processAllAvailable()
    val keys = spark.sql("SELECT doc_key FROM stream_dedup").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(keys.toSeq == Seq(100L, 200L, 300L))
  }

  test("stateful sessionizer closes sessions on gap and keeps open ones in state") {
    import spark.implicits._
    implicit val s = spark
    val mem = MemoryStream[EventStreams.Ev](spark)
    val out = EventStreams.sessionize(mem.toDS())
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()

    val Min = 60L * 1000 * 1000 // one minute in micros
    // user 1: two events 5 min apart (one session), then a 40-min gap event
    // (closes first session); user 2: single event (stays open)
    mem.addData(
      EventStreams.Ev(1, 0), EventStreams.Ev(1, 5 * Min),
      EventStreams.Ev(2, 0))
    q.processAllAvailable()
    mem.addData(EventStreams.Ev(1, 45 * Min))
    q.processAllAvailable()
    val closed = spark.sql("SELECT * FROM sessions").collect()
    q.stop()

    assert(closed.length == 1) // only user 1's first session closed
    val c = closed.head
    assert(c.getAs[Long]("user_id") == 1L)
    assert(c.getAs[Long]("n_events") == 2L)
  }

  test("streaming Welford moments equal the batch moments after the last batch") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real per-type values from the fixture, split across 3 micro-batches
      val rows = graft.core.Tables.events(spark, SparkTestBase.Sf0001)
        .select("event_type", "value").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      val batches = rows.grouped((rows.size + 2) / 3).toSeq

      val mem = MemoryStream[(String, Double)](spark)
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(
          new EventStreams.RunningMomentsProcessor,
          TimeMode.None(),
          OutputMode.Update(),
          implicitly[org.apache.spark.sql.Encoder[EventStreams.MomentsOut]])
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("moments").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val streamed = spark.sql("SELECT * FROM moments").collect()
        .groupBy(_.getAs[String]("event_type"))
        .map { case (t, rs) => t -> rs.maxBy(_.getAs[Long]("n")) }

      // batch truth, computed independently per type
      rows.groupBy(_._1).foreach { case (t, vs) =>
        val n = vs.size.toLong
        val mean = vs.map(_._2).sum / n
        val m2 = vs.map(v => (v._2 - mean) * (v._2 - mean)).sum
        val got = streamed(t)
        assert(got.getAs[Long]("n") == n, s"$t: n")
        assert(math.abs(got.getAs[Double]("mean") - mean) < 1e-9, s"$t: mean")
        assert(math.abs(got.getAs[Double]("m2") - m2) < 1e-6 * (1 + m2), s"$t: m2")
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState keeps typed per-user state across micro-batches (RocksDB)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // the v2 state API requires the RocksDB provider; scope it to this test
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)](spark)
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(
          new EventStreams.UserTotalsProcessor,
          TimeMode.None(),
          OutputMode.Update(),
          implicitly[org.apache.spark.sql.Encoder[EventStreams.UserTotals]])
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("user_totals").start()

      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 2.0), (3L, 7.0)) // state for user 1 must carry over
      q.processAllAvailable()
      q.stop()

      // memory sink in Update mode appends each batch's emissions: take
      // the LAST row per user = the final running totals
      val last = spark.sql("SELECT * FROM user_totals").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.maxBy(_.getAs[Long]("n_events")) }
      assert(last(1L).getAs[Long]("n_events") == 3L)
      assert(last(1L).getAs[Double]("total_value") == 17.0)
      assert(last(2L).getAs[Long]("n_events") == 1L)
      assert(last(3L).getAs[Double]("total_value") == 7.0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState keeps per-user per-type counters across micro-batches (RocksDB)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)](spark)
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(
          new EventStreams.UserTypeCountsProcessor,
          TimeMode.None(),
          OutputMode.Update(),
          implicitly[org.apache.spark.sql.Encoder[EventStreams.TypeCount]])
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("type_counts").start()

      mem.addData((1L, "click"), (1L, "view"), (1L, "click"), (2L, "view"))
      q.processAllAvailable()
      mem.addData((1L, "click"), (2L, "purchase")) // map entries must carry over
      q.processAllAvailable()
      q.stop()

      val last = spark.sql("SELECT * FROM type_counts").collect()
        .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
        .map { case (k, rows) => k -> rows.map(_.getAs[Long]("n")).max }
      assert(last((1L, "click")) == 3L)  // 2 in batch 1 + 1 in batch 2
      assert(last((1L, "view")) == 1L)
      assert(last((2L, "view")) == 1L)
      assert(last((2L, "purchase")) == 1L)
      // only touched types are re-emitted: user 1's view emitted once
      val viewEmits = spark.sql(
        "SELECT count(*) FROM type_counts WHERE user_id = 1 AND event_type = 'view'")
        .collect()(0).getLong(0)
      assert(viewEmits == 1L)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("v2-API event-time timers close sessions when the watermark passes end+gap") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val GapMs = 5L * 60 * 1000
      val mem = MemoryStream[EventStreams.EvT](spark)
      val out = mem.toDS()
        .withWatermark("ts", "10 seconds")
        .groupByKey(_.user_id)
        .transformWithState(
          new EventStreams.SessionTimeoutProcessor(GapMs),
          TimeMode.EventTime(),
          OutputMode.Append(),
          implicitly[org.apache.spark.sql.Encoder[EventStreams.SessionOut]])
      val q = out.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("timer_sessions").start()

      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      // user 1: two events within the gap -> one session ending at 100 s;
      // its timer arms at 100 s + 5 min = 400 s. (Start at 1 s, not 0 s:
      // rows at-or-before the current watermark — initially 0 — are
      // dropped as late before they reach the processor.)
      mem.addData(EventStreams.EvT(1, ts(1)), EventStreams.EvT(1, ts(100)))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM timer_sessions").isEmpty) // watermark still behind
      // user 2's far-future event pushes the watermark past 400 s...
      mem.addData(EventStreams.EvT(2, ts(1000)))
      q.processAllAvailable()
      // ...and the fired timer emits user 1's closed session (one more
      // batch may be needed for the timer to evaluate post-watermark-move)
      mem.addData(EventStreams.EvT(2, ts(1001)))
      q.processAllAvailable()
      q.stop()

      val sessions = spark.sql("SELECT * FROM timer_sessions").collect()
      assert(sessions.exists { r =>
        r.getAs[Long]("user_id") == 1L &&
          r.getAs[java.sql.Timestamp]("session_start").getTime == 1000L &&
          r.getAs[java.sql.Timestamp]("session_end").getTime == 100000L &&
          r.getAs[Long]("n_events") == 2L
      }, sessions.mkString(", "))
      // user 2 keeps arriving within its own gap -> still open, not emitted
      assert(!sessions.exists(_.getAs[Long]("user_id") == 2L))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session_window builtin (batch) equals the e3 window-composition sessionization") {
    import org.apache.spark.sql.functions._
    val builtin = EventStreams.sessionWindowCounts(
      graft.core.Tables.events(spark, SparkTestBase.Sf0001))
      .orderBy("user_id", "session_start").collect()
    val composed = graft.SparkEntry.queries("e3_sessionization")(spark, SparkTestBase.Sf0001)
      .collect()
    assert(builtin.length == composed.length)
    builtin.zip(composed).foreach { case (b, c) =>
      assert(b.getAs[Long]("user_id") == c.getAs[Long]("user_id"))
      assert(b.getAs[java.sql.Timestamp]("session_start") ==
        c.getAs[java.sql.Timestamp]("session_start"))
      // builtin end = last event + gap (exclusive); composed end = last event
      assert(b.getAs[java.sql.Timestamp]("session_end").getTime ==
        c.getAs[java.sql.Timestamp]("session_end").getTime + 30 * 60 * 1000)
      assert(b.getAs[Long]("n_events") == c.getAs[Long]("n_events"))
    }
  }

  test("streaming session_window emits watermark-finalized sessions equal to batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(Long, Long)](spark)
    def withTs(df: org.apache.spark.sql.DataFrame) = df
      .toDF("user_id", "mins")
      .withColumn("ts", timestamp_micros(col("mins") * 60L * 1000000L))
    val agg = EventStreams.sessionWindowCounts(
      withTs(mem.toDF()).withWatermark("ts", "1 hour"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sw_sessions").start()
    // user 1: one 2-event session then a separate session; user 2: one event
    val data = Seq((1L, 0L), (1L, 5L), (1L, 45L), (2L, 10L))
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData((99L, 600L)) // watermark -> 9h: closes everything earlier
    q.processAllAvailable()
    val stream = spark.sql(
      "SELECT * FROM sw_sessions WHERE user_id < 99 ORDER BY user_id, session_start").collect()
    q.stop()
    val batch = EventStreams.sessionWindowCounts(withTs(data.toDF()))
      .orderBy("user_id", "session_start").collect()
    assert(stream.length == batch.length && stream.length == 3)
    stream.zip(batch).foreach { case (s, b) => assert(s.toSeq == b.toSeq) }
  }

  test("streaming foreachBatch into the idempotent JDBC sink absorbs replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Ddl, DerbyDialect, JdbcSink}
    import org.apache.spark.sql.types._
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = s"jdbc:derby:memory:st_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try Ddl.ensureTables(conn, DerbyDialect, "stream_sink",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))), Seq("id"))
    finally conn.close()
    val cfg = JdbcSink.JdbcConfig(url, "", "", "stream_sink",
      columns = Seq("id", "name"), keyCols = Seq("id"), dialect = DerbyDialect,
      batchSize = 10, walTable = Some("migration_wal"), retryBaseDelayMs = 1)

    val mem = MemoryStream[Long](spark)
    val df = mem.toDF().toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("range_id", col("id") % 4)
    val cp = java.nio.file.Files.createTempDirectory("st_cp").toString
    val q = EventStreams.streamToJdbc(df, cfg, cp)
    mem.addData(1L to 25L: _*)
    q.processAllAvailable()
    mem.addData(20L to 40L: _*) // overlap 20-25: replayed keys must not duplicate
    q.processAllAvailable()
    q.stop()
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery("SELECT COUNT(*) FROM \"stream_sink\"")
      rs.next()
      assert(rs.getLong(1) == 40L) // 1..40 exactly once
    } finally c2.close()
  }

  test("restarted query resumes from its checkpoint without duplicating sink rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Ddl, DerbyDialect, JdbcSink}
    import org.apache.spark.sql.types._
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = s"jdbc:derby:memory:rs_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try Ddl.ensureTables(conn, DerbyDialect, "restart_sink",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))), Seq("id"))
    finally conn.close()
    val cfg = JdbcSink.JdbcConfig(url, "", "", "restart_sink",
      columns = Seq("id", "name"), keyCols = Seq("id"), dialect = DerbyDialect,
      batchSize = 10, walTable = None, retryBaseDelayMs = 1)
    val cp = java.nio.file.Files.createTempDirectory("rs_cp").toString

    def newQuery(mem: MemoryStream[Long]) = EventStreams.streamToJdbc(
      mem.toDF().toDF("id")
        .withColumn("name", concat(lit("n"), col("id")))
        .withColumn("range_id", col("id") % 4),
      cfg, cp)

    // T2-for-streams: the checkpoint is the resume spine; the idempotent
    // sink absorbs the boundary batch either way.
    val mem1 = MemoryStream[Long](spark)
    val q1 = newQuery(mem1)
    mem1.addData(1L to 15L: _*)
    q1.processAllAvailable()
    q1.stop()
    val mem2 = MemoryStream[Long](spark)
    mem2.addData(1L to 15L: _*)  // same source prefix, as a restarted reader would see
    mem2.addData(16L to 30L: _*)
    val q2 = newQuery(mem2)
    q2.processAllAvailable()
    q2.stop()
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT COUNT(*), COUNT(DISTINCT \"id\") FROM \"restart_sink\"")
      rs.next()
      assert(rs.getLong(1) == 30L && rs.getLong(2) == 30L)
    } finally c2.close()
  }

  test("stream-stream interval join equals the batch join on the same data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val impMem = MemoryStream[(Long, Long)](spark)
    val clkMem = MemoryStream[(Long, Long)](spark)
    def imps(df: org.apache.spark.sql.DataFrame) = df.toDF("i_user", "i_mins")
      .withColumn("i_ts", timestamp_micros(col("i_mins") * 60L * 1000000L))
    def clks(df: org.apache.spark.sql.DataFrame) = df.toDF("c_user", "c_mins")
      .withColumn("c_ts", timestamp_micros(col("c_mins") * 60L * 1000000L))
    val q = EventStreams.clickAttribution(imps(impMem.toDF()), clks(clkMem.toDF()))
      .select("c_user", "c_mins", "i_mins")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attrib").start()
    // user 1: impression at 10, clicks at 30 (within 1h) and 120 (outside);
    // user 2: click with no impression; user 3: two impressions, one click
    val impData = Seq((1L, 10L), (3L, 40L), (3L, 50L))
    val clkData = Seq((1L, 30L), (1L, 120L), (2L, 35L), (3L, 60L))
    impMem.addData(impData: _*)
    clkMem.addData(clkData: _*)
    q.processAllAvailable()
    val stream = spark.sql("SELECT * FROM attrib ORDER BY c_user, c_mins, i_mins").collect()
    q.stop()
    val batch = clks(clkData.toDF()).join(imps(impData.toDF()),
        expr("c_user = i_user AND i_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"), "inner")
      .select("c_user", "c_mins", "i_mins")
      .orderBy("c_user", "c_mins", "i_mins").collect()
    assert(stream.length == batch.length && stream.length == 3)
    stream.zip(batch).foreach { case (s, b) => assert(s.toSeq == b.toSeq) }
  }

  test("stream-stream LEFT OUTER interval join: unmatched clicks emit null at watermark eviction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val impMem = MemoryStream[(Long, Long)](spark)
    val clkMem = MemoryStream[(Long, Long)](spark)
    def imps(df: org.apache.spark.sql.DataFrame) = df.toDF("i_user", "i_mins")
      .withColumn("i_ts", timestamp_micros(col("i_mins") * 60L * 1000000L))
    def clks(df: org.apache.spark.sql.DataFrame) = df.toDF("c_user", "c_mins")
      .withColumn("c_ts", timestamp_micros(col("c_mins") * 60L * 1000000L))
    val q = EventStreams.clickAttributionOuter(imps(impMem.toDF()), clks(clkMem.toDF()))
      .select("c_user", "c_mins", "i_mins")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attrib_outer").start()
    // user 1: click 30 matches impression 10; click 120 matches nothing
    // (10 is outside its 1h lookback); user 2: click with no impression
    // at all; user 3: one click matching two impressions.
    impMem.addData((1L, 10L), (3L, 40L), (3L, 50L))
    clkMem.addData((1L, 30L), (1L, 120L), (2L, 35L), (3L, 60L))
    q.processAllAvailable()
    // null-side rows need the watermark to pass: far-future traffic
    // advances both watermarks, a following batch triggers eviction
    impMem.addData((9L, 5000L)); clkMem.addData((9L, 5000L))
    q.processAllAvailable()
    impMem.addData((9L, 5001L)); clkMem.addData((9L, 5001L))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT * FROM attrib_outer WHERE c_user < 9 ORDER BY c_user, c_mins, i_mins NULLS FIRST")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    q.stop()
    // batch twin of the same data, restricted to the settled users
    val batch = clks(Seq((1L, 30L), (1L, 120L), (2L, 35L), (3L, 60L)).toDF())
      .join(imps(Seq((1L, 10L), (3L, 40L), (3L, 50L)).toDF()),
        expr("c_user = i_user AND i_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
        "left_outer")
      .select("c_user", "c_mins", "i_mins")
      .orderBy(col("c_user"), col("c_mins"), col("i_mins").asc_nulls_first)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == batch.toSeq)
    // the two null-emitted rows are exactly the matchless clicks
    assert(got.filter(_._3.isEmpty).map(t => (t._1, t._2)).toSet ==
      Set((1L, 120L), (2L, 35L)))
  }

  test("stream-stream join restart: join state restores from checkpoint, no dupes or losses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def imps(df: org.apache.spark.sql.DataFrame) = df.toDF("i_user", "i_mins")
      .withColumn("i_ts", timestamp_micros(col("i_mins") * 60L * 1000000L))
    def clks(df: org.apache.spark.sql.DataFrame) = df.toDF("c_user", "c_mins")
      .withColumn("c_ts", timestamp_micros(col("c_mins") * 60L * 1000000L))
    val out = java.nio.file.Files.createTempDirectory("ssj_out").toString + "/data"
    val cp = java.nio.file.Files.createTempDirectory("ssj_cp").toString
    def newQuery(im: MemoryStream[(Long, Long)], cm: MemoryStream[(Long, Long)]) =
      EventStreams.clickAttribution(imps(im.toDF()), clks(cm.toDF()))
        .select("c_user", "c_mins", "i_mins")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .start()
    // impressions arrive ONLY before the crash; user 3's click ONLY after —
    // so its match can come solely from join state restored off the
    // checkpoint, not from reprocessing.
    val impChunk1 = Seq((1L, 10L), (3L, 40L), (3L, 50L))
    val clkChunk1 = Seq((1L, 30L))
    val clkChunk2 = Seq((1L, 120L), (2L, 35L), (3L, 60L))
    val im1 = MemoryStream[(Long, Long)](spark)
    val cm1 = MemoryStream[(Long, Long)](spark)
    val q1 = newQuery(im1, cm1)
    im1.addData(impChunk1: _*); cm1.addData(clkChunk1: _*)
    q1.processAllAvailable()
    q1.stop() // "crash" mid-stream
    // restart: a restarted reader re-serves the same prefix, then the tail;
    // the file sink's commit log dedupes any replayed epoch.
    val im2 = MemoryStream[(Long, Long)](spark)
    val cm2 = MemoryStream[(Long, Long)](spark)
    im2.addData(impChunk1: _*)
    cm2.addData(clkChunk1: _*); cm2.addData(clkChunk2: _*)
    val q2 = newQuery(im2, cm2)
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .orderBy("c_user", "c_mins", "i_mins").collect()
    val batch = clks((clkChunk1 ++ clkChunk2).toDF()).join(imps(impChunk1.toDF()),
        expr("c_user = i_user AND i_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"), "inner")
      .select("c_user", "c_mins", "i_mins")
      .orderBy("c_user", "c_mins", "i_mins").collect()
    assert(got.length == batch.length && got.length == 3)
    got.zip(batch).foreach { case (s, b) => assert(s.toSeq == b.toSeq) }
    // the cross-restart matches exist (click after restart x impressions
    // from before): proof the interval-join state survived the restart
    assert(got.count(_.getLong(0) == 3L) == 2)
  }

  test("streaming curation: quality gate + PII scrub into the idempotent JDBC sink") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Ddl, DerbyDialect, JdbcSink}
    import org.apache.spark.sql.types._
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    // landing dir: fixture docs with deterministic planted emails
    val landing = java.nio.file.Files.createTempDirectory("curate_in").toString
    val docs = graft.core.Tables.documents(spark, graft.SparkTestBase.Sf0001)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(col("text")).as("text"),
        col("n_chars"))
    docs.write.parquet(s"$landing/docs.parquet")
    val expectedKept = docs.where(col("n_chars") >= 50).count()
    assert(expectedKept > 0 && docs.where(col("text").contains("@")).count() > 0)

    val url = s"jdbc:derby:memory:cur_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try Ddl.ensureTables(conn, DerbyDialect, "curated_docs",
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      Seq("doc_id"))
    finally conn.close()
    val cfg = JdbcSink.JdbcConfig(url, "", "", "curated_docs",
      columns = Seq("doc_id", "text"), keyCols = Seq("doc_id"),
      dialect = DerbyDialect, batchSize = 100, walTable = None, retryBaseDelayMs = 1)

    val schema = spark.read.parquet(s"$landing/docs.parquet").schema
    def run(cp: String): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$landing/docs.parquet")
      val q = EventStreams.curatedDocsToJdbc(stream, cfg, cp)
      q.processAllAvailable(); q.stop()
    }
    run(java.nio.file.Files.createTempDirectory("curate_cp").toString)
    def queryLong(sql: String): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val rs = c.createStatement().executeQuery(sql); rs.next(); rs.getLong(1) }
      finally c.close()
    }
    // quality gate dropped the short docs; every landed row is scrubbed
    assert(queryLong("SELECT COUNT(*) FROM \"curated_docs\"") == expectedKept)
    assert(queryLong("SELECT COUNT(*) FROM \"curated_docs\" WHERE \"text\" LIKE '%@%'") == 0L)
    assert(queryLong("SELECT COUNT(*) FROM \"curated_docs\" WHERE \"text\" LIKE '%<EMAIL>%'") > 0L)
    // a second pipeline over the same source (fresh checkpoint = full
    // replay) is absorbed by the idempotent sink — effectively-once
    run(java.nio.file.Files.createTempDirectory("curate_cp2").toString)
    assert(queryLong("SELECT COUNT(*) FROM \"curated_docs\"") == expectedKept)
  }

  test("StreamingQueryListener observability: progress rows account for every input row") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    // the monitoring surface a production pipeline alarms on: progress
    // events must (a) fire per micro-batch, (b) sum numInputRows to the
    // exact input volume, (c) report the terminated event on stop
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val progressEvents = new java.util.concurrent.atomic.AtomicInteger(0)
    val terminated = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) progressEvents.incrementAndGet()
        inputRows.addAndGet(e.progress.numInputRows); ()
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
        terminated.set(true)
      }
    }
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[(Long, Double)](spark)
      val q = mem.toDF().toDF("user_id", "value")
        .groupBy("user_id").count()
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("obs_counts").start()
      mem.addData((1L, 1.0), (2L, 2.0), (1L, 3.0))
      q.processAllAvailable()
      mem.addData((3L, 4.0), (2L, 5.0))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(60000)
      // listener delivery is async off the query lifecycle; poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while ((inputRows.get() < 5L || !terminated.get()) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(inputRows.get() == 5L,
        s"progress events must account for all 5 input rows, saw ${inputRows.get()}")
      assert(progressEvents.get() >= 2, "at least one progress event per data batch")
      assert(terminated.get(), "terminated event must fire on stop")
    } finally spark.streams.removeListener(listener)
  }

  test("Trigger.AvailableNow drains the backlog, stops, and a rerun takes only the delta") {
    import spark.implicits._
    // the incremental-batch pattern: a cron job runs the STREAMING query
    // with AvailableNow — it processes everything currently available
    // (respecting per-trigger bounds), terminates on its own, and the
    // next run resumes from the checkpoint so it reads only new files.
    val dir = java.nio.file.Files.createTempDirectory("anow").toString
    val landing = s"$dir/landing"; new java.io.File(landing).mkdirs()
    val cp = s"$dir/cp"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    def land(name: String, r: Seq[Long]): Unit = {
      val tmp = s"$dir/$name"
      r.toDF("id").coalesce(1).write.parquet(tmp)
      val src = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(landing, s"$name.parquet"))
      ()
    }
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Long = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => seen.add(r.getLong(0))); ()
        }
        .start()
      q.awaitTermination(120000) // AvailableNow terminates by itself
      assert(!q.isActive, "AvailableNow query must stop after draining")
      seen.size().toLong
    }
    land("a", 1L to 50L); land("b", 51L to 100L)
    val afterFirst = runOnce()
    assert(afterFirst == 100L, s"first run must drain both backlog files, saw $afterFirst")
    land("c", 101L to 130L)
    val afterSecond = runOnce()
    assert(afterSecond == 130L, s"second run must add only the delta, saw $afterSecond")
    import scala.jdk.CollectionConverters._
    assert(seen.iterator().asScala.toSeq.sorted == (1L to 130L),
      "no loss, no dupes across the two incremental runs")
  }

  test("file stream honors maxFilesPerTrigger: bounded micro-batches, no loss") {
    import spark.implicits._
    // 3 landing files -> with maxFilesPerTrigger=1 the source must take
    // at least 3 micro-batches (ingestion backpressure: at 100 TB/day a
    // file-listing source MUST bound per-trigger intake or the first
    // batch swallows the backlog)
    val dir = java.nio.file.Files.createTempDirectory("mft").toString
    Seq(1L to 100L, 101L to 200L, 201L to 300L).zipWithIndex.foreach { case (r, i) =>
      r.toDF("id").coalesce(1).write.parquet(s"$dir/f$i")
    }
    val landing = s"$dir/all"
    new java.io.File(landing).mkdirs()
    (0 until 3).foreach { i =>
      val src = new java.io.File(s"$dir/f$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(landing, s"part$i.parquet"))
    }
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.incrementAndGet(); rows.addAndGet(b.count()); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches.get() >= 3, s"expected >=3 bounded micro-batches, got ${batches.get()}")
    assert(rows.get() == 300L, "no rows lost across bounded batches")
  }

  test("stream-static decontamination equals the batch d15 shape") {
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val sfDir = graft.SparkTestBase.Sf0001
    val docs = graft.core.Tables.documents(spark, sfDir)
    val sh = Dedup.shingleTable(docs)
    // static benchmark side (tiny, broadcast) — identical in both paths
    val bench = sh.where(col("doc_id") % 97 === 0).select("sh").distinct()
    val expected = Dedup.decontaminate(sh.where(col("doc_id") % 97 =!= 0), bench)
      .orderBy("doc_id").collect()
    val stream = EventStreams.readDocumentStream(spark, sfDir)
      .where(col("doc_id") % 97 =!= 0)
    val q = EventStreams.streamingDecontaminate(stream, bench)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sdecon").start()
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id, n_shared FROM sdecon ORDER BY doc_id").collect()
    q.stop()
    assert(got.length == expected.length && got.length > 0)
    got.zip(expected).foreach { case (g, e) => assert(g.toSeq == e.toSeq) }
  }
}
