package graft.core

import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Fixture-drift tripwire (VERDICT r7 ask #4). The driver regenerates the
  * parquet fixtures between rounds and has already changed events.ts's
  * physical type once (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) no-tz), which
  * silently dropped every unix_micros-based query from the gate. These
  * asserts turn the next physical-type drift into a named test failure:
  * whatever the file carries, the batch loader must normalize ts to
  * TimestampType, and the stream loader must agree with it exactly.
  */
class FixtureDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "events.parquet").exists())

  test("Tables.events yields TimestampType ts at every available scale factor") {
    assert(sfDirs.nonEmpty, "no fixture directories found")
    sfDirs.foreach { d =>
      val schema = Tables.events(spark, d).schema
      assert(schema("ts").dataType == TimestampType,
        s"$d: Tables.events ts is ${schema("ts").dataType}, expected TimestampType — " +
          "fixture physical type drifted; extend the dispatch in Tables.events")
      assert(schema("event_id").dataType == LongType, s"$d: event_id type drifted")
      assert(schema("event_type").dataType == StringType, s"$d: event_type type drifted")
    }
  }

  test("batch and stream event loaders agree on the full schema") {
    val d = sfDirs.head
    val batch = Tables.events(spark, d).schema
    val stream = graft.streaming.EventStreams.readEventStream(spark, d).schema
    assert(stream == batch,
      s"stream loader schema $stream != batch loader schema $batch — " +
        "keep the footer dispatch in EventStreams.readEventStream in sync with Tables.events")
  }

  test("events ts values are identical through batch loader vs raw epoch micros") {
    // Value-level guard: the normalization must be a pure type change under
    // the UTC session TZ, never an epoch shift. The raw side deliberately
    // does NOT reuse the loader's cast (a session-TZ epoch shift would move
    // both sides identically and pass — ADVICE r8): NTZ wall-clock values
    // are converted to epoch micros with pure date/time ARITHMETIC, and the
    // long-nanos form with integer division (a double `/ 1000` truncation
    // can drift by 1us above 2^53 nanos).
    val d = sfDirs.head
    import org.apache.spark.sql.functions._
    val viaLoader = Tables.events(spark, d)
      .agg(sum(unix_micros(col("ts"))).as("s"), count(lit(1)).as("n")).collect()(0)
    val raw = spark.read.parquet(s"$d/events.parquet")
    val rawMicros = raw.schema("ts").dataType match {
      case LongType => raw.select(expr("ts div 1000").as("us"))
      case _ =>
        // wall-clock -> epoch micros, TZ-free: days since epoch * 86400e6
        // + time-of-day (extract SECOND carries the fractional micros as
        // DECIMAL(8,6), so the arithmetic is integer-exact)
        raw.select((
          expr("unix_date(cast(ts AS date))").cast("long") * lit(86400000000L) +
          hour(col("ts")).cast("long") * lit(3600000000L) +
          minute(col("ts")).cast("long") * lit(60000000L) +
          expr("cast(extract(SECOND FROM ts) * 1000000 AS long)")
        ).as("us"))
    }
    val viaRaw = rawMicros.agg(sum(col("us")).as("s"), count(lit(1)).as("n")).collect()(0)
    assert(viaLoader.getLong(1) == viaRaw.getLong(1), "row count mismatch")
    assert(viaLoader.getLong(0) == viaRaw.getLong(0),
      "epoch-micros checksum mismatch — loader normalization shifted values")
  }

  test("sf0.001 fixture content matches the pinned per-table checksums") {
    // Content tripwire (VERDICT r8 ask #5): the schema pins above catch
    // TYPE drift; this catches the driver silently REGENERATING fixture
    // content (the class of drift that changes expected row sets). On a
    // legitimate regeneration this fails by name — rerun
    //   sbt "runMain graft.tools.FixturePin /root/testdata/sf0.001"
    // and update the pins. events is checksummed through Tables.events,
    // so a pure physical-type change does NOT trip this pin.
    val pinned = Map(
      "region" -> (5L, "2958298323220276869"),
      "nation" -> (25L, "-8833458685144352566"),
      "customer" -> (150L, "61128315032427211102"),
      "supplier" -> (10L, "-2843318196254057512"),
      "part" -> (200L, "79964764577685053631"),
      "orders" -> (1500L, "393587217672476742903"),
      "lineitem" -> (6000L, "-1161279470290331700"),
      "events" -> (1000L, "-405771985457824741295"),
      "documents" -> (500L, "266447093231719075240"),
      "embeddings" -> (500L, "56951596873331825549"))
    val got = graft.tools.FixturePin.checksums(spark, "/root/testdata/sf0.001")
    assert(got.map(_._1).toSet == pinned.keySet, "fixture table set drifted")
    got.foreach { case (t, n, h) =>
      val (pn, ph) = pinned(t)
      assert(n == pn, s"$t: row count $n != pinned $pn — fixture content regenerated; " +
        "rerun graft.tools.FixturePin and update the pins")
      assert(h == ph, s"$t: content checksum $h != pinned $ph — fixture content " +
        "regenerated; rerun graft.tools.FixturePin and update the pins")
    }
  }
}
