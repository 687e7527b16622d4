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
    // the UTC session TZ, never an epoch shift. Compare through unix_micros
    // against DuckDB-visible epoch integers recomputed from the raw file.
    val d = sfDirs.head
    import org.apache.spark.sql.functions._
    val viaLoader = Tables.events(spark, d)
      .agg(sum(unix_micros(col("ts"))).as("s"), count(lit(1)).as("n")).collect()(0)
    val raw = spark.read.parquet(s"$d/events.parquet")
    val rawMicros = raw.schema("ts").dataType match {
      case LongType => raw.select((col("ts") / 1000).cast("long").as("us"))
      case _        => raw.select(col("ts").cast(TimestampType).as("t"))
                          .select(unix_micros(col("t")).as("us"))
    }
    val viaRaw = rawMicros.agg(sum(col("us")).as("s"), count(lit(1)).as("n")).collect()(0)
    assert(viaLoader.getLong(1) == viaRaw.getLong(1), "row count mismatch")
    assert(viaLoader.getLong(0) == viaRaw.getLong(0),
      "epoch-micros checksum mismatch — loader normalization shifted values")
  }
}
