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
}
