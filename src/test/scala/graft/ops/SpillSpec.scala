package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkTestBase

/** Spill-awareness: at 100 TB, partitions WILL exceed executor memory
  * sometimes, and the engine's correctness contract must survive the
  * sort/aggregate/window operators spilling to disk. This spec forces
  * spills at fixture scale (element thresholds dropped to 16, hash
  * aggregation forced onto its sort-based fallback) and
  * asserts (a) bytes actually spilled — so the test cannot silently
  * pass un-spilled — and (b) results are row-identical to the unspilled
  * run.
  */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val AggFallback = "spark.sql.TungstenAggregate.testFallbackStartsAt"
  private val NoBroadcast = "spark.sql.autoBroadcastJoinThreshold"

  private val SpillConfs = Seq(
    "spark.sql.shuffle.spill.numElementsForceSpillThreshold",
    // the in.memory thresholds (default 4096) gate the external-sorter
    // path entirely at fixture row counts — both knobs must drop for a
    // real spill to occur
    "spark.sql.windowExec.buffer.in.memory.threshold",
    "spark.sql.windowExec.buffer.spill.threshold",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold")

  test("window + aggregation + join results are identical under forced spill") {
    def run(name: String): Array[org.apache.spark.sql.Row] =
      graft.SparkEntry.queries(name)(spark, SparkTestBase.Sf0001).collect()

    val queries = Seq("w1_running_max_token", "q1_pricing_summary", "q10_returned_revenue")
    val baseline = queries.map(q => q -> run(q)).toMap

    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled); () }
      }
    }
    val prev = (SpillConfs ++ Seq(AggFallback, NoBroadcast)).map(k => k -> spark.conf.getOption(k)).toMap
    SpillConfs.foreach(k => spark.conf.set(k, "16"))
    // force HashAggregate onto its sort-based spill fallback immediately
    spark.conf.set(AggFallback, "1,1")
    // disable auto-broadcast so q10's hint-free fact joins plan as
    // sort-merge joins — a broadcast hash join never touches the SMJ
    // spill buffers, which would leave the join leg of this contract
    // vacuous (q10's one explicit broadcast() hint still wins, which is
    // fine: the two fact-fact joins are the ones that must spill)
    spark.conf.set(NoBroadcast, "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val under = queries.map(q => q -> run(q)).toMap
      // listener delivery is async; poll until the spill counter moves
      val deadline = System.nanoTime() + 30e9.toLong
      while (spilled.get() == 0L && System.nanoTime() < deadline) Thread.sleep(50)
      assert(spilled.get() > 0L,
        "thresholds of 16 elements must force real spills at fixture scale")
      queries.foreach { q =>
        assert(under(q).map(_.toString).toSeq == baseline(q).map(_.toString).toSeq,
          s"$q diverged under forced spill")
      }
      // prove the join leg is not vacuous: q10 must have planned an SMJ
      val q10 = graft.SparkEntry.queries("q10_returned_revenue")(spark, SparkTestBase.Sf0001)
      q10.collect()
      assert(q10.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "the fact joins must plan as sort-merge joins under the spill confs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
