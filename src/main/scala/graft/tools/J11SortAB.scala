package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interleaved same-session A/B of j11's edge-cache SORT layout:
  * A = r15 status quo (repartition(src) before persist — co-located but
  * unsorted, so every superstep's sort-merge join re-SORTS the
  * corpus-scale edge side), B = repartition(src) + sortWithinPartitions
  * (supersteps read the cache co-located and co-sorted; only the N-row
  * rank/degree tables are sorted per iteration). Same discipline as
  * J11LayoutAB: both arms run the full registered query body, result
  * rows asserted identical every round, verdict is best-of-N per arm.
  *
  *   runMain graft.tools.J11SortAB <sfDir> <rounds>
  */
object J11SortAB {

  private def trades(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()

  private final class Agg extends SparkListener {
    var runMs = 0L; var gcMs = 0L; var shufW = 0L; var spill = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) synchronized {
        runMs += m.executorRunTime; gcMs += m.jvmGCTime
        shufW += m.shuffleWriteMetrics.bytesWritten
        spill += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
    def reset(): Unit = synchronized { runMs = 0; gcMs = 0; shufW = 0; spill = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var expect: Seq[String] = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val out = graft.ops.Joins
        .pagerankRanked(spark, trades(spark, sfDir), sortedEdgeCache = arm == "B")
        .collect().map(_.toString).toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.PipelineCache.release()
      ProfileD39.drainListenerBus(spark)
      if (expect == null) expect = out
      else require(expect == out, s"RESULT DIVERGENCE arm=$arm")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      reps(arm) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB")
    }

    runArm("A") // warm-up slot (codegen/classload); excluded from the verdict
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== j11 A(unsorted cache, excl. warm-up): ${best(reps("A").toSeq.drop(1))}")
    println(s"== j11 B(sorted cache):                  ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
