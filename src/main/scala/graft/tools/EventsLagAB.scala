package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interleaved same-session A/B answering r16 VERDICT #6: can e3/e7's
  * two-level lag (per-(user, day) windows + boundary stitch — the
  * hot-user-safe shape) fold into ONE per-user window pass? Arm A = the
  * registered queries (twoLevelLag), arm B = the single-window
  * formulation (lag over PARTITION BY user_id ORDER BY us, event_id —
  * one exchange + one sort, but a hot user's whole history through one
  * window task). Result equality asserted every round; best-of-N.
  *
  * The decision rule is NOT wall-clock alone: B concentrates a hot
  * user's events into one task, which is exactly the 100 TB straggler
  * the two-level shape exists to avoid — B must win CLEARLY at sf10 to
  * justify giving that up.
  *
  *   runMain graft.tools.EventsLagAB <sfDir> <rounds>
  */
object EventsLagAB {

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
    graft.GraftExtensions.register(spark)

    val wU = Window.partitionBy("user_id").orderBy("us", "event_id")

    // e7 single-pass twin
    def e7Single(): DataFrame =
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"),
                unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("prev_event_type", lag(col("event_type"), 1).over(wU))
        .where(col("prev_event_type").isNotNull)
        .groupBy(col("prev_event_type").as("from_type"),
                 col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")

    // e3 single-pass twin
    def e3Single(): DataFrame = {
      val lagged = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"),
                unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(wU))
        .withColumn("new_s",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
      lagged
        .withColumn("session_id", sum("new_s").over(
          wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
             count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_id")
    }

    def build(q: String, arm: String): DataFrame = (q, arm) match {
      case ("e7", "A") => graft.SparkEntry.queries("e7_transition_matrix")(spark, sfDir)
      case ("e7", _)   => e7Single()
      case ("e3", "A") => graft.SparkEntry.queries("e3_sessionization")(spark, sfDir)
      case (_, _)      => e3Single()
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)

    for (q <- Seq("e7", "e3")) {
      val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
      var sig: (Long, java.math.BigDecimal) = null
      def runArm(arm: String): Unit = {
        agg.reset()
        val t0 = System.nanoTime()
        val df = build(q, arm)
        val row = df.select(count(lit(1)),
          sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()(0)
        val s = (row.getLong(0), row.getDecimal(1))
        val wall = (System.nanoTime() - t0) / 1e9
        graft.ops.PipelineCache.release()
        ProfileD39.drainListenerBus(spark)
        if (sig == null) sig = s
        else require(sig._1 == s._1 && sig._2.compareTo(s._2) == 0,
          s"RESULT DIVERGENCE $q arm=$arm: $s vs $sig")
        val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
          agg.shufW / 1e9, agg.spill / 1e9))
        reps(arm) += rep
        println(f"[$q $arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
          f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB rows=${s._1}")
      }
      runArm("A") // warm-up slot
      for (r <- 1 to rounds) { println(s"-- $q round $r"); runArm("A"); runArm("B") }
      def best(rs: Seq[Rep]) =
        f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs " +
          f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
      println(s"== $q A(two-level lag, excl. warm-up): ${best(reps("A").toSeq.drop(1))}")
      println(s"== $q B(single per-user window):       ${best(reps("B").toSeq)}")
    }
    spark.stop()
  }
}
