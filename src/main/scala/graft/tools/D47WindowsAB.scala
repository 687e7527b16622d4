package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-session A/B of d47's window emit:
  * A = pre-r16 HOF chain (split + transform/slice/concat_ws + md5 hex
  * keys), B = the one-pass word_window_hashes codegen expression (long
  * keys). Full substringDedup body both arms; result rows (count +
  * order-insensitive hash over all output columns) asserted identical
  * every round; verdict is best-of-N per arm (r15 discipline).
  *
  *   runMain graft.tools.D47WindowsAB <sfDir> <rounds>
  */
object D47WindowsAB {

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
    var sig: (Long, Long) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val df = graft.ops.Dedup.substringDedup(
        graft.core.Tables.documents(spark, sfDir), k = 8, hofWindows = arm == "A")
      val row = df.select(count(lit(1)), bit_xor(xxhash64(df.columns.map(col): _*))).collect()(0)
      val s = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      if (sig == null) sig = s else require(sig == s, s"RESULT DIVERGENCE arm=$arm: $s vs $sig")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      reps(arm) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB rows=${s._1} hash=${s._2}")
    }

    runArm("A") // warm-up slot, excluded from the verdict
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== d47 A(HOF+md5, excl. warm-up):      ${best(reps("A").toSeq.drop(1))}")
    println(s"== d47 B(word_window_hashes, longs):   ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
