package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Interleaved same-session A/B of a25_gini's exact global rank: A =
  * single-partition row_number over the per-customer aggregate (the
  * engine's last unbounded `No Partition Defined` WindowExec — customer
  * cardinality at corpus scale), B = bucket-major two-pass rank (101
  * equal-width cent buckets: exclusive prefix of bucket counts over a
  * <= 101-row window + distributed within-bucket row_number). The rank
  * decomposition is exact, so the SINGLE OUTPUT ROW must match bit-for-
  * bit; asserted every round. Best-of-N per arm.
  *
  *   runMain graft.tools.A25RankAB <sfDir> <rounds>
  */
object A25RankAB {

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

    def cr: DataFrame = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))

    def finish(r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("n"),
            sum(col("i") * col("rev")).as("s1"),
            sum(col("rev")).as("s2"))
        .select(
          ((lit(2) * col("s1") - (col("n") + 1) * col("s2")).cast("double") /
             (col("n") * col("s2").cast("double"))).as("gini"),
          col("n").as("n_customers"),
          col("s2").cast("double").as("total_revenue"))

    def gini(arm: String): DataFrame = arm match {
      case "A" =>
        val w = Window.orderBy(col("rev"), col("o_custkey"))
        finish(cr.withColumn("i", row_number().over(w).cast("long")))
      case _ =>
        val base = cr
        val st = base.agg(min(col("rev")).as("mn"), max(col("rev")).as("mx"))
        val b = base.crossJoin(broadcast(st))
          .withColumn("k", expr(
            "cast((cast(rev * 100 as decimal(38,0)) - cast(mn * 100 as decimal(38,0))) * 100 " +
              "div (cast(mx * 100 as decimal(38,0)) - cast(mn * 100 as decimal(38,0)) + 1) as int)"))
          .select("o_custkey", "rev", "k")
        val offs = b.groupBy("k").agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(
            sum(col("bn")).over(Window.orderBy("k")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("k", "off")
        finish(b
          .withColumn("rw", row_number().over(
            Window.partitionBy("k").orderBy(col("rev"), col("o_custkey"))).cast("long"))
          .join(broadcast(offs), Seq("k"))
          .withColumn("i", col("off") + col("rw")))
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var sig: String = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val row = gini(arm).collect()(0)
      val s = s"${row.getDouble(0)}|${row.getLong(1)}|${row.getDouble(2)}"
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      if (sig == null) sig = s else require(sig == s, s"RESULT DIVERGENCE arm=$arm: $s vs $sig")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      reps(arm) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB out=$s")
    }

    runArm("A") // untimed-in-verdict warm-up slot still recorded for visibility
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== a25 A(single-partition global rank, excl. warm-up): ${best(reps("A").toSeq.drop(1))}")
    println(s"== a25 B(bucket-major two-pass rank):                  ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
