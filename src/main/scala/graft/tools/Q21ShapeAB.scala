package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interleaved same-session A/B of q21_waiting_supplier's lineitem⨝orders
  * join strategy: A = status quo (planner default — sort-merge at sf10:
  * the r17 baseline profile puts 203 CPU-s and 18 GB spill in the one
  * stage that sorts both sides, joins, and runs both cascaded
  * aggregates), B = scoped SHUFFLE_HASH hint on the orders side (narrow
  * build rows; the 60M-row lineitem side streams unsorted into the same
  * in-stage aggregate cascade). The hint changes no exchange — shuffle
  * bytes must come out identical; the delta is the two SMJ sorts.
  *
  * Result equality (count + multiplicity-sensitive checksum) asserted
  * every round; best-of-N per arm.
  *
  *   runMain graft.tools.Q21ShapeAB <sfDir> <rounds>
  */
object Q21ShapeAB {

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

    // q21 body, verbatim from Analytics, with the orders-side join
    // strategy as the single degree of freedom.
    def q21(shj: Boolean): DataFrame = {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey", "l_shipdate")
      val o0 = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
      val o = if (shj) o0.hint("shuffle_hash") else o0
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("is_late")).as("any_late"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
             count(when(col("any_late"), lit(1))).as("n_late_supp"),
             max(when(col("any_late"), col("l_suppkey"))).as("late_supp"))
        .where(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
              col("late_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var sig: (Long, java.math.BigDecimal) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val df = q21(shj = arm == "B")
      val row = df.select(count(lit(1)),
        sum(xxhash64(col("s_name"), col("numwait")).cast("decimal(38,0)"))).collect()(0)
      val s = (row.getLong(0), row.getDecimal(1))
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      if (sig == null) sig = s
      else require(sig._1 == s._1 && sig._2.compareTo(s._2) == 0,
        s"RESULT DIVERGENCE arm=$arm: $s vs $sig")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      reps(arm) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB rows=${s._1}")
    }

    runArm("A") // untimed-in-verdict warm-up slot still recorded for visibility
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== q21 A(default SMJ, excl. warm-up rep): ${best(reps("A").toSeq.drop(1))}")
    println(s"== q21 B(SHUFFLE_HASH hint on orders):    ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
