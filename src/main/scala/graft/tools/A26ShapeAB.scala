package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interleaved same-session A/B of a26_market_basket's op-cache layout:
  * A = status quo (`op = lineitem.select(o,p).distinct()` — the cache
  * comes out hashpartitioned on (o,p), so the basket aggregate
  * (groupBy o) and the nOrders countDistinct each pay ANOTHER op-scale
  * exchange downstream), B = `repartition(o)` before the distinct (the
  * distinct's aggregates satisfy their clustering from hashpartitioning
  * on the subset key, so the cache comes out o-partitioned and ALL
  * o-keyed consumers — baskets, nOrders — reuse it with zero exchange;
  * pc still exchanges by p either way). The (o,p) dup factor in
  * lineitem is ~1.0 (r17 baseline profile: 60.0M -> 59.99M rows through
  * the map-side partial), so arm A's pre-exchange partial aggregation
  * buys nothing and its 5.3 GB spill is pure waste.
  *
  * Each arm builds its own caches inside the timed region (the judged
  * bench pays cache build too) and releases them after. Result equality
  * (count + multiplicity-sensitive checksum) asserted every round;
  * best-of-N per arm.
  *
  *   runMain graft.tools.A26ShapeAB <sfDir> <rounds>
  */
object A26ShapeAB {

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

    val MaxBasket = 64L // mirrors Analytics.MaxBasket

    // a26 body, verbatim from Analytics, with the op-cache distribution
    // as the single degree of freedom.
    def a26(repart: Boolean): DataFrame = {
      val op0 = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val op = (if (repart) op0.repartition(col("o")) else op0)
        .distinct().persist()
      val pc = op.groupBy("p").agg(count(lit(1)).as("c")).persist()
      graft.ops.PipelineCache.retain(op, pc)
      val nOrders = op.select(countDistinct(col("o")).as("n_orders"))
      val baskets = op
        .join(pc.where(col("c") >= 3).select("p"), Seq("p"), "left_semi")
        .groupBy("o").agg(sort_array(collect_list(col("p"))).as("ps"))
        .where(size(col("ps")) <= MaxBasket && size(col("ps")) >= 2)
      val pairs = baskets
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ps) - 2),
             i -> transform(slice(ps, i + 2, size(ps) - i - 1),
                            q -> struct(ps[i] AS pa, q AS pb))))""")).as("pr"))
        .select(col("pr.pa"), col("pr.pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("both_c"))
        .where(col("both_c") >= 3)
      pairs
        .join(pc.toDF("pa", "ca"), "pa")
        .join(pc.toDF("pb", "cb"), "pb")
        .crossJoin(broadcast(nOrders))
        .withColumn("lift_micro",
          expr("cast(both_c as decimal(38,0)) * n_orders * 1000000 div (cast(ca as decimal(38,0)) * cb)"))
        .select("pa", "pb", "both_c", "ca", "cb", "lift_micro")
        .orderBy(col("both_c").desc, col("lift_micro").desc, col("pa"), col("pb"))
        .limit(50)
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var sig: (Long, java.math.BigDecimal) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val df = a26(repart = arm == "B")
      val row = df.select(count(lit(1)),
        sum(xxhash64(col("pa"), col("pb"), col("both_c"), col("ca"), col("cb"),
                     col("lift_micro")).cast("decimal(38,0)"))).collect()(0)
      val s = (row.getLong(0), row.getDecimal(1))
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.PipelineCache.release() // each arm rebuilds its own caches
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
    println(s"== a26 A(op distinct on (o,p), excl. warm-up rep): ${best(reps("A").toSeq.drop(1))}")
    println(s"== a26 B(repartition(o) + distinct):               ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
