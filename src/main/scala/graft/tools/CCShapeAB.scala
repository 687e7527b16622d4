package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-session A/B of the connected-components edge-cache
  * layout (graft.ops.Dedup.clusterLabels): A = status-quo unpartitioned
  * edge cache (every superstep's sort-merge join re-exchanges AND
  * re-sorts the corpus-scale edge side), B = repartition(dst) +
  * sortWithinPartitions before the persist (superstep joins read the
  * cache co-located and co-sorted; only the N-row label table moves per
  * iteration). Motivated by the r16 d49 sf10 ProfileQuery: two ~55M-row
  * edge exchanges (stages 316/280, 69+23 CPU-s) plus per-superstep
  * 3.1 GB sort spills inside the superstep stages.
  *
  * The pair graph is built ONCE (outside the timed region, persisted) and
  * feeds both arms; label-set equality (count + order-insensitive hash)
  * is asserted every round. Best-of-N per arm is the verdict — this box
  * inflates CPU 2-3x between back-to-back reps (r15 discipline).
  *
  *   runMain graft.tools.CCShapeAB <sfDir> <rounds>
  */
object CCShapeAB {

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

    // Shared input: the verified near-dup pair set, persisted and
    // materialized once — the arms time ONLY the CC core.
    val pairs = graft.ops.Dedup.minhashPortablePairs(spark, sfDir, 0.5).persist()
    val nPairs = pairs.count()
    graft.ops.PipelineCache.release() // drop the sig-table persists; pairs cache is ours
    println(s"pair graph: $nPairs pairs")

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var sig: (Long, Long) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val labels = graft.ops.Dedup.clusterLabels(pairs, sortedEdgeCache = arm == "B")
      val row = labels.select(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("cluster_rep"))))
        .collect()(0)
      val s = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.PipelineCache.release() // drop the final checkpoint blocks
      ProfileD39.drainListenerBus(spark)
      if (sig == null) sig = s else require(sig == s, s"RESULT DIVERGENCE arm=$arm: $s vs $sig")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      reps(arm) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB labels=${s._1} hash=${s._2}")
    }

    runArm("A") // untimed-in-verdict warm-up slot still recorded for visibility
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== CC A(status quo, excl. warm-up rep): ${best(reps("A").toSeq.drop(1))}")
    println(s"== CC B(repartition+sorted cache):      ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
