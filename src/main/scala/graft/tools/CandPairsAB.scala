package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-session A/B of the LSH candidate-pair generation
  * (graft.ops.Dedup): A = status-quo band self-join followed by a
  * pair-scale `distinct()` (the engine's largest measured stage at sf10:
  * 103.5M band pairs into a partial+final hash aggregate, 9.6 GB spill —
  * r16 VERDICT #1), B = min-band dedup (Dedup.minBandPairs via
  * portableCandidatePairs): each banded row carries its doc's per-band
  * kept-bucket hashes and the join filter emits a pair only at the
  * lowest band where it collides, so the pair set is unique by
  * construction and the distinct disappears.
  *
  * The signature table is built ONCE (outside the timed region,
  * persisted) and feeds both arms; pair-set equality (count +
  * multiplicity-sensitive order-insensitive checksum: SUM of per-row
  * xxhash64 in DECIMAL(38,0), not bit_xor — r16 ADVICE) is asserted
  * every round. Best-of-N per arm is the verdict — this box inflates CPU
  * 2-3x between back-to-back reps (r15 discipline).
  *
  *   runMain graft.tools.CandPairsAB <sfDir> <rounds>
  */
object CandPairsAB {

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

    // Shared input: the portable signature table, persisted and
    // materialized once — the arms time ONLY candidate generation.
    val base = graft.ops.Dedup.portableSigTable(spark, sfDir).persist()
    val nDocs = base.count()
    println(s"signature table: $nDocs docs")

    // Arm A: the pre-r17 shape, inlined verbatim (window cap -> band
    // self-join -> pair-scale distinct).
    def oldPairs(): DataFrame = {
      val banded = graft.ops.Dedup.bandedKeys(base)
      val capped = banded
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
        .where(col("bsz") <= graft.ops.Dedup.MaxBucket)
        .drop("bsz")
      capped.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
        .join(capped.select(col("band"), col("bh"), col("doc_id").as("doc_b")),
              Seq("band", "bh"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep], "B" -> mutable.ArrayBuffer.empty[Rep])
    var sig: (Long, java.math.BigDecimal) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val pairs = if (arm == "A") oldPairs()
                  else graft.ops.Dedup.portableCandidatePairs(base)
      val row = pairs.select(count(lit(1)),
        sum(xxhash64(col("doc_a"), col("doc_b")).cast("decimal(38,0)"))).collect()(0)
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
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB pairs=${s._1}")
    }

    runArm("A") // untimed-in-verdict warm-up slot still recorded for visibility
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== cand A(self-join + distinct, excl. warm-up rep): ${best(reps("A").toSeq.drop(1))}")
    println(s"== cand B(min-band dedup, no distinct):             ${best(reps("B").toSeq)}")
    spark.stop()
  }
}
