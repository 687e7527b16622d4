package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-session A/B of the exact-Jaccard verify-attach
  * layout (graft.ops.Dedup.exactJaccardOnPairs): A = status quo (both
  * shingle-set attach joins planned by default — sort-merge at sf10, so
  * the wide pairs+h_a side is SORTED by doc_b: 13 GB spill in the r17
  * d49 baseline profile, stage 202), B = scoped SHUFFLE_HASH hint on the
  * hs side of both attach joins (the hs side is one row per doc — the
  * natural build side; the wide pair side streams unsorted). Unlike the
  * r16 session-wide AQE SMJ->SHJ threshold (rejected: +4.3 GB shuffle on
  * OTHER joins), the hint changes no exchange — shuffle bytes must come
  * out identical, the delta is pure sort CPU + spill.
  *
  * Signature table AND candidate pairs are built once (persisted,
  * outside the timed region); the arms time ONLY attach+verify.
  * Result equality (count + multiplicity-sensitive checksum) asserted
  * every round; best-of-N per arm.
  *
  *   runMain graft.tools.VerifyAttachAB <sfDir> <rounds>
  */
object VerifyAttachAB {

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

    val base = graft.ops.Dedup.portableSigTable(spark, sfDir).persist()
    val nDocs = base.count()
    val pairs = graft.ops.Dedup.portableCandidatePairs(base).persist()
    val nPairs = pairs.count()
    println(s"signature table: $nDocs docs, candidate pairs: $nPairs")

    // The attach+verify tail of verifiedNearDups, with the join strategy
    // as the single degree of freedom: "A" = planner default, "B" = both
    // hs sides hinted SHUFFLE_HASH, "C" = only the second (wide-probe)
    // join hinted — the 13 GB sort spill is all in join 2, and at toy
    // scale C preserves join 1's free broadcast.
    def attach(arm: String): DataFrame = {
      val hs = base.select(col("doc_id"), sort_array(col("hpos")).as("hpos"))
      def side(id: String, sfx: String, shj: Boolean) = {
        val s = hs.select(col("doc_id").as(id), col("hpos").as("h" + sfx))
        if (shj) s.hint("shuffle_hash") else s
      }
      pairs
        .join(side("doc_a", "_a", shj = arm == "B"), Seq("doc_a"))
        .join(side("doc_b", "_b", shj = arm != "A"), Seq("doc_b"))
        .withColumn("jaccard", call_function("jaccard_sorted", col("h_a"), col("h_b")))
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    }

    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val reps = Map("A" -> mutable.ArrayBuffer.empty[Rep],
                   "B" -> mutable.ArrayBuffer.empty[Rep],
                   "C" -> mutable.ArrayBuffer.empty[Rep])
    var sig: (Long, java.math.BigDecimal) = null

    def runArm(arm: String): Unit = {
      agg.reset()
      val t0 = System.nanoTime()
      val df = attach(arm)
      val row = df.select(count(lit(1)),
        sum(xxhash64(col("doc_a"), col("doc_b"), col("jaccard")).cast("decimal(38,0)")))
        .collect()(0)
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
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB verified=${s._1}")
    }

    runArm("A") // untimed-in-verdict warm-up slot still recorded for visibility
    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B"); runArm("C") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== attach A(default SMJ, excl. warm-up rep):  ${best(reps("A").toSeq.drop(1))}")
    println(s"== attach B(SHUFFLE_HASH hint on both sides): ${best(reps("B").toSeq)}")
    println(s"== attach C(SHUFFLE_HASH hint on join 2 only):${best(reps("C").toSeq)}")
    spark.stop()
  }
}
