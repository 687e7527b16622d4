package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Interleaved same-session A/B of a RUNTIME SQL conf over any registered
  * query — the round-15 adjudication discipline (J11LayoutAB /
  * VerifyJaccardAB / T2WriteAB) generalized to conf experiments: this box
  * inflates CPU 2-3x between back-to-back reps, so sequential
  * before/after numbers are not trustworthy; both arms must run
  * interleaved in one session and the verdict is best-of-N per arm.
  *
  * Result equality is asserted EVERY round: row count plus an
  * order-insensitive checksum over the output rows (join-strategy and
  * partitioning confs must never change what a query computes).
  *
  *   runMain graft.tools.ConfAB <query> <sfDir> <rounds> <conf=valueB> [conf=valueB ...]
  *
  * Arm A runs with the session defaults (the bench's config); arm B sets
  * the given conf(s) for its reps and restores the defaults afterwards.
  */
object ConfAB {

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
    require(args.length >= 4, "usage: ConfAB <query> <sfDir> <rounds> <conf=value> ...")
    val qname = args(0); val sfDir = args(1); val rounds = args(2).toInt
    val confs = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
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
    val q = graft.SparkEntry.queries.getOrElse(qname, sys.error(s"unknown query $qname"))
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    val defaults = confs.map { case (k, _) => k -> spark.conf.getOption(k) }

    // one untimed warm-up under defaults (codegen/classload)
    q(spark, sfDir).count(); graft.ops.PipelineCache.release()

    // Order-insensitive but MULTIPLICITY-SENSITIVE checksum: a SUM of
    // per-row hashes in DECIMAL(38,0), not bit_xor — xor self-cancels
    // when a row's multiplicity changes by an even number, so a conf
    // that duplicated rows in pairs would have passed as "identical"
    // (r16 ADVICE).
    def checksum(): (Long, java.math.BigDecimal) = {
      import org.apache.spark.sql.functions._
      val df = q(spark, sfDir)
      val row = df.select(
        count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()(0)
      (row.getLong(0),
       if (row.isNullAt(1)) java.math.BigDecimal.ZERO else row.getDecimal(1))
    }

    final case class Rep(wall: Double, cpu: Double, gc: Double, shufGb: Double, spillGb: Double)
    val repsA = mutable.ArrayBuffer.empty[Rep]
    val repsB = mutable.ArrayBuffer.empty[Rep]
    var sig: (Long, java.math.BigDecimal) = null

    def runArm(arm: String): Unit = {
      if (arm == "B") confs.foreach { case (k, v) => spark.conf.set(k, v) }
      else defaults.foreach { case (k, d) => d.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      agg.reset()
      val t0 = System.nanoTime()
      val s = checksum()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.PipelineCache.release()
      ProfileD39.drainListenerBus(spark)
      if (sig == null) sig = s
      else require(sig._1 == s._1 && sig._2.compareTo(s._2) == 0,
        s"RESULT DIVERGENCE arm=$arm: $s vs $sig")
      val rep = agg.synchronized(Rep(wall, agg.runMs / 1000.0, agg.gcMs / 1000.0,
        agg.shufW / 1e9, agg.spill / 1e9))
      (if (arm == "A") repsA else repsB) += rep
      println(f"[$arm] wall=${rep.wall}%6.1fs cpu=${rep.cpu}%7.1fs gc=${rep.gc}%5.1fs " +
        f"shufW=${rep.shufGb}%5.2fGB spill=${rep.spillGb}%6.2fGB rows=${s._1} hash=${s._2}")
    }

    for (r <- 1 to rounds) { println(s"-- round $r"); runArm("A"); runArm("B") }
    def best(rs: Seq[Rep]) =
      f"wall=${rs.map(_.wall).min}%.1fs cpu=${rs.map(_.cpu).min}%.1fs gc=${rs.map(_.gc).min}%.1fs " +
        f"shufW=${rs.map(_.shufGb).min}%.2fGB spill=${rs.map(_.spillGb).min}%.2fGB"
    println(s"== $qname best-of-$rounds  A(defaults): ${best(repsA.toSeq)}")
    println(s"== $qname best-of-$rounds  B(${confs.map { case (k, v) => s"$k=$v" }.mkString(",")}): ${best(repsB.toSeq)}")
    spark.stop()
  }
}
