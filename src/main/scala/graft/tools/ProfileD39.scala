package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Scratch profiler for d39_entity_resolution (VERDICT r13 #5: explain
  * the 79-146 s isolated spread at 100x). Replays the query's pipeline
  * phase by phase — feature build, each blocking pass, candidate
  * distinct, feature join-back + scoring — with a stage-metrics listener
  * attributing executor run time, JVM GC time, shuffle bytes, and
  * memory/disk spill to each phase, plus block-size histograms for both
  * blocking keys (the quadratic-risk axis: candidate volume is
  * sum(block^2)/2, and the ScaleUp fixture multiplies every block by k).
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ProfileD39 /tmp/sf10"
  */
object ProfileD39 {

  private[tools] final class PhaseMetrics extends SparkListener {
    val runMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val shufRead = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    val peakExecMem = new AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        // a peak is combined with max, not sum (stage peaks are per-stage
        // highs of the same executor memory, so summing over-reports)
        peakExecMem.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
      }
    }
    def snapshotAndReset(): String = {
      val s = f"run=${runMs.get / 1000.0}%.1fs gc=${gcMs.get / 1000.0}%.1fs " +
        f"spillMem=${memSpill.get / 1e9}%.2fGB spillDisk=${diskSpill.get / 1e9}%.2fGB " +
        f"shufR=${shufRead.get / 1e9}%.2fGB shufW=${shufWrite.get / 1e9}%.2fGB " +
        f"peakExec=${peakExecMem.get / 1e9}%.2fGB"
      Seq(runMs, gcMs, memSpill, diskSpill, shufRead, shufWrite, peakExecMem)
        .foreach(_.set(0))
      s
    }
  }

  /** Drain the async listener bus so stage-completed events land in the
    * phase that ran them, not the next one. `listenerBus` is
    * private[spark], so reach it reflectively; if the internals move in
    * a future Spark, fall back to the old fixed sleep.
    */
  private[tools] def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").get.invoke(sc)
      val m = bus.getClass.getMethods
        .filter(m => m.getName == "waitUntilEmpty" && m.getParameterCount <= 1)
        .minBy(_.getParameterCount)
      if (m.getParameterCount == 0) m.invoke(bus)
      else m.invoke(bus, java.lang.Long.valueOf(30000L))
    } catch { case _: Throwable => Thread.sleep(500) }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)

    def phase(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      drainListenerBus(spark)
      println(f"PHASE $name%-22s wall=$wall%7.1fs rows=$rows%-12d ${metrics.snapshotAndReset()}")
    }

    // === the d39 pipeline, phase-bracketed (mirrors Dedup.scala d39) ===
    val f = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("lang"), col("n_chars"),
        lower(col("text")).as("lt"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        substring(col("lt"), 1, 60).as("prefix"),
        md5(encode(col("lt"), "UTF-8")).as("fp"),
        split(col("lt"), " ").getItem(0).as("w1"),
        substring(col("lt"), 1, 12).as("p12"))
      .persist()
    phase("feature-build")(f.count())

    def blockHistogram(name: String, keyCols: Seq[org.apache.spark.sql.Column]): Unit = {
      val sizes = f.groupBy(keyCols: _*).count()
      val agg = sizes.agg(
        count(lit(1)).as("blocks"), max("count").as("maxb"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs_uncapped"),
        sum(when(col("count") > Dedup.MaxBucket, 1).otherwise(0)).as("over_cap"),
        sum(when(col("count") <= Dedup.MaxBucket,
          col("count") * (col("count") - 1) / 2).otherwise(0)).as("pairs_capped"))
        .collect()(0)
      println(s"BLOCKS $name blocks=${agg.get(0)} max=${agg.get(1)} " +
        s"pairsUncapped=${agg.get(2)} overCap=${agg.get(3)} pairsAfterCap=${agg.get(4)}")
    }
    blockHistogram("p12 ", Seq(col("lang"), col("p12")))
    blockHistogram("len+w1", Seq(col("lang"), (col("n_chars") / 10).cast("long"), col("w1")))
    drainListenerBus(spark)
    metrics.snapshotAndReset() // histogram cost is not part of the query

    def pass(keyCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val slim = f.select(col("doc_id") +: keyCols: _*)
        .toDF(("doc_id" +: keyCols.indices.map(i => s"k$i")): _*)
      val capped = slim
        .withColumn("bsz", count(lit(1)).over(
          Window.partitionBy(keyCols.indices.map(i => col(s"k$i")): _*)))
        .where(col("bsz") <= Dedup.MaxBucket).drop("bsz")
      val a = capped.withColumnRenamed("doc_id", "doc_a")
      val b = capped.withColumnRenamed("doc_id", "doc_b")
      a.join(b, keyCols.indices.map(i => s"k$i"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }
    val p1 = pass(Seq(col("lang"), col("p12")))
    phase("pass1:lang+p12")(p1.count())
    val p2 = pass(Seq(col("lang"), (col("n_chars") / 10).cast("long"), col("w1")))
    phase("pass2:len+w1")(p2.count())
    val cand = p1.union(p2).distinct()
    phase("union-distinct")(cand.count())

    val fa = f.select(col("doc_id").as("doc_a"), col("prefix").as("pa"),
                      col("fp").as("fpa"), col("n_chars").as("na"), col("w1").as("wa"))
    val fb = f.select(col("doc_id").as("doc_b"), col("prefix").as("pb"),
                      col("fp").as("fpb"), col("n_chars").as("nb"), col("w1").as("wb"))
    // mirrors the registered query's single banded-DP evaluation (the
    // r14 fix this probe measured: the old when-chain shape paid the
    // unbanded DP up to 4x per pair after alias inlining — 179.7 vs
    // 120.5 s full-query wall at sf10 for the banding step alone)
    val levWeights = array(
      (Seq(0L) ++ Seq.fill(7)(30L) ++ Seq.fill(9)(15L)).map(lit): _*)
    val scored = cand.join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("lev", levenshtein(col("pa"), col("pb"), 15))
      .withColumn("score",
        when(col("fpa") === col("fpb"), 50L).otherwise(0L) +
        coalesce(element_at(levWeights, (col("lev") + 2).cast("int")), lit(0L)) +
        when(abs(col("na") - col("nb")) <= 10, 10L).otherwise(0L) +
        when(col("wa") === col("wb"), 10L).otherwise(0L))
      .where(col("score") >= 20)
    phase("joinback+score")(scored.count())

    // end-to-end as registered (fresh plan, includes the orderBy)
    f.unpersist()
    phase("full-query")(graft.SparkEntry.queries("d39_entity_resolution")(spark, sfDir).count())
    spark.stop()
  }
}

/** Same harness pointed at the dup-cluster family's shared pipeline
  * (VERDICT-r13-style follow-up: after the d39 fix, d34 is the 100x
  * sweep's heaviest query at 97.3 s in-sweep / 68.9 s isolated). Phases:
  * signature table, banded candidate pairs, exact-Jaccard verify, label
  * propagation, and the full registered d34 — so the next fix (if any)
  * is aimed at the measured stage, not a guess.
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ProfileD34 /tmp/sf10"
  */
object ProfileD34 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    def phase(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      println(f"PHASE $name%-22s wall=$wall%7.1fs rows=$rows%-12d ${metrics.snapshotAndReset()}")
    }

    val base = Dedup.portableSigTable(spark, sfDir).persist()
    phase("sig-table")(base.count())
    val cand = Dedup.portableCandidatePairs(base)
    phase("candidate-pairs")(cand.count())
    // minhashPortable persists its own signature table; the cache manager
    // dedupes it onto `base` (identical plan), so no double storage
    val verified = Dedup.minhashPortable(spark, sfDir, 0.5)
    phase("verify-jaccard")(verified.count())
    val pairs = verified.select("doc_a", "doc_b").persist()
    pairs.count(); ProfileD39.drainListenerBus(spark); metrics.snapshotAndReset()
    phase("label-prop")(Dedup.clusterLabels(pairs).count())
    pairs.unpersist(); base.unpersist()
    graft.ops.PipelineCache.release()
    phase("full-d34")(
      graft.SparkEntry.queries("d34_cluster_keep_best")(spark, sfDir).count())
    spark.stop()
  }
}
