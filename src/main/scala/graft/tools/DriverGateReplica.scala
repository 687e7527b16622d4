package graft.tools

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry
import graft.ops.PipelineCache

/** Replica of the round driver's correctness gate, built to catch (or
  * rule out) the `s18_corrupt_records` flake: the driver's artifact
  * flagged it hash-false in rounds 4 AND 5 while every isolated check —
  * three scales, x3 at local[32], the full 180-query Verify — passed.
  *
  * Per iteration this runs the EXACT driver shape: one long-lived
  * SparkSession, every registered query written to parquet via
  * coalesce(1) in registry order, same configs as graft.Verify. After
  * each sweep it (a) reads the target query's parquet back and hashes it
  * the way tools/check_oracle.py does (columns sorted by name, rows
  * sorted, values formatted), (b) re-runs the target fresh, and
  * (c) compares both against the first iteration's hash. Any divergence
  * prints MISMATCH with both hashes and exits non-zero.
  *
  * Usage: runMain graft.tools.DriverGateReplica <sfDir> [iters] [target]
  * (SPARK_GRAFT_CPUS controls local[N]; the driver uses 32.)
  */
object DriverGateReplica {

  /** check_oracle.py-equivalent canonical hash: columns sorted by name,
    * each value rendered null-safely, rows sorted lexicographically.
    */
  def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => (0 until r.length).map { i =>
        val v = r.get(i)
        if (v == null) "NULL" else v match {
          case d: java.lang.Double => f"$d%.9e"
          case f: java.lang.Float  => f"${f.toDouble}%.9e"
          case other               => other.toString
        }
      }.mkString(""))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update((r + "").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 20
    val target = if (args.length > 2) args(2) else "s18_corrupt_records"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Files.createTempDirectory("gate_replica").toString
    var baseline: Option[String] = None
    var mismatches = 0
    for (it <- 1 to iters) {
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[replica] $name failed: ${e.getMessage}")
        } finally {
          PipelineCache.release()
          spark.sharedState.cacheManager.clearCache()
        }
      }
      val sweepSecs = (System.nanoTime() - t0) / 1e9
      val inSweep = canonicalHash(spark.read.parquet(s"$outDir/$target"))
      val fresh = canonicalHash(SparkEntry.queries(target)(spark, sfDir))
      PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
      val base = baseline.getOrElse { baseline = Some(inSweep); inSweep }
      val ok = inSweep == base && fresh == base
      if (!ok) mismatches += 1
      println(f"[replica] iter $it%2d/$iters sweep=${sweepSecs}%.1fs " +
        s"$target in-sweep=$inSweep fresh=$fresh " +
        (if (ok) "OK" else s"MISMATCH (baseline=$base)"))
    }
    println(
      if (mismatches == 0)
        s"[replica] STABLE: $iters full-sweep iterations at local[$cpus], " +
          s"$target hash identical in-sweep and fresh every time"
      else s"[replica] FLAKE CAUGHT: $mismatches/$iters iterations diverged")
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
