package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Planning-time partition pruning over a hive-partitioned layout — the
  * mechanism behind s10_partitioned_scan. At 100 TB the partitioned
  * directory layout is what turns an equality predicate into "never list
  * the other 99% of files", so the guard asserts the pruning actually
  * happened (files read == files in the one matching directory), not
  * just that the filter string appears somewhere in the plan.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("equality predicate on the partition column prunes to one directory") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.core.Tables.events(spark, SparkTestBase.Sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/ev")

    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    val root = new java.io.File(s"$out/ev")
    val partDirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    val totalFiles = partDirs.map(parquetFiles).sum
    val purchaseFiles = partDirs.filter(_.getName == "event_type=purchase").map(parquetFiles).sum
    assert(partDirs.length >= 3, "fixture should produce several partition directories")
    assert(purchaseFiles > 0 && purchaseFiles < totalFiles)

    val df = spark.read.parquet(s"$out/ev").where(col("event_type") === "purchase")
    assert(df.count() > 0)
    df.collect()

    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = finalPlan.collect { case f: FileSourceScanExec => f }.headOption
      .getOrElse(fail(s"no FileSourceScanExec in:\n$finalPlan"))
    val planStr = scan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("event_type"),
      s"partition filter missing from scan:\n$planStr")
    assert(scan.metrics("numFiles").value == purchaseFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected only the $purchaseFiles in event_type=purchase (of $totalFiles total)")
  }
}
