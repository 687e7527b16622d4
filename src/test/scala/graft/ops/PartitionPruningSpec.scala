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

  test("DYNAMIC partition pruning: a runtime dim-side filter prunes fact partitions") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.core.Tables.events(spark, SparkTestBase.Sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/ev")
    val root = new java.io.File(s"$out/ev")
    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    val partDirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    val totalFiles = partDirs.map(parquetFiles).sum
    val wantedFiles = partDirs
      .filter(d => d.getName == "event_type=purchase" || d.getName == "event_type=click")
      .map(parquetFiles).sum

    // the partition filter is NOT in the query text — it only exists in
    // the dim table's rows, so pruning must happen at RUNTIME from the
    // broadcast side (fixture stats are tiny, so disable the stats-based
    // benefit estimate for the duration of the test)
    val prevStats = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      // DPP inserts the runtime filter only when the dim side carries a
      // SELECTIVE predicate (a Filter node). A local relation won't do —
      // ConvertToLocalRelation folds the filter into the rows before the
      // PartitionPruning rule runs — so the dim is a parquet table whose
      // filter survives to optimization. The wanted types never appear
      // in the fact query text.
      Seq(("purchase", 1), ("click", 1), ("view", 0), ("signup", 0), ("error", 0))
        .toDF("wanted_type", "flag")
        .write.mode("overwrite").parquet(s"$out/dim")
      val dim = spark.read.parquet(s"$out/dim").where(col("flag") === 1)
      val fact = spark.read.parquet(s"$out/ev")
      val j = fact.join(dim, fact("event_type") === dim("wanted_type"))
        .groupBy("event_type").count()
      j.collect()
      val finalPlan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // AQE leaves are materialized QueryStageExec trees — descend into them
      def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p.collect {
          case f: FileSourceScanExec => Seq(f)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
        }.flatten
      val scan = allScans(finalPlan)
        .find(_.toString.contains("event_type"))
        .getOrElse(fail(s"no fact FileSourceScanExec in:\n$finalPlan"))
      assert(scan.toString.contains("dynamicpruning"),
        s"expected a dynamicpruning expression in the fact scan's PartitionFilters:\n$scan")
      assert(scan.metrics("numFiles").value == wantedFiles,
        s"DPP read ${scan.metrics("numFiles").value} files, expected only the " +
          s"$wantedFiles in the two wanted partitions (of $totalFiles total)")
    } finally {
      prevStats match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
        case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      }
    }
  }

  test("runtime bloom-filter join: the build-side filter reaches the fact scan as might_contain") {
    // the row-level counterpart of DPP: for a SHUFFLE join with a
    // filtered build side, Spark injects a bloom filter of the build
    // keys into the probe side's scan stage, so most non-matching fact
    // rows die before the exchange. The fixture is far below the 10 GB
    // application-side default, so that threshold is lowered for the
    // test — at 100 TB the defaults fire on their own.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val out = java.nio.file.Files.createTempDirectory("graft_bloom").toString
      graft.core.Tables.lineitem(spark, SparkTestBase.Sf0001).write.parquet(s"$out/li")
      graft.core.Tables.orders(spark, SparkTestBase.Sf0001).write.parquet(s"$out/o")
      val li = spark.read.parquet(s"$out/li")
      val o = spark.read.parquet(s"$out/o").where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey")).groupBy().count()
      val withBloom = j.collect()(0).getLong(0)
      assert(j.queryExecution.executedPlan.toString.contains("might_contain"),
        s"expected a runtime bloom probe in the fact side:\n${j.queryExecution.executedPlan}")
      // the bloom is a pure pre-filter: result identical with it disabled
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy().count().collect()(0).getLong(0)
      assert(withBloom == plain && withBloom > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
