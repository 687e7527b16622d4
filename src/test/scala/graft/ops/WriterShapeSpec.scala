package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Output-layout discipline for the write side: at scale, HOW data lands
  * (file count, range clustering, partition dirs) decides every later
  * read's pruning. Asserted here: repartitionByRange produces the exact
  * requested file count with globally DISJOINT key ranges per file
  * (range-clustered layout -> later range predicates prune whole files
  * via parquet min/max), and partitionBy produces one directory per key
  * usable for partition pruning.
  */
class WriterShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("repartitionByRange: requested file count, disjoint per-file key ranges") {
    val out = java.nio.file.Files.createTempDirectory("rbr").toString + "/orders"
    spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .write.parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 range files, got ${files.length}")
    // per-file [min, max] of the range key must not overlap across files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: hi=$hi lo2=$lo2")
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet").count())
  }

  test("partitionBy: one directory per key, scans prune to the predicate") {
    val out = java.nio.file.Files.createTempDirectory("pby").toString + "/li"
    spark.read.parquet(s"${SparkTestBase.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.partitionBy("l_returnflag").parquet(out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("l_returnflag=")).map(_.getName).sorted
    assert(dirs.length >= 2 && dirs.forall(_.startsWith("l_returnflag=")))
    // a partition-key predicate reads only its directory (partition pruning)
    val df = spark.read.parquet(out).where(col("l_returnflag") === "R")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("l_returnflag"),
      s"partition filter did not reach the scan:\n$scan")
  }
}
