package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run every registered query against a schema-correct but
  * EMPTY fixture directory. At 100 TB, empty inputs are routine (a
  * filter that matches nothing, an empty partition, a new tenant); an
  * operator that crashes on them — a head() on an empty frame, a
  * division by a zero count, an iterative loop that never initializes —
  * is a production incident the sf-scaled oracles can never catch.
  * EmptyInputSpec pins the result.
  */
object EmptyInputProbe {

  val Tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Write limit(n) copies of every fixture table (raw read, so the
    * physical schema — including events' NTZ drift — is preserved).
    * n = 0 is the empty-fixture case; n = 1 is the degenerate-statistics
    * case (zero variance, a single group, no pairs).
    */
  def writeTruncatedFixture(spark: SparkSession, srcDir: String, dstDir: String,
                            n: Int): Unit =
    Tables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .limit(n).coalesce(1)
        .write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
    }

  def writeEmptyFixture(spark: SparkSession, srcDir: String, dstDir: String): Unit =
    writeTruncatedFixture(spark, srcDir, dstDir, 0)

  /** Keep each table's leading id column on a handful of rows and NULL
    * every other column (all fixture columns are declared nullable, so a
    * total engine must not crash on them — null text, null timestamps,
    * null embeddings are routine in scraped corpora).
    */
  def writeNulledFixture(spark: SparkSession, srcDir: String, dstDir: String): Unit =
    Tables.foreach { t =>
      import org.apache.spark.sql.functions.{col, lit}
      val df = spark.read.parquet(s"$srcDir/$t.parquet").limit(5)
      val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
        if (i == 0) col(f.name) else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(cols.toSeq: _*).coalesce(1)
        .write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = args.lift(1).getOrElse("0")
    val dst = java.nio.file.Files.createTempDirectory("graft_empty").toString
    if (mode == "null") writeNulledFixture(spark, src, dst)
    else writeTruncatedFixture(spark, src, dst, mode.toInt)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dst).collect().length
        println(s"EMPTYPROBE ok $name rows=$n")
      } catch { case e: Throwable =>
        println(s"EMPTYPROBE FAIL $name ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
      }
      graft.ops.PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
