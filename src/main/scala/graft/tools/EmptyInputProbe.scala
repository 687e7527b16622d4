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
    val n = args.lift(1).map(_.toInt).getOrElse(0)
    val dst = java.nio.file.Files.createTempDirectory("graft_empty").toString
    writeTruncatedFixture(spark, src, dst, n)
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
