package graft.tools

/** Dev audit: per-query final-plan file-scan and cache-read counts.
  * Queries with many parquet scans and no cache reads are re-executing
  * a shared branch — the d43/d48 bug class. AQE plans print initial +
  * final; only the final section is counted.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset (same contract as Bench/Verify's SPARK_GRAFT_ONLY).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        require(names.nonEmpty,
          "SPARK_GRAFT_ONLY is set but names no queries (empty/whitespace value) — " +
            "unset it to audit the full surface or pass comma-separated query names")
        val unknown = names -- graft.SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")
        graft.SparkEntry.queries.view.filterKeys(names).toMap
      case None => graft.SparkEntry.queries
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        val scans = "Scan parquet".r.findAllIn(plan).length
        val cached = "InMemoryTableScan".r.findAllIn(plan).length
        val rdd = "Scan ExistingRDD".r.findAllIn(plan).length
        if (scans >= 4 && cached == 0)
          println(s"SCANAUDIT SUSPECT $name scans=$scans cached=$cached rdd=$rdd")
        else
          println(s"SCANAUDIT ok $name scans=$scans cached=$cached rdd=$rdd")
      } catch { case e: Exception =>
        println(s"SCANAUDIT ERROR $name ${e.getClass.getSimpleName}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
