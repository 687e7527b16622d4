package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the reference query's per-run wall ms on a freshly-forked JVM,
  * N successive runs — the descent shape the warm-up stop rule has to
  * survive. The r11 close's before/after read 260.6/154.4 ms (pure JIT
  * warm-up masking up to ~1.7x of mid-sweep host slowdown); the first
  * consecutive-agreement stop rule still read 232/159 because C2
  * compiles in tiers and the staircase plateaus between drops. Run this
  * after any change to Bench.refQueryMs/warmedMinMs to see what the
  * rule is actually stopping on.
  */
object RefWarmProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_refwarm")
    val path = dir.resolve("ref.parquet").toString
    try {
      graft.Bench.writeRefFixture(spark, path)
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        graft.Bench.refQueryDf(spark, path).collect()
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"REFWARM run=$i%2d ms=$ms%.1f")
        ms
      }
      println(f"REFWARM min=${times.min}%.1f last5min=${times.takeRight(5).min}%.1f")
    } finally {
      spark.stop()
      try { // best-effort fixture cleanup, same pattern as Bench's refDir
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
          st.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
        }
      } catch { case _: Exception => () }
    }
  }
}
