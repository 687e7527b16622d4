package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Interleaved A/B for a d39 one-DP-per-pair experiment (r15): today the
  * score>=20 predicate inlines into the join condition (1st banded-DP
  * site, all 60.9M candidate pairs) and the output projection evaluates
  * `lev` again (2nd site, the 46.6M survivors) — ~107M DPs for 60.9M
  * pairs. Variant B inserts a non-deterministic barrier column
  * (monotonically_increasing_id) between the score projection and the
  * filter: PushPredicateThroughNonJoin only pushes through fully
  * deterministic projections, so the filter stays ABOVE and reads the
  * materialized score — ONE DP per pair. The trade: the join emits all
  * pairs through the projection before filtering (no early prune).
  *
  * Result equality is checked with an order-independent checksum
  * (sum of xxhash64 over the output columns) plus exact row counts.
  *
  *   sbt "runMain graft.tools.D39BarrierAB /tmp/sf10 3"
  */
object D39BarrierAB {

  private def features(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
        col("doc_id"), col("lang"), col("n_chars"),
        lower(col("text")).as("lt"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        substring(col("lt"), 1, 60).as("prefix"),
        md5(encode(col("lt"), "UTF-8")).as("fp"),
        split(col("lt"), " ").getItem(0).as("w1"),
        substring(col("lt"), 1, 12).as("p12"))

  private def candidates(f: DataFrame): DataFrame = {
    def pass(keyCols: Seq[Column]): DataFrame = {
      val slim = f.select(col("doc_id") +: keyCols: _*)
        .toDF(("doc_id" +: keyCols.indices.map(i => s"k$i")): _*)
      val capped = slim
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(
            keyCols.indices.map(i => col(s"k$i")): _*)))
        .where(col("bsz") <= Dedup.MaxBucket).drop("bsz")
      val a = capped.withColumnRenamed("doc_id", "doc_a")
      val b = capped.withColumnRenamed("doc_id", "doc_b")
      a.join(b, keyCols.indices.map(i => s"k$i"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }
    pass(Seq(col("lang"), col("p12")))
      .union(pass(Seq(col("lang"), (col("n_chars") / 10).cast("long"), col("w1"))))
      .distinct()
  }

  private def scored(f: DataFrame, barrier: Boolean): DataFrame = {
    val cand = candidates(f)
    val fa = f.select(col("doc_id").as("doc_a"), col("prefix").as("pa"),
                      col("fp").as("fpa"), col("n_chars").as("na"), col("w1").as("wa"))
    val fb = f.select(col("doc_id").as("doc_b"), col("prefix").as("pb"),
                      col("fp").as("fpb"), col("n_chars").as("nb"), col("w1").as("wb"))
    val levWeights = array(
      (Seq(0L) ++ Seq.fill(7)(30L) ++ Seq.fill(9)(15L)).map(lit): _*)
    val base = cand.join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("lev", levenshtein(col("pa"), col("pb"), 15))
      .withColumn("score",
        when(col("fpa") === col("fpb"), 50L).otherwise(0L) +
        coalesce(element_at(levWeights, (col("lev") + 2).cast("int")), lit(0L)) +
        when(abs(col("na") - col("nb")) <= 10, 10L).otherwise(0L) +
        when(col("wa") === col("wb"), 10L).otherwise(0L))
    val gated =
      if (barrier) base.withColumn("_bar", monotonically_increasing_id())
        .where(col("score") >= 20).drop("_bar")
      else base.where(col("score") >= 20)
    gated
      .withColumn("verdict",
        when(col("score") >= 40, "match").otherwise("possible"))
      .select("doc_a", "doc_b", "score", "verdict")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new ProfileD39.PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)

    var sums = Map.empty[String, (Long, java.math.BigDecimal)]
    def run(tag: String, barrier: Boolean): Unit = {
      val f = features(spark, sfDir).persist()
      val t0 = System.nanoTime()
      val row = scored(f, barrier)
        .agg(count(lit(1)).as("n"),
             sum(xxhash64(col("doc_a"), col("doc_b"), col("score"), col("verdict"))
               .cast("decimal(38,0)")).as("h"))
        .collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      ProfileD39.drainListenerBus(spark)
      sums += tag -> (row.getLong(0), row.getDecimal(1))
      println(f"AB $tag wall=$wall%6.1fs rows=${row.getLong(0)} ${metrics.snapshotAndReset()}")
      f.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }

    for (r <- 1 to rounds) {
      println(s"--- round $r ---")
      run("A", barrier = false)
      run("B", barrier = true)
      require(sums("A") == sums("B"),
        s"A/B mismatch: A=${sums("A")} B=${sums("B")}")
      println("count+checksum identical: ok")
    }
    spark.stop()
  }
}
