package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler for the minhash pipeline stages. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    t("scan")(docs.count())
    t("split-only")(docs.select(size(split(col("text"), " ")).as("n")).agg(sum("n")).count())
    val sh = docs.withColumn("shingles", Dedup.shingles("text"))
    t("shingles")(sh.select(size(col("shingles"))).agg(sum("size(shingles)")).count())
    val hp = sh.withColumn("hpos", Dedup.shingleHashes("shingles"))
    t("hpos")(hp.select(size(col("hpos"))).agg(sum("size(hpos)")).count())
    val sig = hp.repartition(col("doc_id")).withColumn("sig", Dedup.minhashSignature("hpos"))
    t("sig")(sig.select(size(col("sig"))).agg(sum("size(sig)")).count())
    val banded = sig.repartition(col("doc_id"))
      .select(col("doc_id"), explode(Dedup.bandKeys("sig")).as("bk"))
    t("banded")(banded.count())
    t("full")(Dedup.minhashNearDups(spark, sfDir, 0.5).count())
    spark.stop()
  }
}

object ProfileDedup2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val sig = docs.withColumn("shingles", Dedup.shingles("text"))
      .withColumn("hpos", Dedup.shingleHashes("shingles"))
      .repartition(col("doc_id"))
      .withColumn("sig", Dedup.minhashSignature("hpos"))
      .repartition(col("doc_id"))
    val banded = sig.select(col("doc_id"), explode(Dedup.bandKeys("sig")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    banded.groupBy("band", "bh").count().orderBy(col("count").desc).show(10)
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band", "bh")).where(col("doc_a") < col("doc_b"))
    println("candidates pre-distinct: " + cand.count())
    println("candidates distinct: " + cand.select("doc_a", "doc_b").distinct().count())
    spark.stop()
  }
}

object ProfileDedup3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    val base = docs.withColumn("shingles", Dedup.shingles("text"))
      .withColumn("hpos", Dedup.shingleHashes("shingles"))
      .repartition(col("doc_id"))
      .withColumn("sig", Dedup.minhashSignature("hpos"))
      .repartition(col("doc_id"))
    val banded = base.select(col("doc_id"), explode(Dedup.bandKeys("sig")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    val pairs = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("bh"), col("doc_id").as("doc_b")), Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    t("pairs")(pairs.count())
    val sh = base.select(col("doc_id"), col("shingles"))
    val joined = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
    t("joinback")(joined.count())
    t("jaccard")(joined.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.5).count())
    spark.stop()
  }
}
