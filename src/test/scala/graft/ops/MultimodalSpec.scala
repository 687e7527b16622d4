package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("typed mapPartitions decode is executor-side, deterministic, and complete") {
    val out = Multimodal.decodeFeatures(spark, SparkTestBase.Sf0001).collect()
    val docs = graft.core.Tables.documents(spark, SparkTestBase.Sf0001).count()
    assert(out.length == docs)
    // byte stats must match an independent driver-side computation
    val texts = graft.core.Tables.documents(spark, SparkTestBase.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(50).foreach { f =>
      val bytes = texts(f.doc_id).getBytes("UTF-8")
      assert(f.n_bytes == bytes.length)
      assert(math.abs(f.mean_byte - bytes.map(_ & 0xff).sum.toDouble / bytes.length) < 1e-12)
      assert(f.n_frames == math.min(8L, bytes.length / 64 + 1))
    }
  }

  test("binary payload survives transforms untouched (opaque column contract)") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Tables.documents(spark, SparkTestBase.Sf0001)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .where(col("n_chars") > 100) // unrelated filter must not disturb payload
      .select(col("doc_id"), col("payload"), md5(col("payload")).as("sum1"))
      .withColumn("sum2", md5(col("payload")))
    assert(df.where(col("sum1") =!= col("sum2")).count() == 0)
  }
}
