package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The scaling-probe generator must preserve the properties the probe
  * relies on: row counts multiply by K, keys stay unique (no collisions
  * between shifted copies), and referential integrity holds so join
  * fan-outs scale linearly instead of collapsing or exploding — including
  * across FKs whose two sides have DIFFERENT observed maxes (the
  * documents-embeddings doc_id=vec_id join, where embeddings covers only
  * a prefix of the doc_id space).
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("2x scale-up: counts double, keys stay unique, FK joins scale linearly") {
    val dst = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.run(spark, SparkTestBase.Sf0001, dst, 2)

    val o0 = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
    val l0 = spark.read.parquet(s"${SparkTestBase.Sf0001}/lineitem.parquet")
    val o2 = spark.read.parquet(s"$dst/orders.parquet")
    val l2 = spark.read.parquet(s"$dst/lineitem.parquet")

    assert(o2.count() == 2 * o0.count())
    assert(l2.count() == 2 * l0.count())
    // keys unique after shifting (no collision between copies)
    assert(o2.select("o_orderkey").distinct().count() == o2.count())
    // FK integrity: the orders-lineitem join fans out exactly 2x
    val j0 = l0.join(o0, l0("l_orderkey") === o0("o_orderkey")).count()
    val j2 = l2.join(o2, l2("l_orderkey") === o2("o_orderkey")).count()
    assert(j2 == 2 * j0, s"join rows $j2 != 2 * $j0 — FK shift broke integrity")
    // dims copied once, not replicated
    assert(spark.read.parquet(s"$dst/nation.parquet").count() ==
      spark.read.parquet(s"${SparkTestBase.Sf0001}/nation.parquet").count())
  }

  test("cross-table key domain: documents-embeddings join survives the shift") {
    // The sf0.1 fixture has doc_id max 4999 but vec_id max 1999 — the
    // shape that breaks per-table offsets. Reproduce it cheaply: copy the
    // small fixture but truncate embeddings so the two maxes differ.
    val src = java.nio.file.Files.createTempDirectory("scaleup_src").toString
    ScaleUp.shiftCols.keys.foreach { t =>
      val df = spark.read.parquet(s"${SparkTestBase.Sf0001}/$t.parquet")
      val out = if (t == "embeddings") df.where(col("vec_id") < 250) else df
      out.write.mode("overwrite").parquet(s"$src/$t.parquet")
    }
    val dst = java.nio.file.Files.createTempDirectory("scaleup_dom").toString
    ScaleUp.run(spark, src, dst, 2)

    val d0 = spark.read.parquet(s"$src/documents.parquet")
    val e0 = spark.read.parquet(s"$src/embeddings.parquet")
    val d2 = spark.read.parquet(s"$dst/documents.parquet")
    val e2 = spark.read.parquet(s"$dst/embeddings.parquet")

    // precondition that makes this test meaningful: the maxes DIFFER
    val dMax = d0.agg(max("doc_id")).head.getLong(0)
    val eMax = e0.agg(max("vec_id")).head.getLong(0)
    assert(dMax != eMax, "fixture no longer has asymmetric key maxes; pick another FK")

    // the cross-modal join fans out exactly 2x: every shifted embedding
    // still finds its shifted document
    val j0 = d0.join(e0, d0("doc_id") === e0("vec_id")).count()
    val j2 = d2.join(e2, d2("doc_id") === e2("vec_id")).count()
    assert(j0 > 0)
    assert(j2 == 2 * j0, s"cross-modal join rows $j2 != 2 * $j0 — per-table offsets scrambled the FK")
    // both sides shifted by the SAME domain offset
    assert(e2.agg(max("vec_id")).head.getLong(0) <= d2.agg(max("doc_id")).head.getLong(0))
  }
}
