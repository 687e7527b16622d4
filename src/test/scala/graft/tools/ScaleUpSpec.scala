package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The scaling-probe generator must preserve the properties the probe
  * relies on: row counts multiply by K, keys stay unique (no collisions
  * between shifted copies), and referential integrity holds so join
  * fan-outs scale linearly instead of collapsing or exploding.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("2x scale-up: counts double, keys stay unique, FK joins scale linearly") {
    val dst = java.nio.file.Files.createTempDirectory("scaleup").toString
    // run the tool's core loop inline (same code path as the main)
    ScaleUp.shiftCols.foreach { case (table, keys) =>
      val df = spark.read.parquet(s"${SparkTestBase.Sf0001}/$table.parquet")
      val out =
        if (keys.isEmpty) df
        else {
          val offs: Map[String, Long] = keys.map { c =>
            c -> (df.agg(max(col(c))).head.getAs[Number](0).longValue() + 1L)
          }.toMap
          (0 until 2).map { i =>
            keys.foldLeft(df) { (d, c) =>
              d.withColumn(c,
                (col(c) + lit(i * offs(c)).cast(df.schema(c).dataType))
                  .cast(df.schema(c).dataType))
            }
          }.reduce(_ union _)
        }
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }

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
}
