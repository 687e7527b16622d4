package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from an existing fixture by
  * unioning K key-shifted copies of each fact table (referential
  * integrity preserved: both sides of every FK shift by the same offset,
  * so join fan-outs and key distributions scale linearly instead of
  * collapsing under duplicate keys). Dimension tables (region, nation)
  * are copied once, as a real TPC-H scale-up would.
  *
  * Purpose: the two-point scaling probe — run Bench at sf0.1 and at the
  * synthesized 10x and compare per-query ratios. A query whose time
  * scales ~linearly (or better, for bounded-output shapes) survives the
  * scale-up; super-linear growth flags a plan that would not.
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10
  */
object ScaleUp {

  /** Key columns to shift per table; both sides of each FK listed. */
  val shiftCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Seq.empty,
    "nation" -> Seq.empty)

  def main(args: Array[String]): Unit = {
    val Array(src, dst, kStr) = args.take(3)
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    shiftCols.foreach { case (table, keys) =>
      val df = spark.read.parquet(s"$src/$table.parquet")
      val out =
        if (keys.isEmpty) df
        else {
          // copy i shifts every key by i * (max+1), in the key's own type
          // so the written schema matches the source fixture's exactly
          val offs: Map[String, Long] = keys.map { c =>
            c -> (df.agg(max(col(c))).head.getAs[Number](0).longValue() + 1L)
          }.toMap
          (0 until k).map { i =>
            keys.foldLeft(df) { (d, c) =>
              d.withColumn(c,
                (col(c) + lit(i * offs(c)).cast(df.schema(c).dataType))
                  .cast(df.schema(c).dataType))
            }
          }.reduce(_ union _)
        }
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[scaleup] $table: ${if (keys.isEmpty) "1x dim" else s"${k}x"} written")
    }
    spark.stop()
  }
}
