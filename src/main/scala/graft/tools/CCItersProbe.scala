package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-only probe: how many min-label supersteps does the CC core
  * (graft.ops.Dedup.clusterLabels) actually run to fixpoint on the
  * verified near-dup pair graph, and what is the per-iteration label
  * movement? The answer decides whether a shortcutting variant
  * (label-of-label halving, O(log d) rounds) can pay: with measured
  * diameters of 2-3 the loop is already at its floor and the extra
  * V-row join per superstep is pure loss.
  *
  * Replicates the registered loop's superstep semantics exactly
  * (symmetrized edges + self-loops, next(src) = min over neighbors of
  * label(dst), sum-stable convergence) without the checkpoint-block
  * machinery — this is a measurement probe, not a timed A/B.
  *
  *   runMain graft.tools.CCItersProbe <sfDir>
  */
object CCItersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val pairs = graft.ops.Dedup.minhashPortablePairs(spark, sfDir, 0.5).persist()
    val nPairs = pairs.count()
    graft.ops.PipelineCache.release()

    val sym = graft.ops.Edges.symmetrize(pairs, col("doc_a"), col("doc_b"))
    val ids = sym.select(col("src").as("id")).distinct()
    val edges = sym.union(ids.select(col("id").as("src"), col("id").as("dst")))
      .repartition(col("dst")).sortWithinPartitions("dst").persist()
    val nEdges = edges.count()
    val nVerts = ids.count()
    println(s"graph: $nPairs pairs, $nVerts vertices, $nEdges directed edges (incl self-loops)")

    var labels = ids.withColumn("label", col("id")).localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var prevMoved = -1L
    var iter = 0
    var done = false
    while (!done && iter < 25) {
      val next = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("label"))
        .localCheckpoint(true)
      val row = next.agg(
        sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        sum(when(col("label") =!= col("id"), 1L).otherwise(0L))).collect()(0)
      val s = Option(row.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
      val nonSelf = if (row.isNullAt(1)) 0L else row.getLong(1)
      done = prevSum != null && s.compareTo(prevSum) == 0
      println(f"iter ${iter + 1}%2d: labelSum=$s nonSelfLabels=$nonSelf changed=${!done}")
      prevSum = s; prevMoved = nonSelf; iter += 1
      labels = next
    }
    println(s"converged after $iter supersteps (last one confirms fixpoint)")
    spark.stop()
  }
}
