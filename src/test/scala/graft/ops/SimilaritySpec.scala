package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Scala-side exact reference: quantized cosine, same math as the op. */
  private def refCosine(a: Array[Float], b: Array[Float]): Double = {
    // round half away from zero, like Spark/DuckDB round()
    def q(x: Float): Long = {
      val v = x.toDouble * 10000
      if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong
    }
    val dot = a.zip(b).map { case (x, y) => q(x) * q(y) }.sum
    val na = a.map(x => q(x) * q(x)).sum
    val nb = b.map(x => q(x) * q(x)).sum
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    graft.core.Tables.embeddings(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
      .toMap

  test("brute-force top-k matches an independent Scala computation") {
    val got = Similarity.cosineTopK(spark, SparkTestBase.Sf0001, nProbes = 3, k = 5).collect()
    (0L until 3L).foreach { q =>
      val expect = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, refCosine(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      val mine = got.filter(_.getAs[Long]("query_id") == q)
        .sortBy(_.getAs[Long]("rnk"))
        .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
      assert(mine.toSeq == expect, s"query $q top-5 mismatch")
    }
  }

  test("LSH ANN returns only same-bucket candidates, ranked consistently") {
    val got = Similarity.annLsh(spark, SparkTestBase.Sf0001, nProbes = 10, k = 3).collect()
    // sims must match the exact reference computation for each pair
    got.foreach { r =>
      val s = refCosine(vecs(r.getAs[Long]("query_id")), vecs(r.getAs[Long]("neighbor_id")))
      assert(math.abs(s - r.getAs[Double]("sim")) < 1e-12)
    }
    // ranks are 1..k without gaps per query
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks == (1L to rnks.size))
    }
  }

  test("IVF ANN: exact sims, and recall@3 at least matches the LSH variant") {
    def topk(rows: Array[Row], k: Int): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
        q -> rs.filter(_.getAs[Long]("rnk") <= k).map(_.getAs[Long]("neighbor_id")).toSet
      }
    val exact = topk(
      Similarity.cosineTopK(spark, SparkTestBase.Sf0001, nProbes = 10, k = 3).collect(), 3)
    val ivf = Similarity.annIvf(spark, SparkTestBase.Sf0001, nProbes = 10, k = 3).collect()
    val lsh = Similarity.annLsh(spark, SparkTestBase.Sf0001, nProbes = 10, k = 3).collect()
    // re-ranked sims must be the exact quantized cosine
    ivf.foreach { r =>
      val s = refCosine(vecs(r.getAs[Long]("query_id")), vecs(r.getAs[Long]("neighbor_id")))
      assert(math.abs(s - r.getAs[Double]("sim")) < 1e-12)
    }
    def recall(ann: Array[Row]): Double = {
      val byQ = topk(ann, 3)
      val scores = exact.toSeq.map { case (q, ex) =>
        byQ.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      scores.sum / scores.size
    }
    val (rIvf, rLsh) = (recall(ivf), recall(lsh))
    info(s"recall@3: ivf=$rIvf lsh=$rLsh")
    assert(rIvf >= rLsh, s"IVF recall $rIvf below LSH recall $rLsh")
    assert(rIvf > 0.0)
  }

  test("PQ ANN: ADC top-5 recovers a usable fraction of the exact-L2 top-5") {
    val pq = graft.SparkEntry.queries("v10_pq_ann")(spark, SparkTestBase.Sf0001)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    // exact L2 top-5 over the same quantized integer space, Scala-side
    def q(x: Float): Long = {
      val v = x.toDouble * 10000
      if (v >= 0) (v + 0.5).toLong else (v - 0.5).toLong
    }
    val qvecs = vecs.map { case (id, v) => id -> v.map(q) }
    val exact = (0L until 10L).map { probe =>
      val pv = qvecs(probe)
      probe -> qvecs.toSeq.filter(_._1 != probe)
        .map { case (id, v) =>
          (id, v.zip(pv).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap
    val scores = exact.toSeq.map { case (probe, ex) =>
      pq.getOrElse(probe, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val recall = scores.sum / scores.size
    info(f"PQ recall@5 vs exact L2: $recall%.2f")
    // uniform random vectors are PQ's worst case; the Lloyd-refined
    // 16-codeword book still must beat noise decisively
    assert(recall >= 0.2, f"PQ recall@5 $recall%.2f below floor")
  }

  test("coarse two-level assignment: full probe is EXACT, partial probe stays useful") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.embeddings(spark, SparkTestBase.Sf0001)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.ivfCentroids(e, nCells = 16, iters = 2)
    val exact = Similarity.assignCells(e, cents).select("vec_id", "cell")
    val n = e.count()

    // probing ALL sqrt(C)=4 super-cells exposes every centroid, so the
    // coarse path must reproduce exact assignment bit-for-bit (same
    // max_by tie-break): the approximation comes ONLY from unprobed
    // pivots, never from the re-rank
    val full = Similarity.assignCellsCoarse(e, cents, nProbe = 4).select("vec_id", "cell")
    assert(full.count() == n, "every vector must be assigned exactly once")
    assert(exact.join(full, Seq("vec_id", "cell")).count() == n,
      "full-probe coarse assignment must equal exact assignment")

    // the default probe-2 config checks ~half the centroids; on the
    // near-random fixture (worst case — no cluster structure to exploit)
    // it still agrees with exact on a solid majority (measured 0.74)
    val p2 = Similarity.assignCellsCoarse(e, cents, nProbe = 2).select("vec_id", "cell")
    assert(p2.count() == n, "every vector must be assigned exactly once")
    val agree = exact.join(p2, Seq("vec_id", "cell")).count()
    assert(agree.toDouble / n >= 0.6,
      s"probe-2 agreement ${agree.toDouble / n} collapsed below the measured floor")
  }

  test("qdot_long/qnorm2 codegen expressions equal the HOF formulation on every fixture vector") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val e = graft.core.Tables.embeddings(spark, SparkTestBase.Sf0001)
      .select(col("vec_id"), col("embedding"))
      // integer "centroid": quantize the vector itself (same shape the
      // IVF path feeds qdot_long — array<float> against array<bigint>)
      .withColumn("cent", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))"))
    val hofDot = expr(
      """aggregate(zip_with(embedding, cent,
           (x, c) -> cast(round(cast(x as double) * 10000) as bigint) * c),
         cast(0 as bigint), (acc, v) -> acc + v)""")
    val hofN2 = expr(
      """aggregate(transform(embedding,
           x -> cast(round(cast(x as double) * 10000) as bigint) *
                cast(round(cast(x as double) * 10000) as bigint)),
         cast(0 as bigint), (acc, v) -> acc + v)""")
    val bad = e.select(
        call_function("qdot_long", col("embedding"), col("cent")).as("ed"),
        hofDot.as("hd"),
        call_function("qnorm2", col("embedding")).as("en"),
        hofN2.as("hn"))
      .where(col("ed") =!= col("hd") || col("en") =!= col("hn"))
    assert(bad.isEmpty, "codegen expressions diverged from the HOF math")
  }

  test("adaptive band width switches at the measured 12.8k-vector knee") {
    // The knee is MEASURED, not arbitrary (DedupScaleProbe: at 50k
    // vectors 8-bit bands emit 448 candidates/vector — quadratic regime —
    // vs 3.3 for 16-bit; at the salted 100x corpus the 16-bit choice is
    // 2.5M candidates/1.4s vs 187M/45s). d22's judged path AND its
    // oracle's size-guarded union both dispatch on this function, so a
    // drive-by edit to the threshold would silently desynchronize query
    // and oracle at exactly one corpus size — pin the boundary.
    assert(Similarity.scaledBandBits(1L) == 8)
    assert(Similarity.scaledBandBits(50L << 8) == 8)       // 12,800: last 8-bit size
    assert(Similarity.scaledBandBits((50L << 8) + 1) == 16)
    assert(Similarity.scaledBandBits(200000L) == 16)       // the probed 100x corpus
  }
}
