package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Similarity search over the `embeddings` fixture (embedding: array<float>).
  *
  * Exactness strategy: cosine is computed over integer-quantized components
  * (round(x * 10^4) as BIGINT) so dot products and norms are exact int64
  * arithmetic in any engine; the final similarity is exact-int -> IEEE
  * double ops, which are bit-identical between Spark and DuckDB. That makes
  * ranking (and the similarity value itself) oracle-hashable.
  *
  * Scale shape: brute-force top-k broadcasts the (small) probe set against
  * the corpus — one scan, no shuffle of the big side; per-probe top-k is a
  * bounded window. The LSH variant buckets by hyperplane signature so the
  * candidate join is equi-key and shuffle-bounded.
  */
object Similarity {

  private val Dim = 64
  private val Scale = 10000.0

  /** Largest |x| whose quantization round(x * Scale) stays inside int64.
    * Long.MaxValue/Scale ≈ 9.2234e14 — a FINITE float beyond this (1e20f
    * is routine encoder garbage) still overflows the CAST even though it
    * passes an Inf/NaN check, so the well-formedness boundary must sit at
    * the int64 image, not at Float.MaxValue. The float grid near this
    * magnitude is ~2^26 apart, so the largest float below the bound
    * quantizes to ≤ ~9.22337e18 − 6.7e11 < Long.MaxValue: strictly-greater
    * is a safe total guard in both engines (the comparison is the same
    * double-vs-double in Spark and DuckDB).
    */
  private val MaxQuantizable: Double = Long.MaxValue / Scale

  /** Integer-quantized component: round(x * 10^4) as long — the ONE
    * quantization rule every integer-exact consumer shares (f4's array
    * surface included); keep it single-sourced so the quantized spaces
    * can never diverge.
    *
    * TOTAL on non-finite input (NULL image): every consumer filters
    * malformed vectors at the entry, but Catalyst can still evaluate the
    * quantizing transform on unfiltered rows — InferFiltersFromConstraints
    * adds isnotnull(transform(...)) predicates whose subexpression-
    * eliminated transform runs EAGERLY, before the entry filter's own
    * conjunct (observed on v6). A raw cast would ANSI-crash there; the
    * guarded branch never produces NULL on the filtered data the
    * consumers actually aggregate.
    */
  private[ops] def qElem(x: Column): Column =
    when(isnan(x) || abs(x) > lit(MaxQuantizable), lit(null).cast("long"))
      .otherwise(round(x.cast("double") * lit(Scale)).cast("long"))

  // The former HOF dot/norm helpers are gone: every consumer now uses the
  // codegen expressions (qcosine, qdot_long, qnorm2 — graft.functions),
  // whose HOF-equivalence is asserted in SimilaritySpec.

  /** Brute-force exact top-k cosine neighbors for each probe vector. */
  def cosineTopK(spark: SparkSession, sfDir: String, nProbes: Int, k: Int): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    graft.GraftExtensions.register(spark)
    corpus.join(broadcast(probes), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
      .orderBy("query_id", "rnk")
  }

  private def qElemSql(x: String): String =
    s"CAST(round(CAST($x AS DOUBLE) * 10000) AS BIGINT)"

  /** A vector participates in the quantized space only if it is
    * WELL-FORMED: present, with every component a finite non-null float.
    * Scraped corpora routinely carry NaN/Inf/null-element vectors (a
    * failed encoder batch, a truncated row); they have no usable position
    * in the space, and their quantization round(x*1e4) -> int64 is an
    * ANSI CAST_OVERFLOW crash. Skip them at every vector-space entry that
    * quantizes (the same contract as the null-vector skip), mirrored in
    * oracles via wellFormedVecSql.
    */
  private[ops] def wellFormedVec(c: Column): Column =
    c.isNotNull &&
      !exists(c, x => x.isNull || isnan(x) || abs(x) > lit(MaxQuantizable))

  private[ops] def wellFormedVecSql(e: String): String =
    s"($e IS NOT NULL AND len(list_filter($e, x -> x IS NULL OR isnan(x)" +
      s" OR abs(CAST(x AS DOUBLE)) > $MaxQuantizable)) = 0)"

  /** Membership in the quantized COSINE space: well-formed, corpus
    * dimension, and a non-zero quantized norm — a zero (or sub-quantum)
    * vector has no direction, so cosine assignment would divide by zero,
    * and a wrong-dimension vector has no position at all (qdot_long is
    * strict about lengths by design). The norm test uses the exact
    * quantization rule (round half away from zero in both engines), so
    * engine and oracle agree on the boundary bit-for-bit.
    */
  private[ops] def inQSpace(c: Column): Column =
    wellFormedVec(c) && size(c) === lit(Dim) &&
      exists(c, x => round(x.cast("double") * lit(Scale)) =!= lit(0.0))

  private[ops] def inQSpaceSql(e: String): String =
    s"(${wellFormedVecSql(e)} AND len($e) = $Dim" +
      s" AND len(list_filter($e, x -> round(CAST(x AS DOUBLE) * 10000) <> 0)) > 0)"

  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> ${qElemSql(s"$a[i]")} * ${qElemSql(s"$b[i]")})) AS BIGINT)"

  private def norm2Sql(a: String): String =
    s"CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> ${qElemSql(s"$a[i]")} * ${qElemSql(s"$a[i]")})) AS BIGINT)"

  // Deterministic random-hyperplane coefficients for LSH bucketing —
  // sourced from the codegen expression's table so the DataFrame API,
  // the Catalyst expression, and the oracle's literal VALUES table all
  // agree bit-for-bit.
  private val NPlanes = graft.functions.HyperplaneBucketImpl.NPlanes
  private val planes: Array[Array[Int]] = graft.functions.HyperplaneBucketImpl.planes

  /** Random-hyperplane signature: bit j = sign of <quantized vec, plane j>.
    * One codegen'd static call (HyperplaneBucket expression) — the 8
    * aggregate(zip_with(..)) HOF passes this replaces built 512 lambda
    * multiplies per row. Requires GraftExtensions registration.
    */
  /** Banded-LSH candidate generation (d22's core), parameterized by band
    * width: 4 bands of `bandBits` bits each, spam-bucket cap 1000,
    * distinct (id_a < id_b) pairs. Only ids and band keys ever ride the
    * shuffle.
    *
    * BAND WIDTH IS A FUNCTION OF CORPUS SIZE: with B = 2^bandBits
    * buckets per band the candidate join costs ~ n²/B pairs on non-dup
    * data, so bandBits must grow with log2(n) to hold per-bucket
    * populations — and therefore candidates per vector — constant.
    * 8-bit bands (sig32) are right up to ~10^5 vectors; 16-bit bands
    * (sig64) carry ~10^7; wider tables beyond. scaledBandBits picks the
    * width from the corpus count; DedupScaleProbe measures the knee
    * (8-bit candidates grow ~quadratic past 10^4 vectors, 16-bit stay
    * bucket-bounded). The recall tradeoff runs the other way — each
    * extra bit halves a true near-dup's band-collision odds — so at
    * scale you widen bits AND add bands (more planes), never bits alone.
    */
  private[graft] def embeddingBandCandidates(
      s: SparkSession, d: String, bandBits: Int = 8): DataFrame = {
    graft.GraftExtensions.register(s)
    require(bandBits == 8 || bandBits == 16, s"bandBits 8 (sig32) or 16 (sig64), got $bandBits")
    val sigFn = if (bandBits == 8) "hyperplane_sig32" else "hyperplane_sig64"
    val mask = (1L << bandBits) - 1
    val e = Tables.embeddings(s, d)
      .withColumn("sig", call_function(sigFn, col("embedding")))
    val banded = e.select(col("vec_id"),
        explode(expr(
          s"transform(sequence(0, 3), b -> struct(b AS band, shiftright(sig, $bandBits*b) & $mask AS bkey))")).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bkey"))
      // spam-bucket guard (same rationale and cap as d6): a
      // degenerate bucket of n docs costs n^2 candidate pairs and
      // carries no near-dup signal worth that price
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy("band", "bkey")))
      .where(col("bsz") <= 1000)
      .drop("bsz")
    banded.select(col("band"), col("bkey"), col("vec_id").as("id_a"))
      .join(banded.select(col("band"), col("bkey"), col("vec_id").as("id_b")),
            Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Pick the band width for a corpus of n vectors: the narrowest width
    * that keeps the expected bucket population near ~50, which bounds the
    * candidate join at ~25 pairs per vector per band. Measured knee
    * (DedupScaleProbe): at 50k vectors 8-bit bands emit 22.4M candidate
    * pairs (448/vector, quadratic regime) while 16-bit bands emit 167k
    * (3.3/vector) — so the switch belongs at ~12.8k, well before the
    * blowup. Wired into the judged d22 path (and mirrored by its
    * oracle's size-guarded union), not just the probe.
    */
  private[graft] def scaledBandBits(n: Long): Int =
    if (n <= (50L << 8)) 8 else 16

  /** Exact-similarity scoring + top-20 over a candidate-pair frame
    * (shared by d22 / d22b). Top-k via orderBy().limit()
    * (TakeOrderedAndProject: per-partition heaps, k rows to the
    * driver-side merge) — NOT a row_number over a global window, which
    * would funnel every surviving candidate pair into one task's sort
    * at corpus scale. Only the 20 survivors see a window, for the rank
    * column.
    */
  private def topScoredPairs(s: SparkSession, d: String, pairs: DataFrame): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val top = pairs
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .withColumn("sim", call_function("qcosine", col("va"), col("vb")))
      .select("id_a", "id_b", "sim")
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(20)
    top
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("sim").desc, col("id_a"), col("id_b"))).cast("long"))
      .select("rnk", "id_a", "id_b", "sim")
      .orderBy("rnk")
  }

  def hyperplaneBucket(vec: Column): Column =
    call_function("hyperplane_bucket", vec)

  /** LSH-bucketed ANN: candidates share a hyperplane-signature bucket;
    * exact cosine re-rank within the bucket. The scale path: bucket is an
    * equi-join key, so candidate generation is shuffle-bounded (vs the
    * brute-force cross product).
    */
  def annLsh(spark: SparkSession, sfDir: String, nProbes: Int, k: Int): DataFrame = {
    graft.GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", hyperplaneBucket(col("embedding")))
    val probes = e.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    graft.GraftExtensions.register(spark)
    corpus.join(broadcast(probes), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
      .orderBy("query_id", "rnk")
  }

  // ---- IVF-style ANN (third variant, after brute-force and LSH) ---------

  /** Coarse IVF centroids via Lloyd iterations, fully deterministic:
    * every per-dimension centroid component is an EXACT integer sum of
    * quantized components divided by the cell count (long sums are
    * order-independent, unlike float accumulation), so cell assignment
    * is reproducible across runs and partitionings.
    *
    * Scale shape: centroids are a tiny broadcast table; each iteration
    * is one corpus scan + a (cell, dim)-keyed partial aggregation.
    */
  def ivfCentroids(e: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // The corpus is scanned once per Lloyd iteration; persist it for the
    // duration of the centroid computation so iterations 2..k (each
    // materialized by the collect below) read cached columnar batches
    // instead of re-scanning the source — at 100 TB this is the standard
    // "cache the training set across k-means iterations" pattern.
    // Released before return: downstream consumers do one scan each.
    val corpus = e.persist()
    try {
      // init: the first nCells vectors, in quantized-INTEGER space. Keeping
      // centroid components integer (round(mean of quantized components))
      // makes every centroid dot/norm exact int64 — so assignment, probe
      // ranking, and therefore the whole IVF query are cross-engine exact
      // and oracle-checkable, same discipline as v1's qcosine.
      var cents = corpus.where(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"),
                transform(col("embedding"), x => qElem(x)).as("centroid"))
      for (_ <- 0 until iters) {
        // One map-side-combined shuffle via the typed CentroidAgg (dim longs
        // + count per cell cross the network), instead of exploding to
        // (cell, dim) rows. Exact integer sums -> mean -> round to int.
        val agg = new graft.functions.CentroidAgg(Dim)
        val next = assignCells(corpus, cents)
          .select(col("cell").cast("int"), col("embedding"))
          .as[(Int, Array[Float])]
          .groupByKey(_._1).agg(agg.toColumn.name("centroid"))
          .toDF("cell", "centroid")
          .select(col("cell").cast("long").as("cell"),
                  transform(col("centroid"), c => round(c).cast("long")).as("centroid"))
        // Materialize: centroids are driver-sized (nCells x dim), and every
        // downstream consumer (next iteration, inverted file, probe ranking)
        // would otherwise re-run the whole lineage — at scale this is the
        // per-iteration centroid checkpoint every k-means implementation does.
        cents = next.as[(Long, Array[Long])].collect().toSeq
          .toDF("cell", "centroid")
      }
      cents
    } finally { corpus.unpersist(); () }
  }

  /** Nearest-centroid assignment by cosine; deterministic tie-break on
    * the lowest cell id. Centroids ride a broadcast; the corpus streams
    * once through a map-side max_by aggregation.
    *
    * Cost shape: the per-(row x centroid) dot product is ONE codegen'd
    * static call (qdot_long), and both norms are computed once per INPUT
    * row (corpus side) / once per centroid (16-row broadcast side) BEFORE
    * the join, never per joined pair — the HOF formulation this replaces
    * re-ran three array lambdas per pair and dominated the IVF cost.
    */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    graft.GraftExtensions.register(e.sparkSession)
    val c2 = cents.withColumn("cn2",
      aggregate(transform(col("centroid"), c => c * c), lit(0L), (acc, v) => acc + v))
    val e2 = e.withColumn("en2", call_function("qnorm2", col("embedding")))
    e2.join(broadcast(c2), lit(true))
      .withColumn("csim",
        call_function("qdot_long", col("embedding"), col("centroid")).cast("double") /
          (sqrt(col("en2").cast("double")) * sqrt(col("cn2").cast("double"))))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
           first(col("embedding")).as("embedding"))
  }

  /** Two-level (coarse-quantizer) nearest-centroid assignment — the
    * production shape once nCells grows past ~1e5 and [[assignCells]]'s
    * n·nCells dot products dominate (the honest caveat PLANS.md records
    * for SemDeDup at corpus scale). Structure: ~sqrt(C) PIVOT centroids
    * (deterministic: the lowest-id cells); each centroid hangs off its
    * nearest pivot (a control-sized C×sqrt(C) computation); each vector
    * ranks the pivots exactly, probes the top `nProbe` super-cells, and
    * exact-re-ranks only the centroids inside them. Per-vector cost
    * drops from C dots to ~sqrt(C) + nProbe·C/sqrt(C); everything rides
    * broadcasts — no shuffle touches the corpus. Approximation error is
    * confined to vectors whose true cell hangs off an unprobed pivot;
    * SimilaritySpec measures agreement vs exact assignment.
    */
  def assignCellsCoarse(e: DataFrame, cents: DataFrame, nProbe: Int = 2): DataFrame = {
    graft.GraftExtensions.register(e.sparkSession)
    val nCells = cents.count() // control-sized by contract
    val ns = math.max(1L, math.round(math.sqrt(nCells.toDouble)))
    val pivots = cents.orderBy("cell").limit(ns.toInt)
      .select(col("cell").as("pivot"), col("centroid").as("pv"))
      .withColumn("pn2",
        aggregate(transform(col("pv"), x => x * x), lit(0L), (acc, v) => acc + v))
    val cpn = cents.withColumn("cn2",
      aggregate(transform(col("centroid"), x => x * x), lit(0L), (acc, v) => acc + v))
    // centroid-to-pivot grouping uses COSINE, the same metric vectors
    // rank pivots by below — a mixed-metric grouping (L2 here, cosine
    // there) would let a vector's best-cosine cell hang off a pivot the
    // vector never probes even in benign geometry, depressing agreement
    val c2p = cpn.crossJoin(broadcast(pivots))
      .withColumn("psim",
        aggregate(zip_with(col("centroid"), col("pv"), (a, b) => a * b),
                  lit(0L), (acc, v) => acc + v).cast("double") /
          (sqrt(col("cn2").cast("double")) * sqrt(col("pn2").cast("double"))))
      .groupBy("cell")
      .agg(max_by(col("pivot"), struct(col("psim"), -col("pivot"))).as("pivot"),
           first(col("centroid")).as("centroid"), first(col("cn2")).as("cn2"))
    val ev = e.withColumn("en2", call_function("qnorm2", col("embedding")))
    val vp = ev.crossJoin(broadcast(pivots))
      .withColumn("psim",
        call_function("qdot_long", col("embedding"), col("pv")).cast("double") /
          (sqrt(col("en2").cast("double")) * sqrt(col("pn2").cast("double"))))
      .withColumn("prnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("psim").desc, col("pivot"))))
      .where(col("prnk") <= nProbe)
      .select("vec_id", "embedding", "en2", "pivot")
    vp.join(broadcast(c2p), Seq("pivot"))
      .withColumn("csim",
        call_function("qdot_long", col("embedding"), col("centroid")).cast("double") /
          (sqrt(col("en2").cast("double")) * sqrt(col("cn2").cast("double"))))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
           first(col("embedding")).as("embedding"))
  }

  /** IVF ANN: probe the nProbeCells nearest cells per query, exact
    * quantized-cosine re-rank within the candidate cells. Candidates are
    * bounded by cell sizes (vs the corpus for brute force); the inverted
    * file is the cell-keyed table, so the probe is an equi-join.
    */
  def annIvf(spark: SparkSession, sfDir: String, nProbes: Int, k: Int,
             nCells: Int = 16, iters: Int = 2, nProbeCells: Int = 2): DataFrame = {
    graft.GraftExtensions.register(spark)
    // malformed vectors (null, null element, NaN/Inf component) carry no
    // position in the space: they can neither train a centroid nor be
    // assigned to one — skip them (oracle CTE mirrors)
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .where(inQSpace(col("embedding")))
    val cents = ivfCentroids(e, nCells, iters)
    val inverted = assignCells(e, cents)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("cell"))
    // probe cells: top nProbeCells centroids per query vector (same
    // precomputed-norm + codegen-dot shape as assignCells)
    val probes = e.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn2", call_function("qnorm2", col("qv")))
    val centsN = cents.withColumn("cn2",
      aggregate(transform(col("centroid"), c => c * c), lit(0L), (acc, v) => acc + v))
    val probeCells = probes.join(broadcast(centsN), lit(true))
      .withColumn("csim",
        call_function("qdot_long", col("qv"), col("centroid")).cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("cn2").cast("double"))))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell"))))
      .where(col("crnk") <= nProbeCells)
      .select("query_id", "qv", "cell")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    inverted.join(broadcast(probeCells), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
      .orderBy("query_id", "rnk")
  }

  /** Shared oracle prefix: literal seeded plane table -> per-vector
    * hyperplane bucket -> `e2(vec_id, embedding, bucket)` — used by the
    * LSH ANN (v3) and the bucketed near-dup (d22) oracles.
    */
  private def bucketedCorpusCtes: String = {
    val vals = (0 until NPlanes).flatMap(j =>
      (0 until Dim).map(i => s"($j, ${i + 1}, ${planes(j)(i)})")).mkString(", ")
    s"""planes(j, i, w) AS (VALUES $vals),
        d AS (
          SELECT e.vec_id, p.j, sum(${qElemSql("e.embedding[p.i]")} * p.w) AS dotj
          FROM embeddings e JOIN planes p ON true
          GROUP BY e.vec_id, p.j),
        bk AS (
          SELECT vec_id,
                 sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
          FROM d GROUP BY vec_id),
        e2 AS (SELECT e.vec_id, e.embedding, bk.bucket FROM embeddings e JOIN bk USING (vec_id))"""
  }

  /** Oracle prefix for the WIDE 32-plane signature (d22's banding):
    * literal plane table -> `wsig(vec_id, sig)`.
    */
  private def wideSigCtes: String = {
    val wide = graft.functions.HyperplaneBucketImpl.planesWide
    val vals = wide.indices.flatMap(j =>
      (0 until Dim).map(i => s"($j, ${i + 1}, ${wide(j)(i)})")).mkString(", ")
    s"""wplanes(j, i, w) AS (VALUES $vals),
        wd AS (
          SELECT e.vec_id, p.j, sum(${qElemSql("e.embedding[p.i]")} * p.w) AS dotj
          FROM embeddings e JOIN wplanes p ON true
          GROUP BY e.vec_id, p.j),
        wsig AS (
          SELECT vec_id,
                 sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sig
          FROM wd GROUP BY vec_id)"""
  }

  /** 16-bit band keys over the 64-plane table, computed directly per
    * band (shift <= 15 inside each band) because DuckDB's BIGINT shift
    * overflows at bit 63; identical values to extracting
    * `(sig64 >> 16*band) & 65535` on the Spark side.
    */
  private def fullBandCtes: String = {
    val full = graft.functions.HyperplaneBucketImpl.planes64
    val vals = full.indices.flatMap(j =>
      (0 until Dim).map(i => s"($j, ${i + 1}, ${full(j)(i)})")).mkString(", ")
    s"""fplanes(j, i, w) AS (VALUES $vals),
        fd AS (
          SELECT e.vec_id, p.j, sum(${qElemSql("e.embedding[p.i]")} * p.w) AS dotj
          FROM embeddings e JOIN fplanes p ON true
          GROUP BY e.vec_id, p.j),
        fband AS (
          SELECT vec_id, j // 16 AS band,
                 sum(CASE WHEN dotj > 0 THEN (1::BIGINT << (j % 16)) ELSE 0 END)::BIGINT AS bkey
          FROM fd GROUP BY vec_id, j // 16)"""
  }

  /** SemDeDup per-cell accounting over an assigned (vec_id, embedding,
    * cell, n2) frame — shared judged tail of d46 (exact assignment) and
    * d46b (two-level coarse assignment). Within-cell pairs only; the
    * >= 0.5 dup threshold is the cross-multiplied rational evaluated in
    * DECIMAL(38) so no float boundary can flake the judged drop set.
    */
  private def semdedupAccounting(assigned: DataFrame): DataFrame = {
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
                            col("embedding").as("va"), col("n2").as("n2a"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
                            transform(col("embedding"), x => qElem(x)).as("vbq"),
                            col("n2").as("n2b"))
    val pairs = a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
      .withColumn("dot", call_function("qdot_long", col("va"), col("vbq")))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
      .withColumn("is_dup",
        (col("dot") > 0) &&
        (col("dot").cast("decimal(38,0)") * col("dot") * lit(4) >=
         col("n2a").cast("decimal(38,0)") * col("n2b")))
    val perCell = pairs.groupBy("cell")
      .agg(count(lit(1)).as("n_pairs"), max(col("sim")).as("max_sim"))
    val dropped = pairs.where(col("is_dup"))
      .select(col("cell"), col("id_b")).distinct()
      .groupBy("cell").agg(count(lit(1)).as("n_dropped"))
    assigned.groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(perCell, Seq("cell"), "left")
      .join(dropped, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
              coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
              coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
              coalesce(col("max_sim"), lit(-2.0d)).as("max_sim"))
      .orderBy("cell")
  }

  // ---- Lloyd-iteration oracle SQL, shared by d46 / d46b / v4 ----------
  // Integer-quantized centroids make every iteration exact int64 math,
  // so the 2-unrolled-iteration training is re-expressible in SQL and
  // each consumer only varies the FINAL assignment + judged tail.

  /** Assignment CTE body: nearest cell by cosine, tie-break low cell. */
  private def lloydAssignSql(cellsCte: String): String =
    s"""SELECT vec_id, cell FROM (
          SELECT nn.vec_id, c.cell,
                 row_number() OVER (PARTITION BY nn.vec_id ORDER BY
                   (list_sum(list_transform(range(1, ${Dim + 1}), i -> nn.q[i] * c.cq[i]))::DOUBLE
                    / (sqrt(nn.n2::DOUBLE) * sqrt(c.cn2::DOUBLE))) DESC,
                   c.cell) AS rn
          FROM n nn JOIN $cellsCte c ON true)
        WHERE rn = 1"""

  /** Centroid recompute CTE body: integer mean per dimension. */
  private def lloydRecomputeSql(assignCte: String): String =
    s"""SELECT cell,
               list(CAST(round(s::DOUBLE / cnt) AS BIGINT) ORDER BY i) AS cq
        FROM (
          SELECT a.cell, t.i, CAST(sum(nn.q[t.i]) AS BIGINT) AS s, count(*) AS cnt
          FROM $assignCte a JOIN n nn USING (vec_id), range(1, ${Dim + 1}) t(i)
          GROUP BY a.cell, t.i)
        GROUP BY cell"""

  private def lloydNormsSql(cte: String): String =
    s"SELECT cell, cq, CAST(list_sum(list_transform(cq, x -> x*x)) AS BIGINT) AS cn2 FROM $cte"

  /** WITH-chain prefix ending at the trained centroids `c2n(cell, cq,
    * cn2)` for nCells=16, iters=2 (the fixture configuration).
    */
  private def lloydPrefixSql: String =
    s"""e AS (
          SELECT vec_id,
                 list_transform(range(1, ${Dim + 1}),
                   i -> ${qElemSql("embedding[i]")}) AS q
          FROM embeddings WHERE ${inQSpaceSql("embedding")}),
        n AS (
          SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
          FROM e),
        c0 AS (SELECT vec_id AS cell, q AS cq FROM e WHERE vec_id < 16),
        c0n AS (${lloydNormsSql("c0")}),
        a1 AS (${lloydAssignSql("c0n")}),
        c1 AS (${lloydRecomputeSql("a1")}),
        c1n AS (${lloydNormsSql("c1")}),
        a2 AS (${lloydAssignSql("c1n")}),
        c2 AS (${lloydRecomputeSql("a2")}),
        c2n AS (${lloydNormsSql("c2")})"""

  /** Judged SemDeDup tail over an `inv(vec_id, cell)` assignment CTE. */
  private def semdedupTailSql: String =
    s"""p AS (
          SELECT a.cell, b2.vec_id AS id_b,
                 CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> na.q[i] * nb.q[i])) AS BIGINT) AS dot,
                 na.n2 AS n2a, nb.n2 AS n2b
          FROM inv a JOIN inv b2 ON a.cell = b2.cell AND a.vec_id < b2.vec_id
          JOIN n na ON na.vec_id = a.vec_id
          JOIN n nb ON nb.vec_id = b2.vec_id),
        pc AS (
          SELECT cell, count(*) AS n_pairs,
                 max(dot::DOUBLE / (sqrt(n2a::DOUBLE) * sqrt(n2b::DOUBLE))) AS max_sim
          FROM p GROUP BY cell),
        dr AS (
          SELECT cell, count(*) AS n_dropped FROM (
            SELECT DISTINCT cell, id_b FROM p
            WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 4 >= CAST(n2a AS HUGEINT) * n2b)
          GROUP BY cell),
        m AS (SELECT cell, count(*) AS n_members FROM inv GROUP BY cell)
        SELECT m.cell, m.n_members,
               CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
               coalesce(pc.max_sim, -2.0) AS max_sim
        FROM m LEFT JOIN pc USING (cell) LEFT JOIN dr USING (cell)
        ORDER BY m.cell"""

  /** Per-label centroids via the typed CentroidAgg Aggregator. */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding"))
      // unlabeled rows cannot contribute to a per-label centroid — and
      // the non-nullable Int side of the typed encoder throws on them.
      // Malformed vectors (null element, NaN/Inf) are likewise skipped:
      // the Array[Float] encoder asserts non-null elements, and a
      // non-finite component has no quantized position (oracle mirrors).
      .where(col("label").isNotNull && wellFormedVec(col("embedding")))
      .as[(Int, Array[Float])]
    val agg = new graft.functions.CentroidAgg(Dim)
    ds.groupByKey(_._1).agg(agg.toColumn.name("q_centroid"))
      .toDF("label", "q_centroid")
  }

  val queries: Map[String, Q] = Map(

    // Typed-Aggregator (UDAF) surface: per-label embedding centroids in
    // quantized units; first 8 dimensions exploded for the oracle.
    "c1_label_centroids" -> Q(
      fn = (s, d) =>
        labelCentroids(s, d)
          .select(col("label"), posexplode(slice(col("q_centroid"), 1, 8)))
          .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
                  col("col").as("qc"))
          .orderBy("label", "dim"),
      oracle = Some(s"""
        SELECT label, i AS dim,
               CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS DOUBLE)
                 / count(*) AS qc
        FROM embeddings, range(1, 9) t(i)
        WHERE label IS NOT NULL AND ${wellFormedVecSql("embedding")}
        GROUP BY label, i ORDER BY label, dim"""),
      doc = "typed Aggregator (UDAF): per-label vector centroids"
    ),

    // LSH-bucketed ANN (scale path of v1; recall measured in tests
    // against the exact brute-force baseline). Fully oracle-gated: the
    // seeded hyperplane coefficients are deterministic integers, so they
    // interpolate into the SQL as a literal (j, i, w) plane table and the
    // bucket assignment is exact integer arithmetic in both engines.
    "v3_ann_lsh" -> Q(
      fn = (s, d) => annLsh(s, d, nProbes = 10, k = 3),
      oracle = Some {
        s"""WITH $bucketedCorpusCtes,
            q2 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e2 WHERE vec_id < 10),
            p2 AS (
              SELECT query_id, e2.vec_id AS neighbor_id,
                     CAST(${dotSql("qv", "e2.embedding")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("qv")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("e2.embedding")} AS DOUBLE))) AS sim
              FROM q2 JOIN e2 ON q2.bucket = e2.bucket AND q2.query_id <> e2.vec_id),
            r AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
              FROM p2)
            SELECT query_id, neighbor_id, rnk, sim FROM r WHERE rnk <= 3
            ORDER BY query_id, rnk"""
      },
      doc = "LSH-bucketed approximate nearest neighbors (full oracle)"
    ),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, public): k-means
    // cells partition the corpus, then the pairwise cosine check runs
    // only WITHIN each cell — the IVF-flavored third embedding-dedup
    // scale path (vs d10's brute force and d22's LSH banding). The
    // quadratic step is bounded by the largest cell, never the corpus:
    // here 500 vectors brute-force to 124,750 pairs but the cells check
    // ~7-8k — and at 100 TB you raise nCells so cell sizes stay flat.
    // Every comparison is exact integer math: the >= 0.5 threshold is
    // the cross-multiplied rational 4*dot^2 >= n2a*n2b evaluated in
    // DECIMAL(38) (dot^2 overflows int64), so no float boundary can
    // flake the judged drop set. Judged output is the per-cell
    // accounting: members, pairs actually checked, keep-lowest-id drops,
    // and the cell's max exact cosine.
    "d46_semdedup" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
          .where(inQSpace(col("embedding"))) // see annIvf: cosine-space membership
        val cents = ivfCentroids(e, nCells = 16, iters = 2)
        val assigned = assignCells(e, cents)
          .withColumn("n2", call_function("qnorm2", col("embedding")))
          .persist()
        PipelineCache.retain(assigned)
        semdedupAccounting(assigned)
      },
      oracle = Some(s"""
        WITH $lloydPrefixSql,
        inv AS (${lloydAssignSql("c2n")}),
        $semdedupTailSql"""),
      doc = "SemDeDup: k-means cells bound the pairwise semantic-dup check (cluster-partitioned quadratic)"
    ),

    // SemDeDup through the TWO-LEVEL coarse quantizer — the production
    // assignment once nCells outgrows assignCells' n·C dot products
    // (PLANS.md's honest caveat for the exact path). Same trained
    // centroids and judged accounting as d46; only the final assignment
    // differs: sqrt(C) pivots (lowest-id cells), each centroid hangs off
    // its nearest pivot BY COSINE, each vector exact-ranks the pivots,
    // probes the top-2 super-cells, and re-ranks only the centroids
    // inside them. Fully hash-gated: the pivot tables are deterministic
    // integers, so the coarse path is SQL-expressible like v3's planes.
    "d46b_semdedup_coarse" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d).select("vec_id", "embedding")
          .where(inQSpace(col("embedding"))) // see annIvf: cosine-space membership
        val cents = ivfCentroids(e, nCells = 16, iters = 2)
        val assigned = assignCellsCoarse(e, cents)
          .withColumn("n2", call_function("qnorm2", col("embedding")))
          .persist()
        PipelineCache.retain(assigned)
        semdedupAccounting(assigned)
      },
      oracle = Some(s"""
        WITH $lloydPrefixSql,
        piv AS (SELECT cell AS pvt, cq AS pv, cn2 AS pn2 FROM c2n ORDER BY cell LIMIT 4),
        c2p AS (
          SELECT cell, pvt FROM (
            SELECT c.cell, p.pvt,
                   row_number() OVER (PARTITION BY c.cell ORDER BY
                     (list_sum(list_transform(range(1, ${Dim + 1}), i -> c.cq[i] * p.pv[i]))::DOUBLE
                      / (sqrt(c.cn2::DOUBLE) * sqrt(p.pn2::DOUBLE))) DESC,
                     p.pvt) AS rn
            FROM c2n c JOIN piv p ON true)
          WHERE rn = 1),
        vp AS (
          SELECT vec_id, pvt FROM (
            SELECT nn.vec_id, p.pvt,
                   row_number() OVER (PARTITION BY nn.vec_id ORDER BY
                     (list_sum(list_transform(range(1, ${Dim + 1}), i -> nn.q[i] * p.pv[i]))::DOUBLE
                      / (sqrt(nn.n2::DOUBLE) * sqrt(p.pn2::DOUBLE))) DESC,
                     p.pvt) AS rn
            FROM n nn JOIN piv p ON true)
          WHERE rn <= 2),
        inv AS (
          SELECT vec_id, cell FROM (
            SELECT vp.vec_id, c.cell,
                   row_number() OVER (PARTITION BY vp.vec_id ORDER BY
                     (list_sum(list_transform(range(1, ${Dim + 1}), i -> nn.q[i] * c.cq[i]))::DOUBLE
                      / (sqrt(nn.n2::DOUBLE) * sqrt(c.cn2::DOUBLE))) DESC,
                     c.cell) AS rn
            FROM vp
            JOIN c2p ON c2p.pvt = vp.pvt
            JOIN c2n c ON c.cell = c2p.cell
            JOIN n nn ON nn.vec_id = vp.vec_id)
          WHERE rn = 1),
        $semdedupTailSql"""),
      doc = "SemDeDup via the two-level coarse quantizer (sqrt(C) pivots, top-2 probes) — full oracle"
    ),

    // IVF-style ANN: coarse deterministic centroids -> probe nearest
    // cells -> exact re-rank. Rows-only (iterative centroids are not
    // reasonably SQL-expressible); recall vs the exact baseline is
    // asserted >= the LSH variant's in SimilaritySpec.
    // Fully oracle-gated: integer-quantized centroids make every Lloyd
    // iteration exact int64 math, so the whole IVF pipeline (2 unrolled
    // iterations + inverted file + 2-cell probing + exact re-rank) is
    // re-expressed in SQL and hash-compared.
    "v4_ann_ivf" -> Q(
      fn = (s, d) => annIvf(s, d, nProbes = 10, k = 3),
      oracle = Some {
        s"""
        WITH $lloydPrefixSql,
        inv AS (${lloydAssignSql("c2n")}),
        pc AS (
          SELECT query_id, cell FROM (
            SELECT nn.vec_id AS query_id, c.cell,
                   row_number() OVER (PARTITION BY nn.vec_id ORDER BY
                     (list_sum(list_transform(range(1, ${Dim + 1}), i -> nn.q[i] * c.cq[i]))::DOUBLE
                      / (sqrt(nn.n2::DOUBLE) * sqrt(c.cn2::DOUBLE))) DESC,
                     c.cell) AS rn
            FROM n nn JOIN c2n c ON true
            WHERE nn.vec_id < 10)
          WHERE rn <= 2),
        cand AS (
          SELECT pc.query_id, inv.vec_id AS neighbor_id,
                 (list_sum(list_transform(range(1, ${Dim + 1}), i -> qn.q[i] * cn.q[i]))::DOUBLE
                  / (sqrt(qn.n2::DOUBLE) * sqrt(cn.n2::DOUBLE))) AS sim
          FROM pc
          JOIN inv ON inv.cell = pc.cell AND inv.vec_id <> pc.query_id
          JOIN n qn ON qn.vec_id = pc.query_id
          JOIN n cn ON cn.vec_id = inv.vec_id),
        r AS (
          SELECT query_id, neighbor_id, sim,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
          FROM cand)
        SELECT query_id, neighbor_id, rnk, sim FROM r WHERE rnk <= 3
        ORDER BY query_id, rnk"""
      },
      doc = "IVF ANN: coarse centroids, cell probing, exact re-rank (full oracle)"
    ),

    // ANN baseline: brute-force exact cosine top-5 for 10 probes.
    "v1_cosine_topk" -> Q(
      fn = (s, d) => cosineTopK(s, d, nProbes = 10, k = 5),
      oracle = Some(
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            p AS (
              SELECT query_id, neighbor_id,
                     CAST(${dotSql("qv", "cv")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("qv")} AS DOUBLE)) * sqrt(CAST(${norm2Sql("cv")} AS DOUBLE))) AS sim
              FROM q, c WHERE query_id <> neighbor_id),
            r AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
              FROM p)
            SELECT query_id, neighbor_id, rnk, sim
            FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""),
      doc = "brute-force cosine top-k (exact ANN baseline)"
    ),

    // FULL-CORPUS embedding near-dup, the scale path of d10: BANDED LSH
    // over a WIDE 32-plane signature — 4 bands x 8 planes, so each band
    // has 256 buckets and per-bucket populations (not the corpus) bound
    // the candidate join. A 2-bit band key was measured QUADRATIC at 10x
    // scale (115x time for 10x data); with 8-bit bands + the d6-style
    // spam-bucket cap, candidates stay cap-bounded at any corpus size.
    // Only ids ride the distinct; exact quantized cosine verifies the
    // survivors. Same exact-vs-banded relationship as d8 vs d6b on text.
    "d22_embedding_lsh_neardup" -> Q(
      fn = (s, d) => {
        // the fixture corpus has no >= 0.9 pairs, so the judged output is
        // the top-20 banded candidates by exact similarity — proving the
        // banding surfaces the closest pairs without an all-pairs join.
        // ADAPTIVE BAND WIDTH: the judged entry point itself applies
        // scaledBandBits — 8-bit bands under the measured ~12.8k-vector
        // knee (every fixture scale), 16-bit past it (the 100x probe) —
        // so the query that passes the oracle is the same one that
        // stays bucket-bounded at corpus scale. The count() driving the
        // switch is one footer-cheap job with a scalar result.
        val n = Tables.embeddings(s, d).count()
        topScoredPairs(s, d, embeddingBandCandidates(s, d, scaledBandBits(n)))
      },
      oracle = Some(s"""
        WITH $wideSigCtes,
        $fullBandCtes,
        nn AS (SELECT count(*) AS n FROM embeddings),
        banded8 AS (
          SELECT vec_id, b, (sig >> (8*b)) & 255 AS bkey
          FROM wsig, range(0, 4) t(b)
          QUALIFY count(*) OVER (PARTITION BY b, bkey) <= 1000),
        banded16 AS (
          SELECT vec_id, band, bkey FROM fband
          QUALIFY count(*) OVER (PARTITION BY band, bkey) <= 1000),
        pairs AS (
          SELECT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM banded8 a JOIN banded8 b2 ON a.b = b2.b AND a.bkey = b2.bkey AND a.vec_id < b2.vec_id
          WHERE (SELECT n FROM nn) <= 12800
          UNION
          SELECT a.vec_id, b2.vec_id
          FROM banded16 a JOIN banded16 b2 ON a.band = b2.band AND a.bkey = b2.bkey AND a.vec_id < b2.vec_id
          WHERE (SELECT n FROM nn) > 12800),
        p AS (
          SELECT id_a, id_b,
                 CAST(${dotSql("x.embedding", "y.embedding")} AS DOUBLE) /
                   (sqrt(CAST(${norm2Sql("x.embedding")} AS DOUBLE)) *
                    sqrt(CAST(${norm2Sql("y.embedding")} AS DOUBLE))) AS sim
          FROM pairs
          JOIN embeddings x ON x.vec_id = id_a
          JOIN embeddings y ON y.vec_id = id_b),
        r AS (
          SELECT CAST(row_number() OVER (ORDER BY sim DESC, id_a, id_b) AS BIGINT) AS rnk,
                 id_a, id_b, sim FROM p)
        SELECT rnk, id_a, id_b, sim FROM r WHERE rnk <= 20 ORDER BY rnk"""),
      doc = "full-corpus embedding near-dup via banded LSH (scale path of d10)"
    ),

    // The BIG-CORPUS configuration of d22, judged in its own right: the
    // same banding through 4 x 16-bit bands over the 64-plane signature
    // (65,536 buckets per band — the width scaledBandBits picks past
    // ~12.8k vectors, where 8-bit buckets saturate and candidates go
    // quadratic; DedupScaleProbe measured the knee). Oracle computes each
    // band key directly (shifts <= 15) since DuckDB's BIGINT << 63
    // overflows; bit-identical to extracting from the sig64 value.
    "d22b_embedding_lsh_wide" -> Q(
      fn = (s, d) => topScoredPairs(s, d, embeddingBandCandidates(s, d, bandBits = 16)),
      oracle = Some(s"""
        WITH $fullBandCtes,
        banded AS (
          SELECT vec_id, band, bkey FROM fband
          QUALIFY count(*) OVER (PARTITION BY band, bkey) <= 1000),
        pairs AS (
          SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM banded a JOIN banded b2 ON a.band = b2.band AND a.bkey = b2.bkey AND a.vec_id < b2.vec_id),
        p AS (
          SELECT id_a, id_b,
                 CAST(${dotSql("x.embedding", "y.embedding")} AS DOUBLE) /
                   (sqrt(CAST(${norm2Sql("x.embedding")} AS DOUBLE)) *
                    sqrt(CAST(${norm2Sql("y.embedding")} AS DOUBLE))) AS sim
          FROM pairs
          JOIN embeddings x ON x.vec_id = id_a
          JOIN embeddings y ON y.vec_id = id_b),
        r AS (
          SELECT CAST(row_number() OVER (ORDER BY sim DESC, id_a, id_b) AS BIGINT) AS rnk,
                 id_a, id_b, sim FROM p)
        SELECT rnk, id_a, id_b, sim FROM r WHERE rnk <= 20 ORDER BY rnk"""),
      doc = "wide-band (16-bit) embedding near-dup — the big-corpus configuration, oracle-gated"
    ),

    // Embedding-cosine near-dup: the dedup-flavored use of the similarity
    // machinery — most-similar pairs over a corpus sample with a dup flag
    // at the 0.9 threshold (exact quantized math, so the flag and ranking
    // are oracle-stable). BOUNDED-SAMPLE CONTRACT (same as d8/d33): the
    // 200-vector cap below is the query's definition, not an
    // optimization — all-pairs + a global-window rank over the ~20k
    // resulting pairs is deliberate and stays driver-safe at any corpus
    // size BECAUSE of the cap; the uncapped full-corpus path is d22's
    // banded LSH.
    "d10_embedding_neardup" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d).where(col("vec_id") < 200)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("sim", call_function("qcosine", col("va"), col("vb")))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("sim").desc, col("id_a"), col("id_b"))).cast("long"))
          .where(col("rnk") <= 20)
          .select(col("rnk"), col("id_a"), col("id_b"), col("sim"),
                  (col("sim") >= 0.9).as("is_dup"))
          .orderBy("rnk")
      },
      oracle = Some(
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(${dotSql("a.embedding", "b.embedding")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("a.embedding")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("b.embedding")} AS DOUBLE))) AS sim
              FROM e a, e b WHERE a.vec_id < b.vec_id),
            r AS (
              SELECT CAST(row_number() OVER (ORDER BY sim DESC, id_a, id_b) AS BIGINT) AS rnk,
                     id_a, id_b, sim FROM p)
            SELECT rnk, id_a, id_b, sim, sim >= 0.9 AS is_dup
            FROM r WHERE rnk <= 20 ORDER BY rnk"""),
      doc = "embedding-cosine near-dup pairs (dedup-flavored similarity)"
    ),

    // Cross-modal curation: the text table and the vector table decide a
    // keep/drop verdict TOGETHER — too-short documents drop on the text
    // side, embedding near-dups (>= 0.9 cosine, keep-lowest-id) drop on
    // the vector side. The join between modalities is a key equi-join
    // (doc_id = vec_id), so at scale the verdict computation co-partitions
    // with either table; the pair search stays the bounded d10 shape.
    "v5_crossmodal_curation" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d).where(col("vec_id") < 200)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        val dups = a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("sim", call_function("qcosine", col("va"), col("vb")))
          .where(col("sim") >= 0.9)
          .select(col("id_b").as("doc_id")).distinct()
          .withColumn("is_dup", lit(true))
        Tables.documents(s, d).where(col("doc_id") < 200)
          .select(col("doc_id"), col("n_chars"))
          .join(dups, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            (col("n_chars") >= 100).as("ok_len"),
            col("is_dup").isNull.as("ok_dup"),
            (col("n_chars") >= 100 && col("is_dup").isNull).as("keep"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(${dotSql("a.embedding", "b.embedding")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("a.embedding")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("b.embedding")} AS DOUBLE))) AS sim
              FROM e a, e b WHERE a.vec_id < b.vec_id),
            dups AS (SELECT DISTINCT id_b AS doc_id FROM p WHERE sim >= 0.9)
            SELECT d.doc_id, d.n_chars >= 100 AS ok_len,
                   dups.doc_id IS NULL AS ok_dup,
                   (d.n_chars >= 100 AND dups.doc_id IS NULL) AS keep
            FROM documents d LEFT JOIN dups USING (doc_id)
            WHERE d.doc_id < 200 ORDER BY d.doc_id"""),
      doc = "cross-modal curation: text-length + embedding-near-dup joint verdict"
    ),

    // Embedding preprocessing: mean-centered cosine — the retrieval-side
    // normalization that removes the corpus's common direction before
    // similarity ranking. Exactness trick: with quantized q and per-dim
    // integer sums s over n rows, the centered vector scales to
    // c = n*q - s (still exact int64; cosine is scale-invariant), so NO
    // division touches the vector math and both engines agree bit-for-bit.
    // The per-dim sum table is a 64-row control aggregate (one scan +
    // 8 KiB collect, like the IVF centroids); at 100 TB the mean is the
    // cheap pass, the ranking joins stay the bounded v1 shape.
    "v6_centered_cosine" -> Q(
      fn = (s, d) => {
        val e = Tables.embeddings(s, d)
          .where(wellFormedVec(col("embedding")) && size(col("embedding")) === lit(Dim))
        val q = e.select(col("vec_id"), transform(col("embedding"), x => qElem(x)).as("q"))
        // driver-sized: one row per embedding dimension (Dim = 64)
        val statRows = q.select(posexplode(col("q")))
          .groupBy("pos").agg(sum("col").as("sm"), count(lit(1)).as("n"))
          .collect()
        // empty corpus: no stat rows — center by the zero vector (the
        // result is empty anyway; this must not throw on head of Nil)
        val n = statRows.headOption.map(_.getAs[Long]("n")).getOrElse(0L)
        val dimSum = statRows.map(r => r.getAs[Int]("pos") -> r.getAs[Long]("sm")).toMap
        val sums = typedlit((0 until Dim).map(dimSum.getOrElse(_, 0L)))
        def ldot(a: Column, b: Column): Column =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
        val centered = q
          .withColumn("c", zip_with(col("q"), sums, (x, sv) => x * lit(n) - sv))
          .withColumn("n2", ldot(col("c"), col("c")))
        val probes = centered.where(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("c").as("qc"), col("n2").as("qn2"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        centered.select(col("vec_id").as("neighbor_id"), col("c"), col("n2"))
          .join(broadcast(probes), col("query_id") =!= col("neighbor_id"))
          // nullif: an all-identical corpus centers every vector to the
          // ZERO vector (c = n*q - s = 0) — cosine is then undefined, not
          // an ANSI divide-by-zero crash
          .withColumn("sim", ldot(col("qc"), col("c")).cast("double") /
            nullif(sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double")),
                   lit(0.0)))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .where(col("rnk") <= 3)
          .select("query_id", "neighbor_id", "rnk", "sim")
          .orderBy("query_id", "rnk")
      },
      oracle = Some(
        s"""WITH q AS (
              SELECT vec_id, list_transform(range(1, ${Dim + 1}),
                       i -> ${qElemSql("embedding[i]")}) AS q
              FROM embeddings WHERE ${wellFormedVecSql("embedding")} AND len(embedding) = $Dim),
            dimsum AS (
              SELECT i, CAST(sum(q[i]) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
              FROM q, range(1, ${Dim + 1}) t(i)
              GROUP BY i),
            st AS (SELECT max(n) AS n, list(s ORDER BY i) AS sl FROM dimsum),
            c AS (
              SELECT vec_id,
                     list_transform(range(1, ${Dim + 1}), i -> q[i] * n - sl[i]) AS c
              FROM q, st),
            cn AS (
              SELECT vec_id, c,
                     CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS n2
              FROM c),
            p AS (
              SELECT pr.vec_id AS query_id, nb.vec_id AS neighbor_id,
                     CAST(list_sum(list_transform(range(1, ${Dim + 1}),
                            i -> pr.c[i] * nb.c[i])) AS BIGINT)::DOUBLE /
                       NULLIF(sqrt(pr.n2::DOUBLE) * sqrt(nb.n2::DOUBLE), 0) AS sim
              FROM cn pr JOIN cn nb ON pr.vec_id < 5 AND pr.vec_id <> nb.vec_id),
            r AS (
              SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
              FROM p)
            SELECT query_id, neighbor_id, rnk, sim FROM r WHERE rnk <= 3
            ORDER BY query_id, rnk"""),
      doc = "mean-centered cosine top-k (exact integer centering, no division)"
    ),

    // Pairwise similarity histogram of a vector sample — demonstrates the
    // self-join shape with an exact, order-independent aggregate output.
    "v2_sim_histogram" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d).where(col("vec_id") < 100)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("sim", call_function("qcosine", col("va"), col("vb")))
          .withColumn("bucket", floor(col("sim") * 10).cast("long"))
          .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
          .orderBy("bucket")
      },
      oracle = Some(
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(${dotSql("a.embedding", "b.embedding")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("a.embedding")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("b.embedding")} AS DOUBLE))) AS sim
              FROM e a, e b WHERE a.vec_id < b.vec_id)
            SELECT CAST(floor(sim * 10) AS BIGINT) AS bucket, count(*) AS n_pairs
            FROM p GROUP BY bucket ORDER BY bucket"""),
      doc = "pairwise cosine distribution over a sample"
    ),

    // kNN classification — the standard downstream consumer of the ANN
    // index: predict each probe's label as the majority label of its 10
    // exact-cosine neighbors (deterministic tie-break: more votes, then
    // smaller label). Judged output includes the true label, so the
    // result doubles as a labeled-accuracy audit of the embedding space.
    // Scale shape: identical to v1 (broadcast probes, corpus streams
    // once); the vote is a per-probe aggregation over k rows.
    "v7_knn_classify" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
        val probes = e.where(col("vec_id") < 50)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
                  col("label").cast("long").as("true_label"))
        val corpus = e.select(col("vec_id").as("neighbor_id"),
                              col("embedding").as("cv"),
                              col("label").cast("long").as("nb_label"))
        val wTop = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        val wVote = Window.partitionBy("query_id").orderBy(col("votes").desc, col("nb_label"))
        corpus.join(broadcast(probes), col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
          .withColumn("rnk", row_number().over(wTop))
          .where(col("rnk") <= 10)
          .groupBy("query_id", "true_label", "nb_label")
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(wVote))
          .where(col("vr") === 1)
          .select(col("query_id"), col("true_label"),
                  col("nb_label").as("pred_label"), col("votes"),
                  (col("true_label") === col("nb_label")).as("correct"))
          .orderBy("query_id")
      },
      oracle = Some(
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                              CAST(label AS BIGINT) AS true_label
                       FROM embeddings WHERE vec_id < 50),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                         CAST(label AS BIGINT) AS nb_label
                  FROM embeddings),
            p AS (
              SELECT query_id, true_label, neighbor_id, nb_label,
                     CAST(${dotSql("qv", "cv")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("qv")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("cv")} AS DOUBLE))) AS sim
              FROM q, c WHERE query_id <> neighbor_id),
            topk AS (
              SELECT * FROM p
              QUALIFY row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) <= 10),
            votes AS (
              SELECT query_id, true_label, nb_label, count(*) AS votes
              FROM topk GROUP BY query_id, true_label, nb_label)
            SELECT query_id, true_label, nb_label AS pred_label, votes,
                   (true_label = nb_label) AS correct
            FROM votes
            QUALIFY row_number() OVER (PARTITION BY query_id
                      ORDER BY votes DESC, nb_label) = 1
            ORDER BY query_id"""),
      doc = "kNN majority-vote classification over exact cosine neighbors"
    ),

    // Binary embedding compression + Hamming search — the fourth ANN
    // variant (after brute-force v1, LSH-bucketed v3, IVF v4) and the
    // cheapest 100 TB pre-filter there is: the 64-float vector collapses
    // to a 32-bit sign signature (256 bytes -> 4 bytes, a 64x scan-size
    // reduction), candidate ranking is XOR + popcount on longs (pure
    // codegen integer ops, no float math, no shuffle of the corpus), and
    // only the top-50 Hamming survivors pay for exact cosine re-ranking.
    // Probes broadcast; the corpus streams once. Signature bits come from
    // the same fixed 32-plane table as d22's banding, so the oracle
    // reproduces them exactly from a literal VALUES table.
    "v8_hamming_topk" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
          .withColumn("sig", call_function("hyperplane_sig32", col("embedding")))
        val probes = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
                  col("sig").as("qsig"))
        val corpus = e.select(col("vec_id").as("neighbor_id"),
                              col("embedding").as("cv"), col("sig").as("csig"))
        val wH = Window.partitionBy("query_id")
          .orderBy(col("hamming"), col("neighbor_id"))
        val wS = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        corpus.join(broadcast(probes), col("query_id") =!= col("neighbor_id"))
          .withColumn("hamming",
            bit_count(col("qsig").bitwiseXOR(col("csig"))).cast("long"))
          .withColumn("hrnk", row_number().over(wH))
          .where(col("hrnk") <= 50)
          .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
          .withColumn("rnk", row_number().over(wS).cast("long"))
          .where(col("rnk") <= 5)
          .select("query_id", "neighbor_id", "rnk", "hamming", "sim")
          .orderBy("query_id", "rnk")
      },
      oracle = Some {
        s"""
        WITH $wideSigCtes,
        q AS (
          SELECT e.vec_id AS query_id, e.embedding AS qv, w.sig AS qsig
          FROM embeddings e JOIN wsig w USING (vec_id) WHERE e.vec_id < 10),
        c AS (
          SELECT e.vec_id AS neighbor_id, e.embedding AS cv, w.sig AS csig
          FROM embeddings e JOIN wsig w USING (vec_id)),
        h AS (
          SELECT query_id, neighbor_id, qv, cv,
                 CAST(bit_count(xor(qsig, csig)) AS BIGINT) AS hamming
          FROM q, c WHERE query_id <> neighbor_id),
        cand AS (
          SELECT * FROM h
          QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming, neighbor_id) <= 50),
        p AS (
          SELECT query_id, neighbor_id, hamming,
                 CAST(${dotSql("qv", "cv")} AS DOUBLE) /
                   (sqrt(CAST(${norm2Sql("qv")} AS DOUBLE)) *
                    sqrt(CAST(${norm2Sql("cv")} AS DOUBLE))) AS sim
          FROM cand),
        r AS (
          SELECT query_id, neighbor_id, hamming, sim,
                 CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
          FROM p)
        SELECT query_id, neighbor_id, rnk, hamming, sim
        FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
      },
      doc = "binary-signature Hamming pre-filter + exact cosine re-rank (ANN variant 4)"
    ),

    // Hard-negative mining — the contrastive-training data op: for each
    // anchor, the most-similar vectors with a DIFFERENT label (the
    // negatives that actually move the loss). Same scan budget and
    // broadcast shape as v1/v7: anchors broadcast, corpus streams once,
    // the label-mismatch predicate rides the join condition so same-label
    // rows never reach the ranking window.
    "v9_hard_negatives" -> Q(
      fn = (s, d) => {
        graft.GraftExtensions.register(s)
        val e = Tables.embeddings(s, d)
        val anchors = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
                  col("label").cast("long").as("anchor_label"))
        val corpus = e.select(col("vec_id").as("neighbor_id"),
                              col("embedding").as("cv"),
                              col("label").cast("long").as("neg_label"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        corpus.join(broadcast(anchors),
                    col("anchor_label") =!= col("neg_label"))
          .withColumn("sim", call_function("qcosine", col("qv"), col("cv")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .where(col("rnk") <= 5)
          .select("query_id", "anchor_label", "neighbor_id", "neg_label",
                  "rnk", "sim")
          .orderBy("query_id", "rnk")
      },
      oracle = Some(
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                              CAST(label AS BIGINT) AS anchor_label
                       FROM embeddings WHERE vec_id < 20),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                         CAST(label AS BIGINT) AS neg_label
                  FROM embeddings),
            p AS (
              SELECT query_id, anchor_label, neighbor_id, neg_label,
                     CAST(${dotSql("qv", "cv")} AS DOUBLE) /
                       (sqrt(CAST(${norm2Sql("qv")} AS DOUBLE)) *
                        sqrt(CAST(${norm2Sql("cv")} AS DOUBLE))) AS sim
              FROM q, c WHERE anchor_label <> neg_label),
            r AS (
              SELECT query_id, anchor_label, neighbor_id, neg_label, sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
              FROM p)
            SELECT query_id, anchor_label, neighbor_id, neg_label, rnk, sim
            FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""),
      doc = "hard-negative mining: top-k most-similar cross-label vectors per anchor"
    ),

    // Product quantization ANN — the fifth ANN family (after brute v1,
    // hyperplane-LSH v3, IVF v4, Hamming v8) and the one production
    // vector stores actually run at 100 TB: each 64-d vector collapses
    // to 8 one-byte codes (one per 8-d subspace), and query-to-corpus
    // distance becomes 8 table lookups into a per-query ADC table — no
    // float math per candidate at all. Codebook here is the sampled
    // variant (the first 16 corpus vectors' subvectors, integer-
    // quantized), which keeps every encode/ADC distance an exact int64
    // and the whole pipeline oracle-checkable. Scale shape: codebook and
    // ADC tables are tiny broadcasts; encoding is one corpus scan with a
    // (vec, subspace)-keyed min; scoring shuffles only (ids, codes).
    "v10_pq_ann" -> Q(
      fn = (s, d) => {
        val NSub = 8; val SubDim = 8; val NCode = 16; val NProbes = 10; val K = 5
        graft.GraftExtensions.register(s)
        val q = Tables.embeddings(s, d)
          // PQ's L2 space: malformed or wrong-dimension vectors skip (a
          // zero vector is a legal L2 point, so no norm test here)
          .where(wellFormedVec(col("embedding")) && size(col("embedding")) === lit(Dim))
          .select(col("vec_id"), transform(col("embedding"), x => qElem(x)).as("qv"))
        // one row per (vector, subspace): the 8-d integer subvector
        val subs = q.select(col("vec_id"),
            posexplode(array((0 until NSub).map(i =>
              slice(col("qv"), i * SubDim + 1, SubDim)): _*)).as(Seq("sub", "svec")))
          .persist()
        PipelineCache.retain(subs)
        // one codegen'd static call per (subvector, codeword) pair — the
        // HOF zip_with formulation paid lambda machinery in the hot path
        def l2(a: Column, b: Column): Column =
          call_function("l2_long", a, b)
        // nearest codeword per (vector, subspace), ties to the low code
        def encode(df: DataFrame, cb: DataFrame): DataFrame =
          df.join(broadcast(cb), "sub")
            .withColumn("dist", l2(col("svec"), col("cvec")))
            .groupBy("vec_id", "sub")
            .agg(min_by(col("code"), struct(col("dist"), col("code"))).as("code"))
        // codebook: seeded from the first 16 vectors' subvectors, then ONE
        // Lloyd refinement per subspace (assign -> per-dim integer mean).
        // On the uniform synthetic corpus (PQ's worst case) the refinement
        // lifts recall@5 vs exact L2 from 0.16 to 0.32 — asserted in
        // SimilaritySpec. Means use round(avg) — exact int64 sums make the
        // division bit-identical across engines, v4's proven discipline.
        val cb0 = subs.where(col("vec_id") < NCode)
          .select(col("vec_id").as("code"), col("sub"), col("svec").as("cvec"))
        val cb1 = encode(subs, cb0).join(subs, Seq("vec_id", "sub"))
          .groupBy("sub", "code")
          .agg(array((1 to SubDim).map(i =>
            round(avg(element_at(col("svec"), i))).cast("long")): _*).as("cvec"))
        val enc = encode(subs, cb1)
        // ADC tables: query-subvector -> codeword distances (tiny)
        val adc = subs.where(col("vec_id") < NProbes)
          .select(col("vec_id").as("query_id"), col("sub"), col("svec"))
          .join(broadcast(cb1), "sub")
          .withColumn("pdist", l2(col("svec"), col("cvec")))
          .select("query_id", "sub", "code", "pdist")
        val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
        enc.join(broadcast(adc), Seq("sub", "code"))
          .where(col("query_id") =!= col("vec_id"))
          .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
          .agg(sum("pdist").as("adc_dist"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .where(col("rnk") <= K)
          .select("query_id", "neighbor_id", "rnk", "adc_dist")
          .orderBy("query_id", "rnk")
      },
      oracle = Some(s"""
        WITH q AS (
          SELECT vec_id, list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings WHERE ${wellFormedVecSql("embedding")} AND len(embedding) = $Dim),
        subs AS (
          SELECT vec_id, sub, qv[sub*8+1 : sub*8+8] AS svec
          FROM q, (SELECT unnest(range(0, 8)) AS sub)),
        cb0 AS (
          SELECT vec_id AS code, sub, svec AS cvec FROM subs WHERE vec_id < 16),
        enc0 AS (
          SELECT s.vec_id, s.sub, k.code,
                 list_sum(list_transform(range(1, 9),
                   i -> (s.svec[i] - k.cvec[i]) * (s.svec[i] - k.cvec[i]))) AS dist
          FROM subs s JOIN cb0 k USING (sub)
          QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                                     ORDER BY dist, k.code) = 1),
        cb1 AS (
          SELECT e0.sub, e0.code,
                 list_value(
                   CAST(round(avg(s.svec[1])) AS BIGINT), CAST(round(avg(s.svec[2])) AS BIGINT),
                   CAST(round(avg(s.svec[3])) AS BIGINT), CAST(round(avg(s.svec[4])) AS BIGINT),
                   CAST(round(avg(s.svec[5])) AS BIGINT), CAST(round(avg(s.svec[6])) AS BIGINT),
                   CAST(round(avg(s.svec[7])) AS BIGINT), CAST(round(avg(s.svec[8])) AS BIGINT)) AS cvec
          FROM enc0 e0 JOIN subs s ON s.vec_id = e0.vec_id AND s.sub = e0.sub
          GROUP BY e0.sub, e0.code),
        enc AS (
          SELECT s.vec_id, s.sub, k.code,
                 list_sum(list_transform(range(1, 9),
                   i -> (s.svec[i] - k.cvec[i]) * (s.svec[i] - k.cvec[i]))) AS dist
          FROM subs s JOIN cb1 k USING (sub)
          QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                                     ORDER BY dist, k.code) = 1),
        adc AS (
          SELECT s.vec_id AS query_id, s.sub, k.code,
                 list_sum(list_transform(range(1, 9),
                   i -> (s.svec[i] - k.cvec[i]) * (s.svec[i] - k.cvec[i]))) AS pdist
          FROM subs s JOIN cb1 k USING (sub)
          WHERE s.vec_id < 10),
        score AS (
          SELECT a.query_id, e.vec_id AS neighbor_id,
                 CAST(sum(a.pdist) AS BIGINT) AS adc_dist
          FROM enc e JOIN adc a ON a.sub = e.sub AND a.code = e.code
          WHERE e.vec_id <> a.query_id
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, rnk, adc_dist FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rnk
          FROM score)
        WHERE rnk <= 5 ORDER BY query_id, rnk"""),
      doc = "product-quantization ANN: 8x1-byte codes, ADC lookup distance (ANN variant 5)"
    )
  )
}
