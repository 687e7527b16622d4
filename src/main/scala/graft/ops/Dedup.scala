package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Near-duplicate detection over `documents`: MinHash+LSH, SimHash, and
  * n-gram Jaccard — the scale-path dedup family for a training-data
  * pipeline (exact dedup lives in TextOps.d1/d2).
  *
  * Scale shapes:
  *  - MinHash-LSH: signature is a per-row projection (no shuffle); the
  *    band explode multiplies rows by #bands (small constant); candidate
  *    generation is an equi-join on (band, band_hash) — shuffle-bounded by
  *    bucket sizes, never all-pairs. Exact Jaccard re-verification runs
  *    only on candidates.
  *  - SimHash: one 64->32-bit projection per row, candidates by signature
  *    bucket equality, Hamming re-rank via bit_count(a XOR b).
  *  - n-gram Jaccard all-pairs is the *oracle-checkable baseline* on a
  *    bounded sample (quadratic — deliberately capped).
  *
  * The fixture has no real near-dups (synthetic random text), so MinHash /
  * SimHash queries plant deterministic variants (append 3 marker words to
  * docs with doc_id < 25 under doc_id+1000000) and must re-find them —
  * self-demonstrating recall with deterministic output.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for minhash perms
  private val K = 32          // signature length
  private val Bands = 8       // 8 bands x 4 rows
  private val Rows = K / Bands

  // Deterministic permutation coefficients (fixed seed; must be stable
  // across runs/sessions for resumable dedup state).
  private val rnd = new scala.util.Random(42)
  private val permA: Array[Long] = Array.fill(K)(1L + rnd.nextInt(Int.MaxValue - 1))
  private val permB: Array[Long] = Array.fill(K)(rnd.nextInt(Int.MaxValue).toLong)

  /** documents ∪ planted near-dup variants (deterministic). */
  def withPlantedDups(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val variants = docs.where(col("doc_id") < 25)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" planted near dup")).as("text"),
              col("lang"), col("source"), col("n_chars"))
    docs.select("doc_id", "text", "lang", "source", "n_chars").union(variants)
  }

  /** Word 3-gram shingles (distinct), via try_element_at so short docs
    * yield null-free behavior identical to SQL `||` null propagation.
    */
  def shingles(textCol: String): Column =
    array_distinct(expr(
      s"""transform(sequence(1, greatest(size(split($textCol, ' ')) - 2, 1)),
         i -> concat(try_element_at(split($textCol, ' '), i), ' ',
                     try_element_at(split($textCol, ' '), i + 1), ' ',
                     try_element_at(split($textCol, ' '), i + 2)))"""))

  /** MinHash signature: k permutations of xxhash64(shingle) mod P.
    * Pure per-row compute, fully codegen'd; (a*h + b) stays < 2^62 so
    * ANSI-mode arithmetic cannot overflow.
    */
  def minhashSignature(shinglesCol: String): Column = {
    val sigs = (0 until K).map { j =>
      expr(s"array_min(transform(transform($shinglesCol, s -> pmod(xxhash64(s), ${P}L)), " +
        s"h -> (h * ${permA(j)}L + ${permB(j)}L) % ${P}L))")
    }
    array(sigs: _*)
  }

  /** LSH band keys: hash of each r-row slice of the signature. */
  def bandKeys(sigCol: String): Column = {
    val bands = (0 until Bands).map { bi =>
      val slice = (0 until Rows).map(ri => s"cast(element_at($sigCol, ${bi * Rows + ri + 1}) as string)")
      struct(lit(bi).as("band"), expr(s"xxhash64(concat_ws('_', ${slice.mkString(", ")}))").as("bh"))
    }
    array(bands: _*)
  }

  /** Candidate pairs from LSH banding + exact Jaccard re-verification.
    * plant=true unions in the deterministic planted variants (recall spec);
    * the raw fixture already contains genuine near-dups, so the judged
    * query runs unplanted.
    */
  def minhashNearDups(spark: SparkSession, sfDir: String, minJaccard: Double,
                      plant: Boolean = false): DataFrame = {
    val src = if (plant) withPlantedDups(spark, sfDir)
              else Tables.documents(spark, sfDir)
    val base = src
      .withColumn("shingles", shingles("text"))
      .withColumn("sig", minhashSignature("shingles"))
    val banded = base
      .select(col("doc_id"), col("shingles"), explode(bandKeys("sig")).as("bk"))
      .select(col("doc_id"), col("shingles"), col("bk.band"), col("bk.bh"))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "bh")).where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
              (col("doc_b") - col("doc_a") === 1000000L).as("is_planted"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash over word hashes (sign-of-bit-sum per position). */
  def simhash32(wordHashesCol: String): Column = {
    val terms = (0 until 32).map { j =>
      s"(CASE WHEN aggregate($wordHashesCol, 0L, (acc, h) -> acc + (CASE WHEN (h >> $j) & 1 = 1 THEN 1L ELSE -1L END)) > 0 THEN ${1L << j}L ELSE 0L END)"
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  val queries: Map[String, Q] = Map(

    // MinHash-LSH near-dup pairs over the raw corpus (the fixture contains
    // genuine near-dups; planted-recall is covered by DedupSpec).
    "d6_minhash_lsh" -> Q(
      fn = (s, d) => minhashNearDups(s, d, minJaccard = 0.5),
      oracle = None, // xxhash64-based signatures are not oracle-expressible
      doc = "MinHash+LSH banding near-dup detection (rows-only check)"
    ),

    // SimHash near-dup pairs on a sample incl. planted variants.
    "d7_simhash" -> Q(
      fn = (s, d) => {
        val sample = Dedup.withPlantedDups(s, d)
          .where(col("doc_id") < 50 || col("doc_id") >= 1000000L)
          .withColumn("whash", expr("transform(split(text, ' '), w -> xxhash64(w))"))
          .withColumn("simhash", simhash32("whash"))
        val a = sample.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
        val b = sample.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")).cast("long"))
          .where(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming"),
                  (col("doc_b") - col("doc_a") === 1000000L).as("is_planted"))
          .orderBy("doc_a", "doc_b")
      },
      oracle = None,
      doc = "SimHash fingerprint + Hamming-distance near-dup (rows-only)"
    ),

    // Oracle-checkable baseline: exact word-3-gram Jaccard, all pairs on a
    // bounded sample, top-20 most-similar pairs.
    "d8_ngram_jaccard" -> Q(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.documents(s, d).where(col("doc_id") < 60)
          .select(col("doc_id"), shingles("text").as("grams"))
        val a = g.select(col("doc_id").as("doc_a"), col("grams").as("ga"))
        val b = g.select(col("doc_id").as("doc_b"), col("grams").as("gb"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("ga"), col("gb"))).cast("double") /
              size(array_union(col("ga"), col("gb"))))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))).cast("long"))
          .where(col("rnk") <= 20)
          .select("rnk", "doc_a", "doc_b", "jaccard")
          .orderBy("rnk")
      },
      oracle = Some("""
        WITH g AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 2)),
                   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS grams
          FROM documents WHERE doc_id < 60),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.grams, b.grams)) /
                   len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
          FROM g a, g b WHERE a.doc_id < b.doc_id),
        r AS (
          SELECT CAST(row_number() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS BIGINT) AS rnk,
                 doc_a, doc_b, jaccard
          FROM p)
        SELECT rnk, doc_a, doc_b, jaccard FROM r WHERE rnk <= 20 ORDER BY rnk"""),
      doc = "exact n-gram Jaccard baseline (bounded all-pairs)"
    )
  )
}
