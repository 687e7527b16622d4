package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Codegen vs interpreted parity for every registered custom expression.
  *
  * Spark evaluates an Expression through EITHER the generated code
  * (`doGenCode`) or the interpreted path (`eval`), and silently falls
  * back to interpreted in real situations: codegen compile failures
  * (64KB method limit on wide generated functions), expressions hosted
  * by non-codegen operators, and driver-side constant folding. If the
  * two paths disagree, results change depending on runtime conditions —
  * invisible at test scale, live at cluster scale where fallback is
  * likelier. This spec runs the SAME projection over fixture rows (plus
  * null edge rows) under forced NO_CODEGEN and forced CODEGEN_ONLY and
  * requires byte-identical JSON output.
  */
class CodegenParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Collect `sql` projected over `view` in both evaluation modes. */
  private def bothModes(df: org.apache.spark.sql.DataFrame): (Seq[String], Seq[String]) = {
    def collectWith(wholeStage: String, factoryMode: String): Seq[String] = {
      val conf = spark.conf
      val ws0 = conf.get("spark.sql.codegen.wholeStage")
      val fm0 = conf.get("spark.sql.codegen.factoryMode")
      try {
        conf.set("spark.sql.codegen.wholeStage", wholeStage)
        conf.set("spark.sql.codegen.factoryMode", factoryMode)
        df.toJSON.collect().toSeq
      } finally {
        conf.set("spark.sql.codegen.wholeStage", ws0)
        conf.set("spark.sql.codegen.factoryMode", fm0)
      }
    }
    (collectWith("false", "NO_CODEGEN"), collectWith("true", "CODEGEN_ONLY"))
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val (interp, codegen) = bothModes(df)
    assert(interp.size == codegen.size,
      s"$what: row count differs interpreted=${interp.size} codegen=${codegen.size}")
    interp.zip(codegen).zipWithIndex.foreach { case ((i, c), idx) =>
      assert(i == c, s"$what: row $idx diverges\ninterpreted: $i\ncodegen:     $c")
    }
  }

  test("text expressions: eval == doGenCode over documents + null edge rows") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val base = spark.read.parquet(s"${SparkTestBase.Sf0001}/documents.parquet")
      .selectExpr("doc_id", "text")
    val edges = Seq((9000001L, null.asInstanceOf[String]), (9000002L, ""),
                    (9000003L, " "), (9000004L, "one"))
      .toDF("doc_id", "text")
    val df = base.unionByName(edges).selectExpr(
      "doc_id",
      "cassandra_token(doc_id) AS tok_id",
      "cassandra_token(text) AS tok_text",
      "portable_word_hashes(text) AS wh",
      "minhash_sig(portable_word_hashes(text)) AS sig",
      "shingle_hashes(text) AS sh",
      "rolling_fingerprint(text) AS rf",
      "jaccard_sorted(sort_array(shingle_hashes(text)), " +
        "sort_array(shingle_hashes(substr(text, 1, 50)))) AS js"
    ).orderBy("doc_id")
    assertParity(df, "text expression family")
  }

  test("vector expressions: eval == doGenCode over embeddings + null edge rows") {
    graft.GraftExtensions.register(spark)
    val base = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
    val edges = spark.sql(
      "SELECT CAST(9000001 AS BIGINT) AS vec_id, CAST(NULL AS ARRAY<FLOAT>) AS embedding")
    val df = base.unionByName(edges).selectExpr(
      "vec_id",
      "hyperplane_bucket(embedding) AS hb",
      "hyperplane_sig32(embedding) AS h32",
      "hyperplane_sig64(embedding) AS h64",
      "qnorm2(embedding) AS n2",
      // qdot_long pairs a float vector with a pre-quantized long vector
      // (centroid-side); l2_long takes two long vectors — synthesize the
      // quantized sides from the embedding itself
      "qdot_long(embedding, transform(reverse(embedding), x -> CAST(x * 1000000 AS BIGINT))) AS qd",
      "l2_long(transform(embedding, x -> CAST(x * 1000000 AS BIGINT)), " +
        "transform(reverse(embedding), x -> CAST(x * 1000000 AS BIGINT))) AS l2",
      "qcosine(embedding, reverse(embedding)) AS qc"
    ).orderBy("vec_id")
    assertParity(df, "vector expression family")
  }
}
