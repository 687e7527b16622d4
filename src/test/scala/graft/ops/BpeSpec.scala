package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE representation invariants on adversarial vocab the fixture's
  * [a-z]+ prose never contains. The d36/d41 oracles hash-prove the
  * pipeline against DuckDB on fixture words; these pins prove the
  * MERGE RULE itself — the two-greedy-pass replace over the
  * spaced-symbol encoding — cannot corrupt a word:
  *
  *  1. symbol concatenation always reconstructs the word (losslessness),
  *  2. no empty symbols are ever produced (the ' a b ' -> ' ab '
  *     rewrite must consume exactly one delimiter),
  *  3. the documented pass bound: adjacent (a,b) runs of <= 4 repeats
  *     are FULLY merged by the two passes (longer runs may legally
  *     leave a residue — both engines apply the identical rule).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import TextOps.Bpe

  private def applyAB(words: Seq[String]): Map[String, String] = {
    import spark.implicits._
    val t0 = words.toDF("word")
      .select(col("word"), Bpe.spacedTok(col("word")).as("tok"), lit(1L).as("cnt"))
    val m = Seq(("a", "b", 1L)).toDF("a", "b", "c")
    Bpe.applyMerge(t0, m)
      .select("word", "tok").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def invariants(word: String, tok: String): Unit = {
    assert(tok.startsWith(" ") && tok.endsWith(" "), s"'$word' -> '$tok': delimiter shape")
    assert(!tok.contains("  "), s"'$word' -> '$tok': empty symbol (double space)")
    assert(tok.trim.split(" ").mkString("") == word,
      s"'$word' -> '$tok': symbol concatenation must reconstruct the word")
  }

  test("merge application is lossless and residue-free up to 4 adjacent repeats") {
    val crafted = Seq(
      "ab", "abab", "ababab", "abababab",      // 1..4 adjacent (a,b) repeats
      "aab", "abb", "aabb",                    // run starts/ends mid-symbol
      "abxab", "xababy",                       // separated + embedded runs
      "ba", "bbaa", "",                        // no-op shapes (+ empty word)
      "aaaa", "aaaaa", "bbbb"                  // same-char runs ((a,b) no-op)
    )
    val toks = applyAB(crafted.filter(_.nonEmpty))
    crafted.filter(_.nonEmpty).foreach { w =>
      val tok = toks(w)
      invariants(w, tok)
      // max adjacent "ab" repeats <= 4 -> the two passes leave no ' a b '
      val maxRun = "(?:ab)+".r.findAllIn(w).map(_.length / 2).maxOption.getOrElse(0)
      if (maxRun <= 4)
        assert(!tok.contains(" a b "),
          s"'$w' -> '$tok': run of $maxRun <= 4 must be fully merged")
    }
  }

  test("losslessness holds on random {a,b} words (scalacheck)") {
    val wordGen = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    // batch the samples into ONE Spark job: collect a deterministic set
    // of generated words first, then run the merge over all of them
    val words = (1 to 150).flatMap(i => wordGen(Gen.Parameters.default,
      org.scalacheck.rng.Seed(0xb9e5L + i))).filter(_.nonEmpty).distinct
    assert(words.size > 40, "generator must produce a real corpus")
    val toks = applyAB(words)
    words.foreach(w => invariants(w, toks(w)))
  }

  test("best() tie-breaks deterministically on (count desc, a, b)") {
    import spark.implicits._
    // two pairs tied at the top count: (b,a) must win over (b,b); a
    // higher count beats both regardless of symbol order
    val pc = Seq(("b", "b", 5L), ("b", "a", 5L), ("z", "a", 7L))
      .toDF("a", "b", "c")
    val top = Bpe.best(pc).collect().map(r => (r.getString(0), r.getString(1)))
    assert(top.toSeq == Seq(("z", "a")))
    val tied = Bpe.best(pc.where(col("c") === 5)).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(tied.toSeq == Seq(("b", "a")), "ties break on a then b ascending")
  }
}
