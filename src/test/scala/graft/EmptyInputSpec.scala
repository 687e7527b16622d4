package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute — not just plan — against a
  * schema-correct but EMPTY fixture. At 100 TB, empty inputs are
  * routine (a filter matching nothing, an empty partition, a new
  * tenant); the sf-scaled oracles can never catch an operator that
  * crashes on them. The first sweep of this pin found five real
  * classes: ANSI division by a zero count (a9/a15), head() of an empty
  * stats collect (v6), schema inference over a dataless partitioned
  * layout (s10 and the t2 parquet sink), and a convergence check that
  * spun to its iteration cap because sum-over-empty is NULL (the
  * dupClusters family).
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def sweepDir(dst: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try { fn(spark, dst).collect(); None } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
      }
      graft.ops.PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
      r
    }

  private def sweep(n: Int): Seq[String] = {
    val dst = java.nio.file.Files.createTempDirectory(s"graft_trunc${n}_spec").toString
    graft.tools.EmptyInputProbe.writeTruncatedFixture(spark, SparkTestBase.Sf0001, dst, n)
    sweepDir(dst)
  }

  test("all registered queries execute on an empty fixture") {
    val failures = sweep(0)
    assert(failures.isEmpty,
      s"queries crashing on empty input:\n  ${failures.mkString("\n  ")}")
  }

  test("all registered queries execute on a single-row fixture") {
    // one row per table = the degenerate-statistics case: zero variance
    // (ulp-negative under mixed decimal/double arithmetic -> sqrt NaN),
    // a single group, no join partners, no pairs. First sweep caught
    // a19/a21 (undefined slope/r) and e8 (undefined z-score).
    val failures = sweep(1)
    assert(failures.isEmpty,
      s"queries crashing on single-row input:\n  ${failures.mkString("\n  ")}")
  }

  test("all registered queries execute on a hot-key skew fixture") {
    // ONE user owns every event, one language every document, one
    // customer every order — the 100 TB skew case the two-level windows
    // and MaxBucket caps exist for. This exercises the bucket boundary
    // stitches (one user's events span many time buckets), the hot-block
    // caps, and per-key sorts over a single giant key.
    val dst = java.nio.file.Files.createTempDirectory("graft_skew_spec").toString
    graft.tools.EmptyInputProbe.writeSkewedFixture(spark, SparkTestBase.Sf0001, dst)
    val failures = sweepDir(dst)
    assert(failures.isEmpty,
      s"queries crashing on hot-key-skew input:\n  ${failures.mkString("\n  ")}")
  }

  test("all registered queries execute on an adversarial-values fixture") {
    // scraped-corpus garbage is ROUTINE: NaN/Inf/huge metric values,
    // malformed JSON props, empty/whitespace/emoji/control-char texts,
    // zero/NaN/Inf/null-element/wrong-dimension embeddings, a
    // finite-but-unquantizable 1e20f component (passes any Inf/NaN
    // check, overflows round(x*1e4)->int64 — the well-formedness bound
    // sits at Long.MaxValue/Scale, not Float.MaxValue), negative
    // amounts. First sweep caught 15 failures in 8 classes: zero-length
    // division (d13/d14), Spark's DESCENDING sequence(1, n<1) indexing
    // empty arrays (shingles of sub-3-word docs), ANSI casts of
    // non-numeric JSON (e4) and out-of-envelope metrics (e8/s10),
    // NaN->int64 quantization across the ANN/centroid family (fixed via
    // a total qElem + cosine-space membership filters: Catalyst's
    // inferred isnotnull(transform(...)) constraints evaluate the
    // quantizer EAGERLY, before entry-filter conjuncts), zero-vector
    // cosine (v4/d46), PQ's strict subvector lengths (v10), Benford's
    // leading '-' on refunds (a24), and zero-revenue growth (q23).
    val dst = java.nio.file.Files.createTempDirectory("graft_adv_spec").toString
    graft.tools.EmptyInputProbe.writeAdversarialFixture(spark, SparkTestBase.Sf0001, dst)
    val failures = sweepDir(dst)
    assert(failures.isEmpty,
      s"queries crashing on adversarial-values input:\n  ${failures.mkString("\n  ")}")
  }

  test("all registered queries execute on an all-NULL-values fixture") {
    // every fixture column is declared nullable; ids kept, all other
    // values NULL — null text, null timestamps, null embeddings are
    // routine in scraped corpora. First sweep caught a typed-encoder
    // assert (c1, m3), an aggregator NPE + 0/0-NaN micro-cast overflow
    // (CentroidAgg: d46/d46b/v4), and concat_ws's null-skipping
    // silently SHIFTING columns in s15's line format.
    val dst = java.nio.file.Files.createTempDirectory("graft_null_spec").toString
    graft.tools.EmptyInputProbe.writeNulledFixture(spark, SparkTestBase.Sf0001, dst)
    val failures = sweepDir(dst)
    assert(failures.isEmpty,
      s"queries crashing on null-valued input:\n  ${failures.mkString("\n  ")}")
  }

  test("all registered queries execute on a monster-document fixture within the time budget") {
    // One ~500k-char document (and one ~300k-char single word, one
    // ~100k-char props blob) over a tiny corpus. Totality here is about TIME, not
    // just crashes: per-row state that is super-linear in document length
    // works at fixture scale and grinds forever on the web-scale outlier
    // document every real corpus contains. The probe that seeded this
    // sweep found d47 copying the exploded word array into every window
    // row (Generate requiredChildOutput — 20+ minutes of memcpy for one
    // 5M-char doc); linear engines finish this sweep in seconds per
    // query, so a generous per-query timeout separates the classes. The
    // timed-out query's Spark jobs are cancelled via its job group so one
    // offender cannot wedge the suite.
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dst = java.nio.file.Files.createTempDirectory("graft_monster_spec").toString
    graft.tools.EmptyInputProbe.writeMonsterFixture(spark, SparkTestBase.Sf0001, dst)
    val budget = 90.seconds
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val group = s"monster-$name"
      val fut = Future {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try fn(spark, dst).collect()
        finally spark.sparkContext.clearJobGroup()
      }
      val r = try { Await.result(fut, budget); None } catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          Some(s"$name: exceeded ${budget.toSeconds}s on a 500k-char document " +
            "(super-linear per-row state? check Generate carries / per-char loops)")
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
      }
      graft.ops.PipelineCache.release()
      spark.sharedState.cacheManager.clearCache()
      r
    }
    assert(failures.isEmpty,
      s"queries failing the monster-document sweep:\n  ${failures.mkString("\n  ")}")
  }
}
