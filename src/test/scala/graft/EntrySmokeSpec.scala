package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry returns rows, every registered query runs
  * at sf0.001, and every oracle key points at a real query.
  */
class EntrySmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, SparkTestBase.Sf0001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // A Window with an empty partitionSpec executes as ONE task holding the
  // whole input — the classic silent scale-killer. Every occurrence on the
  // surface must be justified here by a bounded input (the window consumes
  // an aggregate- or sample-sized frame, never a raw table). A new query
  // that grows an unlisted global window fails this test and must either
  // partition the window or justify itself on this list.
  private val justifiedGlobalWindows: Map[String, String] = Map(
    "a25_gini" -> "exact-Gini global rank is the query's definition; a25b is the documented no-global-rank scale path",
    "a25b_gini_bucketed" -> "cumulative Lorenz window over <= 100 equal-width buckets",
    "d8_ngram_jaccard" -> "rank over the bounded 60-doc sample's pair set (bounded-sample contract)",
    "d33_containment" -> "rank over the bounded 60-doc sample's pair set (bounded-sample contract)",
    "d10_embedding_neardup" -> "rank over the 200-vector cap's pair set (bounded-sample contract)",
    "d22_embedding_lsh_neardup" -> "rnk window runs AFTER orderBy().limit(20) - TakeOrderedAndProject does the distributed top-k; the window sees 20 rows",
    "d22b_embedding_lsh_wide" -> "rnk window runs AFTER orderBy().limit(20), same as d22",
    "d51_priority_sample" -> "rnk window runs AFTER orderBy().limit(20), same as d22",
    "d48_unimax_epochs" -> "waterfill rank/prefix windows over the languages-sized aggregate",
    "q23_mom_growth" -> "lag over the months-sized aggregate (bounded by calendar)",
    "w3_moving_revenue" -> "7-day frame over the days-sized aggregate (bounded by calendar)")

  test("global (unpartitioned) windows only appear on the allowlist, justified") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan
      val n = plan.collectWithSubqueries {
        case w: Window if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(name -> n) else None
    }.toMap
    val unlisted = offenders.keySet -- justifiedGlobalWindows.keySet
    val stale = justifiedGlobalWindows.keySet -- offenders.keySet
    assert(unlisted.isEmpty,
      s"unjustified global windows (single-task at scale): ${unlisted.toSeq.sorted.map(n => s"$n(x${offenders(n)})").mkString(", ")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
