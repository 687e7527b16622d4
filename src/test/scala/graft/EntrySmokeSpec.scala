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

  // A join with no equality conjunct plans as BroadcastNestedLoopJoin or
  // CartesianProduct — per-pair work quadratic in the inputs. Legitimate
  // only when at least one side is bounded by construction (a sample cap,
  // a <= 20 top-k, a 1-row scalar). Same contract as the window audit:
  // every occurrence must carry its bound here.
  private val justifiedNonEquiJoins: Map[String, String] = Map(
    "d7_simhash" -> "all-pairs Hamming over the persisted ~75-row planted-dup sample (bounded-sample contract)",
    "d7b_simhash_portable" -> "all-pairs Hamming over the persisted ~75-row planted-dup sample (bounded-sample contract)",
    "d13_levenshtein" -> "edit-distance DP over the ~20-row planted-dup sample (bounded-sample contract)",
    "d8_ngram_jaccard" -> "all-pairs baseline over the 60-doc sample (bounded-sample contract; banded path is d6)",
    "d33_containment" -> "all-pairs over the 60-doc sample (bounded-sample contract)",
    "d10_embedding_neardup" -> "all-pairs over the 200-vector cap (bounded-sample contract; full-corpus path is d22)",
    "v1_cosine_topk" -> "brute-force baseline: bounded probe set broadcasts, corpus streams once",
    "v2_sim_histogram" -> "bounded probe set broadcasts against the streaming corpus",
    "v5_crossmodal_curation" -> "dup detection reuses d10's 200-vector bounded-sample shape",
    "v6_centered_cosine" -> "bounded probe set broadcasts against the streaming corpus",
    "v7_knn_classify" -> "probes broadcast, corpus streams once (pinned in PlanQualitySpec)",
    "v8_hamming_topk" -> "probes broadcast, signature+popcount corpus streams once (pinned in PlanQualitySpec)",
    "v9_hard_negatives" -> "anchors broadcast, corpus streams once (pinned in PlanQualitySpec)")

  test("non-equi joins only appear on the allowlist, justified by a bounded side") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan
      val n = plan.collectWithSubqueries {
        case j: Join if !j.condition.exists(c =>
          conjuncts(c).exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _                             => false
          })
          // a side with a STATICALLY known row bound (grouping-less
          // aggregate = 1 row, limit(k) = k rows) makes the nested loop
          // linear — the ubiquitous scalar-broadcast cross join. Sides
          // bounded only semantically (a sample predicate) don't set
          // maxRows and must justify themselves on the allowlist.
          && !j.left.maxRows.exists(_ <= 128)
          && !j.right.maxRows.exists(_ <= 128) => j
      }.size
      if (n > 0) Some(name -> n) else None
    }.toMap
    val unlisted = offenders.keySet -- justifiedNonEquiJoins.keySet
    val stale = justifiedNonEquiJoins.keySet -- offenders.keySet
    assert(unlisted.isEmpty,
      s"unjustified non-equi joins (quadratic unless a side is bounded): ${unlisted.toSeq.sorted.map(n => s"$n(x${offenders(n)})").mkString(", ")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
