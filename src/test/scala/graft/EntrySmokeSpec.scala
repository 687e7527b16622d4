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

  // An explicit broadcast() hint FORCES the build side to the driver and
  // every executor at every scale — AQE cannot back it out. A hint on a
  // frame whose cardinality grows with the corpus (a fact table, an
  // unbounded vocabulary) works at sf0.1 and OOMs the fleet at 100 TB.
  // Hints are legitimate only on frames bounded by construction: true
  // dimension tables (nation/region: fixed 25/5 rows at every TPC-H SF),
  // calendar-sized aggregates, sample caps, centroid/codebook tables.
  // Scale-growing sides must drop the hint and let AQE pick the strategy
  // from runtime sizes. Auto-exempt: sides with a static maxRows <= 4096
  // (limits, grouping-less aggregates), and sides reading ONLY the
  // SF-invariant dimension tables (nation is 25 rows and region 5 at
  // every TPC-H scale factor — broadcastable at 100 TB by definition).
  private val justifiedBroadcastHints: Map[String, String] = Map(
    "a23_chi_square" -> "row/column marginals: one row per lang / per source — category domains, not corpus-scaled",
    "d10_embedding_neardup" -> "the 200-vector sample cap (bounded-sample contract; stats can't see the semantic bound)",
    "d15_decontaminate" -> "benchmark eval-suite side: fixed suite size, independent of corpus scale",
    "a25_gini" -> "bucket-rank offset table: one row per revenue bucket (fixed 101-bucket constant, r17 two-pass exact rank)",
    "d16_pack_sequences" -> "per-bucket offset table: one row per packing bucket ~ corpus/capacity, 4+ orders below corpus; broadcast trades the O(corpus) shuffle for O(buckets) replication (pinned in PlanQualitySpec)",
    "d20_quality_percentile" -> "two-level rank offsets: one row per score bucket (fixed bucket count)",
    "e11_late_data_audit" -> "two-level running-max offsets: one row per (day bucket), calendar-bounded",
    "d27_heavy_hitters_cms" -> "the 4x1024 count-min sketch: fixed size by construction",
    "d43_quality_mix" -> "per-language sampling-rate table: language-domain bounded, not corpus-scaled",
    "e8_anomaly_zscore" -> "per-event-type moment stats: type-domain bounded (pinned in PlanQualitySpec)",
    "v1_cosine_topk" -> "bounded probe set broadcasts; corpus streams once (non-equi allowlist twin)",
    "v2_sim_histogram" -> "bounded probe set broadcasts; corpus streams once",
    "v3_ann_lsh" -> "probe bucket signatures: probe-set bounded",
    "v4_ann_ivf" -> "k centroids / probe cells: k is driver-sized by construction",
    "v5_crossmodal_curation" -> "200-vector bounded-sample side (d10's contract)",
    "v6_centered_cosine" -> "bounded probe set broadcasts; corpus streams once",
    "v7_knn_classify" -> "probes broadcast; corpus streams once (pinned in PlanQualitySpec)",
    "v8_hamming_topk" -> "probes broadcast; signature corpus streams once (pinned in PlanQualitySpec)",
    "v9_hard_negatives" -> "anchors broadcast; corpus streams once (pinned in PlanQualitySpec)",
    "v10_pq_ann" -> "256-codeword codebooks + per-subvector ADC tables: fixed size by construction (pinned in PlanQualitySpec)")

  test("broadcast hints only appear on bounded-by-construction sides, justified") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def hinted(j: Join): Seq[LogicalPlan] =
      (if (j.hint.leftHint.exists(_.strategy.contains(BROADCAST))) Seq(j.left) else Nil) ++
      (if (j.hint.rightHint.exists(_.strategy.contains(BROADCAST))) Seq(j.right) else Nil)
    def sfInvariantDims(side: LogicalPlan): Boolean = {
      val leaves = side.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case l: LogicalRelation => l.relation match {
          case f: HadoopFsRelation => f.location.rootPaths.forall { p =>
            p.getName == "nation.parquet" || p.getName == "region.parquet"
          }
          case _ => false
        }
        case _ => false
      }
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan
      val n = plan.collectWithSubqueries { case j: Join => j }
        .flatMap(hinted)
        .count(side => !side.maxRows.exists(_ <= 4096) && !sfInvariantDims(side))
      if (n > 0) Some(name -> n) else None
    }.toMap
    val unlisted = offenders.keySet -- justifiedBroadcastHints.keySet
    val stale = justifiedBroadcastHints.keySet -- offenders.keySet
    assert(unlisted.isEmpty,
      s"unjustified broadcast hints (forced replication of a scale-growing side): ${unlisted.toSeq.sorted.map(n => s"$n(x${offenders(n)})").mkString(", ")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }

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
