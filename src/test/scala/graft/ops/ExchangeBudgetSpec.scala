package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.tools.ScanAudit

/** Full-surface shuffle + read-width budget: every registered query's
  * executed plan (sf0.001, AQE fully OFF for determinism) must not exceed
  * its pinned count of shuffle exchanges, must contain at most ONE
  * range-partitioned exchange (the final orderBy), and must not read MORE
  * top-level fields from any parquet relation than its pinned ReadSchema
  * width. A refactor that un-broadcasts a join, splits an aggregate,
  * introduces a mid-plan global sort, or defeats column pruning (an
  * opaque expression over the whole row, a wide persist feeding a narrow
  * consumer, a select-star creeping into a pipeline) trips this spec
  * naming the exact query; a change that REMOVES a shuffle or NARROWS a
  * scan passes (re-pin opportunistically). At 100 TB the width pin is an
  * I/O budget: one extra materialized column of documents.text-scale
  * data is tens of terabytes of extra scan.
  *
  * Counting contract = ScanAudit.exchangeKeys/rangeExchanges over the
  * executed plan, recursing through subqueries, stopping at cache and
  * reused-exchange boundaries for COUNTS (work that runs once is not
  * attributed per consumer) while the byte/width walks descend into
  * cached subtrees (bytes moved at cache build are still bytes moved).
  * Pins are taken with spark.sql.adaptive.enabled=false — the round-9
  * census (runtime broadcast conversion off but AQE otherwise on) still
  * oscillated 4<->5 on e6_cohort_retention across identical binaries via
  * stage-size-dependent replanning, so those pins were observed upper
  * bounds; the static-planner shape is a pure function of the query and
  * fixture stats, and two full `SPARK_GRAFT_NO_AQE=1 runMain
  * graft.tools.ScanAudit` sweeps are diff-identical (r10, modulo d6c's
  * random sigtable name, which normRel normalizes). Production runs keep
  * AQE on — it can only merge/convert away from the static shape, and
  * the budget guards the DECLARED plan, not AQE's runtime improvements.
  */
class ExchangeBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // query -> (max shuffle exchanges, max range exchanges)
  private val Budget: Map[String, (Int, Int)] = Map(
    "a10_percentiles" -> (2, 1),
    "a11_cube" -> (2, 1),
    "a12_pivot" -> (3, 1),
    "a13_grouping_sets" -> (2, 1),
    "a14_wal_orphans" -> (3, 1),
    "a15_sketch_merge" -> (4, 0),
    "a16_unpivot" -> (2, 1),
    "a17_grouped_strings" -> (2, 1),
    "a18_approx_percentile_drift" -> (2, 1),
    "a19_ols_regression" -> (2, 1),
    "a20_equidepth_hist" -> (3, 1),
    "a21_corr_matrix" -> (1, 0),
    "a22_welch_ttest" -> (1, 0),
    "a23_chi_square" -> (4, 0),
    "a24_benford" -> (3, 1),
    // a25: 2 -> 6 with the r17 bucket-major two-pass rank — the extra
    // exchanges are bucket-key (<= 101 distinct k) and branch-aggregate
    // shuffles that replace the single-partition global-rank window
    // (customer-cardinality data through ONE task); A25RankAB at sf10:
    // 6.7 -> 2.8 s wall, bit-identical output.
    "a25_gini" -> (6, 0),
    "a25b_gini_bucketed" -> (4, 0),
    "a26_market_basket" -> (4, 0),
    "a6_checkpoint_states" -> (2, 0),
    "a8_rollup" -> (2, 1),
    "a9_approx_distinct" -> (2, 0),
    "c1_label_centroids" -> (2, 1),
    "d10_embedding_neardup" -> (0, 0),
    "d11_rolling_fingerprint" -> (0, 0),
    // d12/d25/d40/d6*: +2 shuffles at spec scale from the r17 scoped
    // SHUFFLE_HASH hint on the verify-attach hs sides (the hint preempts
    // the size-based broadcast these joins got at toy scale; at sf10 they
    // were already shuffled SMJs and the hint removes the 13 GB probe
    // sort spill — VerifyAttachAB).
    "d12_dataprep_pipeline" -> (9, 0),
    "d13_levenshtein" -> (1, 1),
    "d14_langid_ngram" -> (1, 1),
    "d15_decontaminate" -> (3, 1),
    "d16_pack_sequences" -> (5, 1),
    "d17_stratified_sample" -> (3, 1),
    "d18_keyword_scores" -> (5, 1),
    "d19_pii_scrub" -> (0, 0),
    "d1_dedup_exact" -> (2, 0),
    "d20_quality_percentile" -> (5, 1),
    "d21_dup_clusters" -> (2, 1),
    "d22_embedding_lsh_neardup" -> (2, 0),
    "d22b_embedding_lsh_wide" -> (2, 0),
    "d23_repetition" -> (1, 1),
    "d24_oov_ratio" -> (3, 1),
    "d25_minhash_est_error" -> (5, 1),
    "d26_bigram_lm" -> (2, 0),
    "d27_heavy_hitters_cms" -> (2, 0),
    "d28_hash_sample" -> (2, 1),
    "d29_boilerplate" -> (5, 1),
    "d2_dedup_canonical" -> (2, 1),
    "d30_charset_profile" -> (1, 1),
    "d31_ngram_novelty" -> (4, 1),
    "d33_containment" -> (0, 0),
    "d34_cluster_keep_best" -> (2, 1),
    "d35_sentence_dedup" -> (3, 1),
    "d36_bpe_merges" -> (3, 0),
    "d37_lm_coverage" -> (3, 1),
    "d38_snm_neardup" -> (2, 1),
    "d39_entity_resolution" -> (4, 1),
    "d3_text_stats" -> (0, 0),
    "d40_cross_corpus_dedup" -> (6, 1),
    "d41_bpe_encode" -> (3, 1),
    "d42_domain_cap" -> (2, 1),
    "d43_quality_mix" -> (3, 1),
    "d44_leakage_safe_split" -> (6, 1),
    "d45_chunking" -> (2, 1),
    "d46_semdedup" -> (6, 1),
    "d46b_semdedup_coarse" -> (6, 1),
    "d47_substring_dedup" -> (3, 1),
    "d48_unimax_epochs" -> (3, 0),
    "d49_quality_keep_dedup" -> (3, 1),
    "d4_lang_quality" -> (1, 1),
    "d50_bm25_retrieval" -> (3, 0),
    "d51_priority_sample" -> (0, 0),
    "d5_fingerprint" -> (0, 0),
    "d6_minhash_lsh" -> (5, 1),
    "d6b_minhash_portable" -> (5, 1),
    "d6c_minhash_sigtable" -> (5, 1),
    "d7_simhash" -> (1, 1),
    "d7b_simhash_portable" -> (1, 1),
    "d8_ngram_jaccard" -> (0, 0),
    "d9_token_counts" -> (0, 0),
    "e10_gap_fill" -> (2, 1),
    "e11_late_data_audit" -> (5, 1),
    "e12_attribution" -> (5, 1),
    "e13_dwell_percentiles" -> (3, 1),
    "e1_tumbling_counts" -> (2, 1),
    "e2_sliding_counts" -> (2, 1),
    "e3_sessionization" -> (4, 1),
    "e4_json_extract" -> (2, 1),
    "e5_funnel" -> (3, 0),
    "e6_cohort_retention" -> (5, 1),
    "e7_transition_matrix" -> (3, 1),
    "e8_anomaly_zscore" -> (3, 1),
    "e9_windowed_topk" -> (3, 1),
    "f1_token_values" -> (1, 1),
    "f2_token_cassandra" -> (1, 1),
    "f3_date_parts" -> (2, 1),
    "f4_array_ops" -> (1, 1),
    "j10_bloom_prune" -> (1, 0),
    // 1, not 3: supersteps 1-2 are localCheckpoint-materialized during
    // construction (lineage truncation), so only the final superstep's
    // aggregation exchange appears in the walked plan — each superstep's
    // shape is identical, and PlanQualitySpec pins the no-src-exchange
    // property on that final superstep
    "j11_pagerank" -> (1, 0),
    "j12_triangle_count" -> (5, 1),
    "j1_missing_ids" -> (1, 1),
    "j2_range_completion" -> (3, 1),
    "j3_semi_join" -> (0, 0),
    "j4_range_join" -> (2, 1),
    "j5_asof_join" -> (3, 1),
    "j6_asof_custom" -> (4, 1),
    "j7_salted_join" -> (2, 1),
    "j8_binned_range_join" -> (2, 1),
    "j9_snapshot_diff" -> (4, 1),
    "k6_incremental_merge" -> (2, 0),
    "k7_scd2_history" -> (2, 1),
    "k8_delete_propagation" -> (3, 0),
    "k9_cdc_tombstones" -> (2, 0),
    "m1_multimodal_meta" -> (0, 0),
    "m2_media_buckets" -> (2, 1),
    "m3_decode_features" -> (0, 0),
    "m4_resize_plan" -> (0, 0),
    "m5_frame_sample" -> (1, 1),
    "m6_modality_balance" -> (2, 1),
    "m7_media_dedup" -> (3, 1),
    "o2_topk_orders" -> (0, 0),
    "o3_pagination" -> (0, 0),
    "p1_project_rename" -> (0, 0),
    "p4_range_predicate" -> (2, 1),
    "p6_point_lookup" -> (1, 1),
    "p7_sanitize_nulls" -> (0, 0),
    "q10_returned_revenue" -> (1, 0),
    "q11_value_share" -> (2, 1),
    "q12_shipmode_priority" -> (2, 1),
    "q13_custorder_dist" -> (3, 1),
    "q14_promo_ratio" -> (1, 0),
    "q15_top_supplier" -> (4, 1),
    "q16_supplier_counts" -> (3, 1),
    "q17_small_quantity" -> (2, 0),
    "q18_large_orders" -> (1, 0),
    "q19_disjunctive" -> (1, 0),
    "q1_pricing_summary" -> (2, 1),
    "q20_excess_shipments" -> (6, 1),
    "q21_waiting_supplier" -> (3, 0),
    "q22_dormant_customers" -> (3, 1),
    "q23_mom_growth" -> (2, 0),
    "q2_min_per_group" -> (2, 1),
    "q3_shipping_priority" -> (1, 0),
    "q4_priority_exists" -> (2, 1),
    "q5_region_revenue" -> (4, 1),
    "q6_forecast_revenue" -> (1, 0),
    "q7_volume_shipping" -> (4, 1),
    "q8_market_share" -> (2, 1),
    "q9_product_profit" -> (2, 1),
    "s10_partitioned_scan" -> (2, 1),
    "s11_csv_roundtrip" -> (2, 1),
    "s12_json_roundtrip" -> (2, 1),
    "s13_orc_roundtrip" -> (2, 1),
    "s14_zorder_locality" -> (2, 1),
    "s15_text_roundtrip" -> (1, 1),
    "s16_xml_roundtrip" -> (2, 1),
    "s17_dq_checks" -> (4, 0),
    "s18_corrupt_records" -> (2, 0),
    "s18b_corrupt_diag" -> (3, 1),
    "s19_schema_evolution" -> (3, 1),
    "s1_token_range_scan" -> (1, 1),
    "s20_sql_frontend" -> (2, 1),
    "s3_range_counts" -> (2, 1),
    "s4_sample_scan" -> (0, 0),
    "s6_incomplete_ranges" -> (2, 1),
    "s7_introspect" -> (1, 1),
    "s8_profile" -> (2, 0),
    "s9_v2_ring_source" -> (1, 1),
    "t1_token_split" -> (1, 1),
    "t2_migrate_pipeline" -> (0, 0),
    "t6_validate_counts" -> (2, 0),
    "u1_set_except" -> (2, 1),
    "u2_intersect" -> (2, 1),
    "u3_except_all" -> (2, 1),
    "v10_pq_ann" -> (7, 1),
    "v1_cosine_topk" -> (2, 1),
    "v2_sim_histogram" -> (2, 1),
    "v3_ann_lsh" -> (2, 1),
    "v4_ann_ivf" -> (4, 1),
    "v5_crossmodal_curation" -> (3, 1),
    "v6_centered_cosine" -> (2, 1),
    "v7_knn_classify" -> (2, 1),
    "v8_hamming_topk" -> (2, 1),
    "v9_hard_negatives" -> (2, 1),
    "w1_running_max_token" -> (2, 1),
    "w2_order_gaps" -> (2, 1),
    "w3_moving_revenue" -> (2, 0),
    "w4_cumulative_distinct" -> (3, 1),
    "w5_pattern_match" -> (2, 1),
  )

  // query -> relation (file-index root, runs-of-digits normalized) ->
  // max top-level fields read from the file (post-pruning ReadSchema,
  // cached subtrees included). Generated from the same ScanAudit sweep
  // as the shuffle pins; fixture widths: lineitem 11, events 6, orders 6,
  // part 6, customer 5, documents 5, supplier 4, nation 3, embeddings 3,
  // region 2.
  private val WidthBudget: Map[String, Map[String, Int]] = Map(
    "a10_percentiles" -> Map("lineitem.parquet" -> 2),
    "a11_cube" -> Map("customer.parquet" -> 2),
    "a12_pivot" -> Map("events.parquet" -> 2),
    "a13_grouping_sets" -> Map("orders.parquet" -> 2),
    "a14_wal_orphans" -> Map("lineitem.parquet" -> 1),
    "a15_sketch_merge" -> Map("lineitem.parquet" -> 1),
    "a16_unpivot" -> Map("lineitem.parquet" -> 3),
    "a17_grouped_strings" -> Map("orders.parquet" -> 2),
    "a18_approx_percentile_drift" -> Map("lineitem.parquet" -> 2),
    "a19_ols_regression" -> Map("lineitem.parquet" -> 3),
    "a20_equidepth_hist" -> Map("orders.parquet" -> 1),
    "a21_corr_matrix" -> Map("lineitem.parquet" -> 3),
    "a22_welch_ttest" -> Map("lineitem.parquet" -> 2),
    "a23_chi_square" -> Map("documents.parquet" -> 2),
    "a24_benford" -> Map("orders.parquet" -> 1),
    "a25_gini" -> Map("orders.parquet" -> 2),
    "a25b_gini_bucketed" -> Map("orders.parquet" -> 2),
    "a26_market_basket" -> Map("lineitem.parquet" -> 2),
    "a6_checkpoint_states" -> Map("lineitem.parquet" -> 1),
    "a8_rollup" -> Map("orders.parquet" -> 3),
    "a9_approx_distinct" -> Map("lineitem.parquet" -> 1),
    "c1_label_centroids" -> Map("embeddings.parquet" -> 2),
    "d10_embedding_neardup" -> Map("embeddings.parquet" -> 2),
    "d11_rolling_fingerprint" -> Map("documents.parquet" -> 2),
    "d12_dataprep_pipeline" -> Map("documents.parquet" -> 2),
    "d13_levenshtein" -> Map("documents.parquet" -> 2),
    "d14_langid_ngram" -> Map("documents.parquet" -> 3),
    "d15_decontaminate" -> Map("documents.parquet" -> 2),
    "d16_pack_sequences" -> Map("documents.parquet" -> 3),
    "d17_stratified_sample" -> Map("documents.parquet" -> 3),
    "d18_keyword_scores" -> Map("documents.parquet" -> 2),
    "d19_pii_scrub" -> Map("documents.parquet" -> 2),
    "d1_dedup_exact" -> Map("documents.parquet" -> 1),
    "d20_quality_percentile" -> Map("documents.parquet" -> 3),
    "d21_dup_clusters" -> Map(),
    "d22_embedding_lsh_neardup" -> Map("embeddings.parquet" -> 2),
    "d22b_embedding_lsh_wide" -> Map("embeddings.parquet" -> 2),
    "d23_repetition" -> Map("documents.parquet" -> 2),
    "d24_oov_ratio" -> Map("documents.parquet" -> 2),
    "d25_minhash_est_error" -> Map("documents.parquet" -> 2),
    "d26_bigram_lm" -> Map("documents.parquet" -> 1),
    "d27_heavy_hitters_cms" -> Map("documents.parquet" -> 1),
    "d28_hash_sample" -> Map("documents.parquet" -> 3),
    "d29_boilerplate" -> Map("documents.parquet" -> 2),
    "d2_dedup_canonical" -> Map("documents.parquet" -> 3),
    "d30_charset_profile" -> Map("documents.parquet" -> 2),
    "d31_ngram_novelty" -> Map("documents.parquet" -> 2),
    "d33_containment" -> Map("documents.parquet" -> 2),
    "d34_cluster_keep_best" -> Map("documents.parquet" -> 2),
    "d35_sentence_dedup" -> Map("documents.parquet" -> 2),
    "d36_bpe_merges" -> Map("documents.parquet" -> 1),
    "d37_lm_coverage" -> Map("documents.parquet" -> 2),
    "d38_snm_neardup" -> Map("documents.parquet" -> 3),
    "d39_entity_resolution" -> Map("documents.parquet" -> 4),
    "d3_text_stats" -> Map("documents.parquet" -> 3),
    "d40_cross_corpus_dedup" -> Map("documents.parquet" -> 2),
    "d41_bpe_encode" -> Map("documents.parquet" -> 2),
    "d42_domain_cap" -> Map("documents.parquet" -> 3),
    "d43_quality_mix" -> Map("documents.parquet" -> 2),
    "d44_leakage_safe_split" -> Map("documents.parquet" -> 2),
    "d45_chunking" -> Map("documents.parquet" -> 2),
    "d46_semdedup" -> Map("embeddings.parquet" -> 2),
    "d46b_semdedup_coarse" -> Map("embeddings.parquet" -> 2),
    "d47_substring_dedup" -> Map("documents.parquet" -> 2),
    "d48_unimax_epochs" -> Map("documents.parquet" -> 2),
    "d49_quality_keep_dedup" -> Map("documents.parquet" -> 2),
    "d4_lang_quality" -> Map("documents.parquet" -> 3),
    "d50_bm25_retrieval" -> Map("documents.parquet" -> 2),
    "d51_priority_sample" -> Map("documents.parquet" -> 2),
    "d5_fingerprint" -> Map("documents.parquet" -> 2),
    "d6_minhash_lsh" -> Map("documents.parquet" -> 2),
    "d6b_minhash_portable" -> Map("documents.parquet" -> 2),
    "d6c_minhash_sigtable" -> Map("graft_sigtableN" -> 2),
    "d7_simhash" -> Map("documents.parquet" -> 2),
    "d7b_simhash_portable" -> Map("documents.parquet" -> 2),
    "d8_ngram_jaccard" -> Map("documents.parquet" -> 2),
    "d9_token_counts" -> Map("documents.parquet" -> 2),
    "e10_gap_fill" -> Map("events.parquet" -> 3),
    "e11_late_data_audit" -> Map("events.parquet" -> 3),
    "e12_attribution" -> Map("events.parquet" -> 4),
    "e13_dwell_percentiles" -> Map("events.parquet" -> 4),
    "e1_tumbling_counts" -> Map("events.parquet" -> 3),
    "e2_sliding_counts" -> Map("events.parquet" -> 1),
    "e3_sessionization" -> Map("events.parquet" -> 3),
    "e4_json_extract" -> Map("events.parquet" -> 2),
    "e5_funnel" -> Map("events.parquet" -> 3),
    "e6_cohort_retention" -> Map("events.parquet" -> 2),
    "e7_transition_matrix" -> Map("events.parquet" -> 4),
    "e8_anomaly_zscore" -> Map("events.parquet" -> 2),
    "e9_windowed_topk" -> Map("events.parquet" -> 2),
    "f1_token_values" -> Map("orders.parquet" -> 1),
    "f2_token_cassandra" -> Map("orders.parquet" -> 1),
    "f3_date_parts" -> Map("orders.parquet" -> 2),
    "f4_array_ops" -> Map("embeddings.parquet" -> 2),
    "j10_bloom_prune" -> Map("customer.parquet" -> 2, "orders.parquet" -> 2),
    "j11_pagerank" -> Map("lineitem.parquet" -> 2, "orders.parquet" -> 2),
    "j12_triangle_count" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 2, "nation.parquet" -> 2, "orders.parquet" -> 2, "supplier.parquet" -> 2),
    "j1_missing_ids" -> Map("orders.parquet" -> 1),
    "j2_range_completion" -> Map("lineitem.parquet" -> 2),
    "j3_semi_join" -> Map("lineitem.parquet" -> 2, "orders.parquet" -> 2),
    "j4_range_join" -> Map("lineitem.parquet" -> 1),
    "j5_asof_join" -> Map("events.parquet" -> 4),
    "j6_asof_custom" -> Map("events.parquet" -> 4),
    "j7_salted_join" -> Map("lineitem.parquet" -> 3, "orders.parquet" -> 2),
    "j8_binned_range_join" -> Map("lineitem.parquet" -> 1),
    "j9_snapshot_diff" -> Map("orders.parquet" -> 3),
    "k6_incremental_merge" -> Map("orders.parquet" -> 2),
    "k7_scd2_history" -> Map("orders.parquet" -> 2),
    "k8_delete_propagation" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 1, "orders.parquet" -> 2),
    "k9_cdc_tombstones" -> Map("orders.parquet" -> 2),
    "m1_multimodal_meta" -> Map("documents.parquet" -> 3),
    "m2_media_buckets" -> Map("documents.parquet" -> 3),
    "m3_decode_features" -> Map("documents.parquet" -> 3),
    "m4_resize_plan" -> Map("documents.parquet" -> 2),
    "m5_frame_sample" -> Map("documents.parquet" -> 2),
    "m6_modality_balance" -> Map("documents.parquet" -> 2),
    "m7_media_dedup" -> Map("documents.parquet" -> 2),
    "o2_topk_orders" -> Map("orders.parquet" -> 2),
    "o3_pagination" -> Map("orders.parquet" -> 2),
    "p1_project_rename" -> Map("lineitem.parquet" -> 4),
    "p4_range_predicate" -> Map("lineitem.parquet" -> 2),
    "p6_point_lookup" -> Map("lineitem.parquet" -> 3),
    "p7_sanitize_nulls" -> Map("orders.parquet" -> 4),
    "q10_returned_revenue" -> Map("customer.parquet" -> 4, "lineitem.parquet" -> 4, "nation.parquet" -> 2, "orders.parquet" -> 2),
    "q11_value_share" -> Map("lineitem.parquet" -> 3),
    "q12_shipmode_priority" -> Map("lineitem.parquet" -> 3, "orders.parquet" -> 2),
    "q13_custorder_dist" -> Map("customer.parquet" -> 1, "orders.parquet" -> 3),
    "q14_promo_ratio" -> Map("lineitem.parquet" -> 4, "part.parquet" -> 2),
    "q15_top_supplier" -> Map("lineitem.parquet" -> 4, "supplier.parquet" -> 2),
    "q16_supplier_counts" -> Map("lineitem.parquet" -> 2, "part.parquet" -> 3, "supplier.parquet" -> 2),
    "q17_small_quantity" -> Map("lineitem.parquet" -> 3, "part.parquet" -> 2),
    "q18_large_orders" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 2, "orders.parquet" -> 4),
    "q19_disjunctive" -> Map("lineitem.parquet" -> 4, "part.parquet" -> 3),
    "q1_pricing_summary" -> Map("lineitem.parquet" -> 7),
    "q20_excess_shipments" -> Map("lineitem.parquet" -> 4, "part.parquet" -> 2, "supplier.parquet" -> 2),
    "q21_waiting_supplier" -> Map("lineitem.parquet" -> 3, "orders.parquet" -> 2, "supplier.parquet" -> 2),
    "q22_dormant_customers" -> Map("customer.parquet" -> 3, "nation.parquet" -> 2, "orders.parquet" -> 2),
    "q23_mom_growth" -> Map("orders.parquet" -> 2),
    "q2_min_per_group" -> Map("supplier.parquet" -> 4),
    "q3_shipping_priority" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 4, "orders.parquet" -> 4),
    "q4_priority_exists" -> Map("lineitem.parquet" -> 2, "orders.parquet" -> 3),
    "q5_region_revenue" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 4, "nation.parquet" -> 3, "orders.parquet" -> 3, "region.parquet" -> 2, "supplier.parquet" -> 2),
    "q6_forecast_revenue" -> Map("lineitem.parquet" -> 4),
    "q7_volume_shipping" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 5, "nation.parquet" -> 2, "orders.parquet" -> 2, "supplier.parquet" -> 2),
    "q8_market_share" -> Map("customer.parquet" -> 2, "lineitem.parquet" -> 5, "nation.parquet" -> 2, "orders.parquet" -> 3, "part.parquet" -> 2, "region.parquet" -> 2, "supplier.parquet" -> 2),
    "q9_product_profit" -> Map("lineitem.parquet" -> 5, "nation.parquet" -> 2, "orders.parquet" -> 2, "part.parquet" -> 2, "supplier.parquet" -> 2),
    "s10_partitioned_scan" -> Map("events_by_type" -> 2),
    "s11_csv_roundtrip" -> Map("orders_csv" -> 3),
    "s12_json_roundtrip" -> Map("docs_json" -> 4),
    "s13_orc_roundtrip" -> Map("lineitem_orc" -> 3),
    "s14_zorder_locality" -> Map("events.parquet" -> 2),
    "s15_text_roundtrip" -> Map("docs_txt" -> 1),
    "s16_xml_roundtrip" -> Map("customer.parquet" -> 2, "nation_xml" -> 2),
    "s17_dq_checks" -> Map("customer.parquet" -> 1, "lineitem.parquet" -> 2, "orders.parquet" -> 3),
    "s18_corrupt_records" -> Map(),
    "s18b_corrupt_diag" -> Map(),
    "s19_schema_evolution" -> Map("snap" -> 2),
    "s1_token_range_scan" -> Map("lineitem.parquet" -> 2),
    "s20_sql_frontend" -> Map("customer.parquet" -> 2, "orders.parquet" -> 2),
    "s3_range_counts" -> Map("lineitem.parquet" -> 1),
    "s4_sample_scan" -> Map("lineitem.parquet" -> 1),
    "s6_incomplete_ranges" -> Map("lineitem.parquet" -> 1),
    "s7_introspect" -> Map(),
    "s8_profile" -> Map("customer.parquet" -> 3),
    "s9_v2_ring_source" -> Map(),
    "t1_token_split" -> Map(),
    "t2_migrate_pipeline" -> Map(),
    "t6_validate_counts" -> Map("lineitem.parquet" -> 2),
    "u1_set_except" -> Map("customer.parquet" -> 1, "orders.parquet" -> 1),
    "u2_intersect" -> Map("orders.parquet" -> 2),
    "u3_except_all" -> Map("customer.parquet" -> 1, "orders.parquet" -> 1),
    "v10_pq_ann" -> Map("embeddings.parquet" -> 2),
    "v1_cosine_topk" -> Map("embeddings.parquet" -> 2),
    "v2_sim_histogram" -> Map("embeddings.parquet" -> 2),
    "v3_ann_lsh" -> Map("embeddings.parquet" -> 2),
    "v4_ann_ivf" -> Map("embeddings.parquet" -> 2),
    "v5_crossmodal_curation" -> Map("documents.parquet" -> 2, "embeddings.parquet" -> 2),
    "v6_centered_cosine" -> Map("embeddings.parquet" -> 2),
    "v7_knn_classify" -> Map("embeddings.parquet" -> 3),
    "v8_hamming_topk" -> Map("embeddings.parquet" -> 2),
    "v9_hard_negatives" -> Map("embeddings.parquet" -> 3),
    "w1_running_max_token" -> Map("lineitem.parquet" -> 2),
    "w2_order_gaps" -> Map("orders.parquet" -> 4),
    "w3_moving_revenue" -> Map("orders.parquet" -> 2),
    "w4_cumulative_distinct" -> Map("lineitem.parquet" -> 3, "orders.parquet" -> 3),
    "w5_pattern_match" -> Map("events.parquet" -> 4),
  )

  private def normRel(r: String): String = r.replaceAll("[0-9]{6,}", "N")

  // query -> variable-width columns ALLOWED to ride a Generate (explode)
  // node's requiredChildOutput. GenerateExec copies these into every
  // emitted row, so a document-scale array or text column here multiplies
  // as n_generated x sizeof(column) — the d47 bug (the exploded word
  // array itself carried along; one 5M-char document ground a core for
  // 20+ minutes). The allowlisted carries are all short bounded strings:
  // a single word (d27), the 80-char SNM sort prefix + lang (d38), and
  // order-priority / tier enums (j7/j8). Any NEW variable-width carry —
  // and especially any array — needs a bound argument and a row here.
  private val GenerateCarryAllow: Map[String, Set[String]] = Map(
    "d27_heavy_hitters_cms" -> Set("word"),
    "d38_snm_neardup" -> Set("lang", "prefix"),
    "j7_salted_join" -> Set("o_orderpriority"),
    "j8_binned_range_join" -> Set("tier"),
  )

  // query -> max Catalyst defaultSize (bytes) of any single shuffled row
  // (hash and range exchanges, cache boundaries excluded) — the
  // shuffle-BYTES budget: the exchange count bounds how often data
  // moves, this bounds how WIDE each moved row is. The big pinned values
  // are legitimate by class, not bugs: partial-aggregation sketch
  // buffers (a9 HLL 3288, a18 KLL 428, a10/e13 exact-percentile 236)
  // ride one row per group per partition, and final-orderBy range
  // exchanges carry the result row. The class this catches is corpus-
  // sized HASH shuffles growing a heavy column (document text, the
  // props JSON blob) that their consumer doesn't need — d35 is the
  // proof of the discipline: its dedup exchange moves (hash, doc_id,
  // pos), never sentence text.
  private val ShuffleByteBudget: Map[String, Int] = Map(
    "a10_percentiles" -> 236,
    "a11_cube" -> 44,
    "a12_pivot" -> 48,
    "a13_grouping_sets" -> 44,
    "a14_wal_orphans" -> 40,
    "a15_sketch_merge" -> 108,
    "a16_unpivot" -> 53,
    "a17_grouped_strings" -> 128,
    "a18_approx_percentile_drift" -> 428,
    "a19_ols_regression" -> 113,
    "a20_equidepth_hist" -> 100,
    "a21_corr_matrix" -> 161,
    "a22_welch_ttest" -> 84,
    "a23_chi_square" -> 48,
    "a24_benford" -> 40,
    "a25_gini" -> 42, // +k/off longs on the bucket-rank exchanges (r17)
    "a25b_gini_bucketed" -> 25,
    "a26_market_basket" -> 108,
    "a6_checkpoint_states" -> 24,
    "a8_rollup" -> 73,
    "a9_approx_distinct" -> 3288,
    "c1_label_centroids" -> 104,
    "d10_embedding_neardup" -> 0,
    "d11_rolling_fingerprint" -> 0,
    "d12_dataprep_pipeline" -> 40, // 36 -> 40: minBandPairs carries, see d6* note
    "d13_levenshtein" -> 33,
    "d14_langid_ngram" -> 89,
    "d15_decontaminate" -> 16,
    "d16_pack_sequences" -> 44,
    "d17_stratified_sample" -> 64,
    "d18_keyword_scores" -> 60,
    "d19_pii_scrub" -> 0,
    "d1_dedup_exact" -> 28,
    "d20_quality_percentile" -> 52,
    "d21_dup_clusters" -> 24,
    "d22_embedding_lsh_neardup" -> 20,
    "d22b_embedding_lsh_wide" -> 20,
    "d23_repetition" -> 33,
    "d24_oov_ratio" -> 32,
    "d25_minhash_est_error" -> 48,
    "d26_bigram_lm" -> 48,
    "d27_heavy_hitters_cms" -> 36,
    "d28_hash_sample" -> 52,
    "d29_boilerplate" -> 32,
    "d2_dedup_canonical" -> 45,
    "d30_charset_profile" -> 49,
    "d31_ngram_novelty" -> 32,
    "d33_containment" -> 0,
    "d34_cluster_keep_best" -> 40,
    "d35_sentence_dedup" -> 124,
    "d36_bpe_merges" -> 48,
    "d37_lm_coverage" -> 48,
    "d38_snm_neardup" -> 88,
    "d39_entity_resolution" -> 56,
    "d3_text_stats" -> 0,
    "d40_cross_corpus_dedup" -> 24,
    "d41_bpe_encode" -> 48,
    "d42_domain_cap" -> 52,
    "d43_quality_mix" -> 52,
    "d44_leakage_safe_split" -> 56,
    "d45_chunking" -> 48,
    "d46_semdedup" -> 40,
    "d46b_semdedup_coarse" -> 50,
    "d47_substring_dedup" -> 48,
    "d48_unimax_epochs" -> 36,
    "d49_quality_keep_dedup" -> 48,
    "d4_lang_quality" -> 101,
    "d50_bm25_retrieval" -> 44,
    "d51_priority_sample" -> 0,
    "d5_fingerprint" -> 0,
    // d6*/d12: the min-band candidate dedup (Dedup.minBandPairs, r17)
    // rides nBands-1 kept-bucket hash longs on the BANDED (doc-scale)
    // exchange so the PAIR-scale distinct exchange disappears entirely —
    // width bounded by the compile-time band count (8 prod / 4 twin),
    // never by data: 72 = doc_id + band/bh + 7 longs, 40 = + 3 longs.
    "d6_minhash_lsh" -> 72,
    "d6b_minhash_portable" -> 40,
    "d6c_minhash_sigtable" -> 40,
    "d7_simhash" -> 25,
    "d7b_simhash_portable" -> 25,
    "d8_ngram_jaccard" -> 0,
    "d9_token_counts" -> 0,
    "e10_gap_fill" -> 41,
    "e11_late_data_audit" -> 44,
    "e12_attribution" -> 60,
    "e13_dwell_percentiles" -> 236,
    "e1_tumbling_counts" -> 61,
    "e2_sliding_counts" -> 24,
    "e3_sessionization" -> 44,
    "e4_json_extract" -> 33,
    "e5_funnel" -> 16,
    "e6_cohort_retention" -> 24,
    "e7_transition_matrix" -> 56,
    "e8_anomaly_zscore" -> 62,
    "e9_windowed_topk" -> 44,
    "f1_token_values" -> 16,
    "f2_token_cassandra" -> 24,
    "f3_date_parts" -> 41,
    "f4_array_ops" -> 64,
    "j10_bloom_prune" -> 25,
    "j11_pagerank" -> 16,
    "j12_triangle_count" -> 28,
    "j1_missing_ids" -> 16,
    "j2_range_completion" -> 32,
    "j3_semi_join" -> 0,
    "j4_range_join" -> 36,
    "j5_asof_join" -> 56,
    "j6_asof_custom" -> 52,
    "j7_salted_join" -> 36,
    "j8_binned_range_join" -> 36,
    "j9_snapshot_diff" -> 44,
    "k6_incremental_merge" -> 33,
    "k7_scd2_history" -> 33,
    "k8_delete_propagation" -> 24,
    "k9_cdc_tombstones" -> 49,
    "m1_multimodal_meta" -> 0,
    "m2_media_buckets" -> 36,
    "m3_decode_features" -> 0,
    "m4_resize_plan" -> 0,
    "m5_frame_sample" -> 24,
    "m6_modality_balance" -> 44,
    "m7_media_dedup" -> 60,
    "o2_topk_orders" -> 0,
    "o3_pagination" -> 0,
    "p1_project_rename" -> 0,
    "p4_range_predicate" -> 28,
    "p6_point_lookup" -> 24,
    "p7_sanitize_nulls" -> 0,
    "q10_returned_revenue" -> 73,
    "q11_value_share" -> 33,
    "q12_shipmode_priority" -> 36,
    "q13_custorder_dist" -> 16,
    "q14_promo_ratio" -> 34,
    "q15_top_supplier" -> 36,
    "q16_supplier_counts" -> 48,
    "q17_small_quantity" -> 25,
    "q18_large_orders" -> 16,
    "q19_disjunctive" -> 25,
    "q1_pricing_summary" -> 107,
    "q20_excess_shipments" -> 33,
    "q21_waiting_supplier" -> 32,
    "q22_dormant_customers" -> 45,
    "q23_mom_growth" -> 25,
    "q2_min_per_group" -> 44,
    "q3_shipping_priority" -> 53,
    "q4_priority_exists" -> 28,
    "q5_region_revenue" -> 37,
    "q6_forecast_revenue" -> 25,
    "q7_volume_shipping" -> 65,
    "q8_market_share" -> 50,
    "q9_product_profit" -> 45,
    "s10_partitioned_scan" -> 33,
    "s11_csv_roundtrip" -> 53,
    "s12_json_roundtrip" -> 64,
    "s13_orc_roundtrip" -> 45,
    "s14_zorder_locality" -> 48,
    "s15_text_roundtrip" -> 48,
    "s16_xml_roundtrip" -> 36,
    "s17_dq_checks" -> 32,
    "s18_corrupt_records" -> 44,
    "s18b_corrupt_diag" -> 52,
    "s19_schema_evolution" -> 61,
    "s1_token_range_scan" -> 24,
    "s20_sql_frontend" -> 44,
    "s3_range_counts" -> 16,
    "s4_sample_scan" -> 0,
    "s6_incomplete_ranges" -> 32,
    "s7_introspect" -> 41,
    "s8_profile" -> 144,
    "s9_v2_ring_source" -> 24,
    "t1_token_split" -> 20,
    "t2_migrate_pipeline" -> 0,
    "t6_validate_counts" -> 25,
    "u1_set_except" -> 8,
    "u2_intersect" -> 8,
    "u3_except_all" -> 16,
    "v10_pq_ann" -> 140,
    "v1_cosine_topk" -> 32,
    "v2_sim_histogram" -> 16,
    "v3_ann_lsh" -> 32,
    "v4_ann_ivf" -> 37,
    "v5_crossmodal_curation" -> 16,
    "v6_centered_cosine" -> 32,
    "v7_knn_classify" -> 40,
    "v8_hamming_topk" -> 40,
    "v9_hard_negatives" -> 48,
    "w1_running_max_token" -> 48,
    "w2_order_gaps" -> 40,
    "w3_moving_revenue" -> 32,
    "w4_cumulative_distinct" -> 44,
    "w5_pattern_match" -> 52,
  )

  test("registry and budget cover the same query names") {
    val reg = graft.SparkEntry.queries.keySet
    assert((reg -- Budget.keySet).isEmpty,
      s"queries missing a shuffle budget (pin them via ScanAudit): ${(reg -- Budget.keySet).toSeq.sorted.mkString(", ")}")
    assert((Budget.keySet -- reg).isEmpty,
      s"budget names not in the registry: ${(Budget.keySet -- reg).toSeq.sorted.mkString(", ")}")
    assert((reg -- WidthBudget.keySet).isEmpty,
      s"queries missing a read-width budget (pin them via ScanAudit): ${(reg -- WidthBudget.keySet).toSeq.sorted.mkString(", ")}")
    assert((WidthBudget.keySet -- reg).isEmpty,
      s"width-budget names not in the registry: ${(WidthBudget.keySet -- reg).toSeq.sorted.mkString(", ")}")
    assert((reg -- ShuffleByteBudget.keySet).isEmpty,
      s"queries missing a shuffle-byte budget (pin them via ScanAudit): ${(reg -- ShuffleByteBudget.keySet).toSeq.sorted.mkString(", ")}")
    assert((ShuffleByteBudget.keySet -- reg).isEmpty,
      s"shuffle-byte-budget names not in the registry: ${(ShuffleByteBudget.keySet -- reg).toSeq.sorted.mkString(", ")}")
  }

  test("no query exceeds its pinned shuffle budget; at most one global sort each") {
    // Same full-determinism knobs as the census sweeps: AQE off entirely
    // (stage-size-dependent replanning flipped e6 4<->5 across identical
    // binaries even with only runtime broadcast conversion disabled), so
    // every measured count is the static planner shape — exact, not an
    // observed upper bound.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prevs = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    final case class Measured(shuffles: Int, ranges: Int,
                              widths: Map[String, Int], shuffleBytes: Int,
                              genCarries: Seq[(String, String)])
    def measure(name: String): Measured = {
      spark.sharedState.cacheManager.clearCache()
      graft.ops.PipelineCache.release()
      val df = graft.SparkEntry.queries(name)(spark, SparkTestBase.Sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan
      Measured(ScanAudit.exchangeKeys(plan).size, ScanAudit.rangeExchanges(plan),
        ScanAudit.readWidths(plan).map { case (r, w) => normRel(r) -> w },
        ScanAudit.maxShuffleRowBytes(plan),
        ScanAudit.generateCarries(plan))
    }
    def carryViolations(name: String, carries: Seq[(String, String)]): Seq[String] = {
      val allowed = GenerateCarryAllow.getOrElse(name, Set.empty)
      carries.distinct.collect {
        case (col, tpe) if !allowed(col) =>
          s"$name: variable-width column $col:$tpe rides a Generate's requiredChildOutput " +
            "(copied into every exploded row — the d47 quadratic class); compute derived " +
            "values below the explode or allowlist with a bound argument"
      }
    }
    def widthViolations(name: String, widths: Map[String, Int]): Seq[String] = {
      val pinned = WidthBudget.getOrElse(name, Map.empty)
      widths.toSeq.sorted.flatMap { case (rel, w) =>
        pinned.get(rel) match {
          case Some(max) if w > max =>
            Some(s"$name: reads $w fields of $rel > pinned $max (column pruning defeated?)")
          case Some(_) => None
          case None =>
            Some(s"$name: scans unpinned relation $rel (width $w) — re-pin via ScanAudit")
        }
      }
    }
    try {
      val violations = Budget.toSeq.sortBy(_._1).flatMap { case (name, (maxSh, maxRg)) =>
        val m = measure(name)
        val maxBytes = ShuffleByteBudget.getOrElse(name, Int.MaxValue)
        if (m.shuffles <= maxSh && m.ranges <= maxRg &&
            m.shuffleBytes <= maxBytes && widthViolations(name, m.widths).isEmpty &&
            carryViolations(name, m.genCarries).isEmpty) None
        else {
          // Re-measure once before failing. With AQE fully off the plan
          // shape is deterministic and this should never trigger; it
          // stays as belt-and-braces so that if a future knob regresses
          // determinism, a transient variation is LOGGED (visible in the
          // suite output) rather than silently absorbed or flaked.
          val m2 = measure(name)
          val over = Seq(
            if (m2.shuffles > maxSh) Some(s"$name: ${m2.shuffles} shuffle exchanges > pinned $maxSh") else None,
            if (m2.ranges > maxRg) Some(s"$name: ${m2.ranges} range exchanges > pinned $maxRg (mid-plan global sort?)") else None,
            if (m2.shuffleBytes > maxBytes) Some(s"$name: widest shuffled row ${m2.shuffleBytes} B > pinned $maxBytes B (heavy column riding a shuffle?)") else None,
          ).flatten ++ widthViolations(name, m2.widths) ++ carryViolations(name, m2.genCarries)
          if (over.isEmpty)
            System.err.println(s"[exchange-budget] transient count variation on $name: " +
              s"(${m.shuffles}, ${m.ranges}, ${m.shuffleBytes}B) then " +
              s"(${m2.shuffles}, ${m2.ranges}, ${m2.shuffleBytes}B) vs pinned ($maxSh, $maxRg, ${maxBytes}B)")
          over
        }
      }
      assert(violations.isEmpty, violations.mkString("\n"))
    } finally {
      spark.sharedState.cacheManager.clearCache()
      prevs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
