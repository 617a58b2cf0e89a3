"""Central query registry: every implemented operator from SURVEY.md
§2 (reference surface + gap map + north-star LLM ops) as a
``(spark, sf_dir) -> DataFrame`` callable with, where SQL can express
it, a DuckDB oracle.

Ordering is GATE-PRIORITY order, not category order: the round
driver's correctness gate consumes a bounded prefix of this list
(~50 entries in round 1), so the entries that most need a fresh
driver-verified row come first — the north-star LLM block and the
analytics block (no driver row in round 1), then queries new or
changed this round, then the TPC-H tail, then everything that
already has a green CORRECTNESS_r01 row (those stay covered by the
local oracle-parity suite either way).

Queries without an oracle are deterministic but depend on Spark-only
iterative algorithms (k-means); sketch-based queries
(approx-distinct, SimHash, MinHash-LSH) are reshaped to emit
engine-checkable exact columns plus property booleans so they get a
full hash-checked row instead of rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spark_flink_streaming_example_with_test_spark.plans import (
    analytics as an,
    llm,
    reference_queries as ref,
    relational as rel,
    tpch_more as t2,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool = False  # included in bench.py


_SPECS: list[QuerySpec] = [
    # -- Round-6 gate priority: new operators and API surfaces
    # (hybrid BM25+RRF retrieval, PII scrub, percentile pruning,
    # regr_*/zscore/Gini/HLL-union/RANGE-frame/try_*/levenshtein/
    # bitwise aggregates, PageRank, SemDeDup, hashing-trick
    # features, chained streaming rollup, URL/XML parsing,
    # multimodal resize/frame plumbing, GROUP BY ALL, corpus
    # segment dedup, sequence packing, PQ encoding, the
    # manifest-sink e2e, recursive-CTE sessionization, state-store
    # reader e2e, mixture re-weighting, SQL pipe syntax, SQL
    # scripting) plus dedup_minhash_lsh, whose exact-verification
    # join was semi-join-restricted this round — each needs a FRESH
    # driver row. ------------------------------------------------------
    QuerySpec("hybrid_search_rrf", llm.hybrid_search_rrf,
              llm.HYBRID_RRF_ORACLE),
    QuerySpec("pii_redaction_stats", llm.pii_redaction_stats,
              llm.PII_REDACTION_ORACLE),
    QuerySpec("quality_prune_percentile", llm.quality_prune_percentile,
              llm.QUALITY_PRUNE_ORACLE),
    QuerySpec("regr_value_trend", an.regr_value_trend,
              an.REGR_TREND_ORACLE),
    QuerySpec("moving_zscore_events", an.moving_zscore_events,
              an.MOVING_ZSCORE_ORACLE),
    QuerySpec("source_length_gini", llm.source_length_gini,
              llm.SOURCE_GINI_ORACLE),
    QuerySpec("hll_sketch_union_tokens", llm.hll_sketch_union_tokens,
              llm.HLL_UNION_ORACLE),
    QuerySpec("range_frame_hourly_load", an.range_frame_hourly_load,
              an.RANGE_FRAME_ORACLE),
    QuerySpec("try_functions_safety", rel.try_functions_safety,
              rel.TRY_FUNCTIONS_ORACLE),
    QuerySpec("edit_distance_neighbors", rel.edit_distance_neighbors,
              rel.EDIT_DISTANCE_ORACLE),
    QuerySpec("bitwise_agg_flags", rel.bitwise_agg_flags,
              rel.BITWISE_AGG_ORACLE),
    QuerySpec("pagerank_doc_links", an.pagerank_doc_links,
              an.PAGERANK_ORACLE),
    QuerySpec("dedup_semdedup_label", llm.dedup_semdedup_label,
              llm.DEDUP_SEMDEDUP_ORACLE),
    QuerySpec("hashed_token_features", llm.hashed_token_features,
              llm.HASHED_FEATURES_ORACLE),
    QuerySpec("window_value_functions", an.window_value_functions,
              an.WINDOW_VALUE_ORACLE),
    QuerySpec("dedup_incremental_shard", llm.dedup_incremental_shard,
              llm.DEDUP_INCREMENTAL_ORACLE),
    QuerySpec("iso_week_rollup", rel.iso_week_rollup, rel.ISO_WEEK_ORACLE),
    QuerySpec("streaming_chained_windows_e2e",
              ref.streaming_chained_windows_e2e,
              ref.STREAMING_CHAINED_WINDOWS_ORACLE),
    QuerySpec("url_normalize_dedup", llm.url_normalize_dedup,
              llm.URL_NORMALIZE_ORACLE),
    QuerySpec("xml_roundtrip_kpi", llm.xml_roundtrip_kpi,
              llm.XML_ROUNDTRIP_ORACLE),
    QuerySpec("multimodal_resize_roundtrip", llm.multimodal_resize_roundtrip,
              llm.MULTIMODAL_RESIZE_ORACLE),
    QuerySpec("multimodal_frame_sample_counts",
              llm.multimodal_frame_sample_counts,
              llm.MULTIMODAL_FRAMES_ORACLE),
    QuerySpec("group_by_all_kpi", an.group_by_all_kpi,
              an.GROUP_BY_ALL_ORACLE),
    QuerySpec("corpus_segment_dedup", llm.corpus_segment_dedup,
              llm.CORPUS_SEGMENT_ORACLE),
    QuerySpec("pack_token_budget", llm.pack_token_budget_query,
              llm.PACK_TOKEN_ORACLE),
    QuerySpec("embedding_pq_codes", llm.embedding_pq_codes,
              llm.EMBEDDING_PQ_ORACLE),
    QuerySpec("streaming_manifest_sink_e2e", ref.streaming_manifest_sink_e2e,
              ref.STREAMING_MANIFEST_ORACLE),
    QuerySpec("sessionize_recursive_cte", an.sessionize_recursive_cte,
              an.SESSIONIZE_RECURSIVE_ORACLE),
    QuerySpec("streaming_state_reader_e2e", ref.streaming_state_reader_e2e,
              ref.STREAMING_STATE_READER_ORACLE),
    QuerySpec("mixture_sampling_rates", llm.mixture_sampling_rates,
              llm.MIXTURE_RATES_ORACLE),
    QuerySpec("sql_udf_quality_bands", llm.sql_udf_quality_bands,
              llm.SQL_UDF_BANDS_ORACLE),
    QuerySpec("collated_dedup_groups", llm.collated_dedup_groups,
              llm.COLLATED_DEDUP_ORACLE),
    QuerySpec("param_sql_event_kpi", an.param_sql_event_kpi,
              an.PARAM_SQL_ORACLE),
    QuerySpec("doc_top_tokens_udtf", an.doc_top_tokens_udtf,
              an.DOC_TOP_TOKENS_ORACLE),
    QuerySpec("approx_topk_event_types", an.approx_topk_event_types,
              an.APPROX_TOPK_ORACLE),
    QuerySpec("listagg_user_event_types", an.listagg_user_event_types,
              an.LISTAGG_ORACLE),
    QuerySpec("unpivot_daily_event_counts", rel.unpivot_daily_event_counts,
              rel.UNPIVOT_ORACLE),
    QuerySpec("pipe_syntax_event_kpi", an.pipe_syntax_event_kpi,
              an.PIPE_SYNTAX_ORACLE),
    QuerySpec("sql_script_threshold_report", an.sql_script_threshold_report,
              an.SQL_SCRIPT_ORACLE),
    # -- Round-6 second batch (newest additions, queued AFTER the
    # first r06 block — that block has never had a driver row and
    # fills most of the ~50-entry gate window; these take the
    # remaining slots, and entries past position 50 lead the NEXT
    # round's window). Analytics: funnel, cohort retention,
    # snapshot-CDC, Welch t-test, triangle counting, Count-Min
    # sketch, rolling WAU (exact + HLL-merged), DQ audit,
    # co-occurrence mining, sequence patterns, Markov transitions,
    # acquisition curve, equi-depth histogram, MAD outliers,
    # incremental agg maintenance, bounded-depth BFS. LLM pipeline:
    # containment / exact-substring / content-defined-chunk /
    # ensemble-vote dedup, domain capping, token entropy, source-KL
    # drift, mixture-plan application, weighted priority sampling,
    # tokenizer vocab coverage. SQL/streaming surface: LATERAL
    # top-k, GROUPING markers, second string-scalar sweep,
    # dynamic-gap session windows, complete-mode streaming top-k,
    # left-semi + full-outer stream-stream interval join e2e. --------
    QuerySpec("funnel_conversion_steps", an.funnel_conversion_steps,
              an.FUNNEL_ORACLE),
    QuerySpec("cohort_retention", an.cohort_retention,
              an.COHORT_RETENTION_ORACLE),
    QuerySpec("snapshot_cdc_userstate", an.snapshot_cdc_userstate,
              an.SNAPSHOT_CDC_ORACLE),
    QuerySpec("dedup_containment_ngrams", llm.dedup_containment_ngrams,
              llm.DEDUP_CONTAINMENT_ORACLE),
    QuerySpec("dedup_exact_substring", llm.dedup_exact_substring,
              llm.DEDUP_EXACT_SUBSTRING_ORACLE),
    QuerySpec("cdc_chunk_dedup", llm.cdc_chunk_dedup, llm.CDC_CHUNK_ORACLE),
    QuerySpec("domain_cap_sample", llm.domain_cap_sample,
              llm.DOMAIN_CAP_ORACLE),
    QuerySpec("token_entropy_scores", llm.token_entropy_scores,
              llm.TOKEN_ENTROPY_ORACLE),
    QuerySpec("source_token_kl", llm.source_token_kl, llm.SOURCE_KL_ORACLE),
    QuerySpec("triangle_count_links", an.triangle_count_links,
              an.TRIANGLE_COUNT_ORACLE),
    QuerySpec("welch_ttest_event_types", an.welch_ttest_event_types,
              an.WELCH_TTEST_ORACLE),
    QuerySpec("countmin_token_estimates", llm.countmin_token_estimates,
              llm.COUNTMIN_ORACLE),
    QuerySpec("rolling_wau", an.rolling_wau, an.ROLLING_WAU_ORACLE),
    QuerySpec("dq_audit_orders", an.dq_audit_orders, an.DQ_AUDIT_ORACLE),
    QuerySpec("token_cooccurrence_pairs", llm.token_cooccurrence_pairs,
              llm.TOKEN_COOCCURRENCE_ORACLE),
    QuerySpec("mixture_apply_sample", llm.mixture_apply_sample,
              llm.MIXTURE_APPLY_ORACLE),
    QuerySpec("sequence_pattern_match", an.sequence_pattern_match,
              an.SEQUENCE_PATTERN_ORACLE),
    QuerySpec("streaming_semi_join_e2e", ref.streaming_semi_join_e2e,
              ref.STREAMING_SEMI_JOIN_ORACLE),
    QuerySpec("weighted_priority_sample", llm.weighted_priority_sample,
              llm.WEIGHTED_SAMPLE_ORACLE),
    QuerySpec("user_acquisition_curve", an.user_acquisition_curve,
              an.USER_ACQUISITION_ORACLE),
    QuerySpec("graph_bfs_hops", an.graph_bfs_hops, an.GRAPH_BFS_ORACLE),
    QuerySpec("rolling_wau_hll", an.rolling_wau_hll,
              an.ROLLING_WAU_HLL_ORACLE),
    QuerySpec("markov_event_transitions", an.markov_event_transitions,
              an.MARKOV_TRANSITIONS_ORACLE),
    QuerySpec("streaming_complete_topk_e2e", ref.streaming_complete_topk_e2e,
              ref.STREAMING_COMPLETE_TOPK_ORACLE),
    QuerySpec("lateral_topk_orders", rel.lateral_topk_orders,
              rel.LATERAL_TOPK_ORACLE),
    QuerySpec("tokenizer_vocab_coverage", llm.tokenizer_vocab_coverage,
              llm.TOKENIZER_COVERAGE_ORACLE),
    QuerySpec("incremental_agg_maintenance", an.incremental_agg_maintenance,
              an.INCREMENTAL_AGG_ORACLE),
    QuerySpec("mad_outlier_scores", an.mad_outlier_scores,
              an.MAD_OUTLIER_ORACLE),
    QuerySpec("scalar_string_functions_2", rel.scalar_string_functions_2,
              rel.SCALAR_STRING2_ORACLE),
    QuerySpec("session_windows_dynamic_gap", ref.session_windows_dynamic_gap,
              ref.SESSION_DYNAMIC_GAP_ORACLE),
    QuerySpec("streaming_full_outer_interval_join_e2e",
              ref.streaming_full_outer_interval_join_e2e,
              ref.STREAMING_FULL_OUTER_INTERVAL_JOIN_ORACLE),
    QuerySpec("grouping_id_rollup", rel.grouping_id_rollup,
              rel.GROUPING_ID_ORACLE),
    QuerySpec("time_to_convert_distribution", an.time_to_convert_distribution,
              an.TIME_TO_CONVERT_ORACLE),
    QuerySpec("dq_reconcile_order_totals", an.dq_reconcile_order_totals,
              an.DQ_RECONCILE_ORACLE),
    QuerySpec("observed_clean_metrics", llm.observed_clean_metrics,
              llm.OBSERVED_CLEAN_ORACLE),
    QuerySpec("zipf_token_fit", llm.zipf_token_fit, llm.ZIPF_FIT_ORACLE),
    QuerySpec("dedup_method_comparison", llm.dedup_method_comparison,
              llm.DEDUP_METHOD_COMPARISON_ORACLE),
    QuerySpec("seasonality_profile", an.seasonality_profile,
              an.SEASONALITY_ORACLE),
    QuerySpec("bigram_logprob_scores", llm.bigram_logprob_scores,
              llm.BIGRAM_LOGPROB_ORACLE),
    QuerySpec("source_token_pmi", llm.source_token_pmi,
              llm.SOURCE_PMI_ORACLE),
    QuerySpec("higher_order_array_functions", llm.higher_order_array_functions,
              llm.HIGHER_ORDER_ARRAY_ORACLE),
    QuerySpec("equi_depth_histogram_values", an.equi_depth_histogram_values,
              an.EQUI_DEPTH_ORACLE),
    QuerySpec("dedup_ensemble_agreement", llm.dedup_ensemble_agreement,
              llm.DEDUP_ENSEMBLE_ORACLE),
    # -- Round-5 gate priority: queries whose semantics or oracle
    # changed in round 5, so they need a FRESH driver row.
    # dedup_minhash_lsh + similarity_ivf_kmeans graduated from
    # rows-only to hash-checked (verdict r04 items #1/#5);
    # q1's half-up division moved to the even-divisor form in both
    # engines (verdict r04 item #2). ------------------------------------
    QuerySpec("dedup_minhash_lsh", llm.dedup_minhash_lsh,
              llm.DEDUP_MINHASH_LSH_ORACLE, headline=True),
    QuerySpec("similarity_ivf_kmeans", llm.similarity_ivf_kmeans,
              llm.SIMILARITY_IVF_KMEANS_ORACLE),
    QuerySpec("q1_pricing_summary", rel.q1_pricing_summary, rel.Q1_ORACLE,
              headline=True),
    # -- Round-4 gate priority: the 15 queries with no driver
    # CORRECTNESS row in any prior round (r01-r03 gated the same ~50
    # entry window; these sat beyond it). Verdict r03 item #1. -----------
    QuerySpec("scd2_user_value_history", rel.scd2_user_value_history,
              rel.SCD2_ORACLE),
    QuerySpec("cogroup_user_conversion", an.cogroup_user_conversion,
              an.COGROUP_CONVERSION_ORACLE),
    QuerySpec("streaming_outer_interval_join_e2e",
              ref.streaming_outer_interval_join_e2e,
              ref.STREAMING_OUTER_INTERVAL_JOIN_ORACLE),
    QuerySpec("streaming_upsert_sink_e2e", ref.streaming_upsert_sink_e2e,
              ref.STREAMING_TOTALS_ORACLE),
    QuerySpec("events_variant_kpi", ref.events_variant_kpi,
              ref.EVENTS_VARIANT_ORACLE),
    QuerySpec("approx_percentile_values", rel.approx_percentile_values,
              rel.APPROX_PERCENTILE_ORACLE),
    QuerySpec("doc_chunks_udtf", llm.doc_chunks_udtf, llm.DOC_CHUNKS_ORACLE),
    QuerySpec("pyds_synthetic_activity_stats",
              ref.pyds_synthetic_activity_stats,
              ref.SYNTHETIC_ACTIVITY_ORACLE),
    QuerySpec("q14_promo_revenue_share", t2.q14_promo_revenue_share,
              t2.Q14_ORACLE),
    QuerySpec("q15_top_supplier", t2.q15_top_supplier, t2.Q15_ORACLE),
    QuerySpec("q16_part_supplier_counts", t2.q16_part_supplier_counts,
              t2.Q16_ORACLE),
    QuerySpec("q17_small_quantity_revenue", t2.q17_small_quantity_revenue,
              t2.Q17_ORACLE),
    QuerySpec("q19_disjunctive_predicates", t2.q19_disjunctive_predicates,
              t2.Q19_ORACLE),
    QuerySpec("q21_waiting_suppliers", t2.q21_waiting_suppliers,
              t2.Q21_ORACLE),
    QuerySpec("q22_idle_rich_customers", t2.q22_idle_rich_customers,
              t2.Q22_ORACLE),
    # -- North-star LLM ops (no driver row in round 1) ------------------
    QuerySpec("dedup_exact_docs", llm.dedup_exact_docs,
              llm.DEDUP_EXACT_ORACLE, headline=True),
    QuerySpec("dedup_minhash_recall", llm.dedup_minhash_recall,
              llm.DEDUP_MINHASH_RECALL_ORACLE),
    QuerySpec("dedup_ngram_jaccard", llm.dedup_ngram_jaccard,
              llm.DEDUP_NGRAM_ORACLE),
    QuerySpec("dedup_simhash", llm.dedup_simhash, llm.DEDUP_SIMHASH_ORACLE),
    QuerySpec("dedup_cluster_components", llm.dedup_cluster_components,
              llm.DEDUP_CLUSTER_ORACLE),
    QuerySpec("clean_corpus_pipeline", llm.clean_corpus_pipeline,
              llm.CLEAN_CORPUS_ORACLE),
    QuerySpec("similarity_topk_cosine", llm.similarity_topk_cosine,
              llm.SIMILARITY_TOPK_ORACLE, headline=True),
    QuerySpec("similarity_lsh_bucketed", llm.similarity_lsh_bucketed,
              llm.SIMILARITY_LSH_ORACLE),
    QuerySpec("similarity_ivf_topk", llm.similarity_ivf_topk,
              llm.SIMILARITY_IVF_ORACLE),
    QuerySpec("dedup_embedding_cosine", llm.dedup_embedding_cosine,
              llm.DEDUP_EMBEDDING_ORACLE),
    QuerySpec("embeddings_label_stats", llm.embeddings_label_stats,
              llm.EMBEDDINGS_STATS_ORACLE),
    QuerySpec("embeddings_by_doc_source", llm.embeddings_by_doc_source,
              llm.EMB_BY_SOURCE_ORACLE),
    QuerySpec("embedding_label_centroids", llm.embedding_label_centroids,
              llm.EMB_CENTROIDS_ORACLE),
    QuerySpec("embedding_norms", llm.embedding_norms,
              llm.EMBEDDING_NORMS_ORACLE),
    QuerySpec("text_quality_scores", llm.text_quality_scores,
              llm.TEXT_QUALITY_ORACLE, headline=True),
    QuerySpec("lang_id_heuristic", llm.lang_id_heuristic, llm.LANG_ID_ORACLE),
    QuerySpec("doc_fingerprints", llm.doc_fingerprints,
              llm.DOC_FINGERPRINT_ORACLE),
    QuerySpec("token_counts_top", llm.token_counts_top,
              llm.TOKEN_COUNTS_ORACLE, headline=True),
    QuerySpec("tfidf_top_terms", llm.tfidf_top_terms, llm.TFIDF_ORACLE),
    QuerySpec("regex_token_stats", llm.regex_token_stats,
              llm.REGEX_TOKEN_ORACLE),
    QuerySpec("doc_chunks", llm.doc_chunks, llm.DOC_CHUNKS_ORACLE),
    QuerySpec("binary_payload_features", llm.binary_payload_features,
              llm.BINARY_FEATURES_ORACLE),
    QuerySpec("dedup_keep_first_docs", llm.dedup_keep_first_docs,
              llm.DEDUP_KEEP_FIRST_ORACLE),
    QuerySpec("multimodal_image_features", llm.multimodal_image_features,
              llm.MULTIMODAL_FEATURES_ORACLE),
    # -- Analytic / statistical / pipeline-split (no driver row yet) ----
    QuerySpec("sessionize_events", an.sessionize_events,
              an.SESSIONIZE_ORACLE, headline=True),
    QuerySpec("user_event_deltas", an.user_event_deltas,
              an.USER_DELTAS_ORACLE),
    QuerySpec("stats_by_event_type", an.stats_by_event_type, an.STATS_ORACLE),
    QuerySpec("split_train_holdout", an.split_train_holdout, an.SPLIT_ORACLE),
    QuerySpec("histogram_event_values", an.histogram_event_values,
              an.HISTOGRAM_ORACLE),
    QuerySpec("posexplode_tokens", an.posexplode_tokens,
              an.POSEXPLODE_ORACLE),
    QuerySpec("union_by_name_evolution", an.union_by_name_evolution,
              an.UNION_BY_NAME_ORACLE),
    QuerySpec("except_all_multiset", an.except_all_multiset,
              an.EXCEPT_ALL_ORACLE),
    QuerySpec("multi_grain_time_rollup", an.multi_grain_time_rollup,
              an.MULTI_GRAIN_ORACLE),
    QuerySpec("intersect_all_multiset", an.intersect_all_multiset,
              an.INTERSECT_ALL_ORACLE),
    QuerySpec("window_rank_functions", an.window_rank_functions,
              an.WINDOW_RANK_ORACLE),
    QuerySpec("regexp_scalar_functions", an.regexp_scalar_functions,
              an.REGEXP_ORACLE),
    QuerySpec("time_spine_gapfill", an.time_spine_gapfill,
              an.TIME_SPINE_ORACLE),
    QuerySpec("skew_salted_enrichment", an.skew_salted_enrichment,
              an.SKEW_SALTED_ORACLE),
    # -- New or reshaped this round (gate-priority order within the
    # section: the verdict-requested and north-star entries first, so
    # they sit inside a ~50-entry gate window; API-variant queries
    # whose oracle twin is already in-window come after) --------------
    QuerySpec("approx_distinct_users", rel.approx_distinct_users,
              rel.APPROX_DISTINCT_ORACLE),
    QuerySpec("q20_dominant_part_suppliers", t2.q20_dominant_part_suppliers,
              t2.Q20_ORACLE),
    QuerySpec("streaming_sliding_window_e2e",
              ref.streaming_sliding_window_e2e, ref.SLIDING_WINDOW_ORACLE),
    QuerySpec("decontaminate_ngrams", llm.decontaminate_ngrams,
              llm.DECONTAMINATE_ORACLE),
    QuerySpec("stratified_sample_by_source", llm.stratified_sample_by_source,
              llm.STRATIFIED_SAMPLE_ORACLE),
    QuerySpec("bigram_counts_top", llm.bigram_counts_top,
              llm.BIGRAM_COUNTS_ORACLE),
    QuerySpec("unigram_logprob_scores", llm.unigram_logprob_scores,
              llm.UNIGRAM_LOGPROB_ORACLE),
    QuerySpec("gopher_repetition_flags", llm.gopher_repetition_flags,
              llm.GOPHER_REPETITION_ORACLE),
    QuerySpec("map_props_entries", t2.map_props_entries, t2.MAP_PROPS_ORACLE),
    QuerySpec("asof_next_click_after_signup",
              rel.asof_next_click_after_signup, rel.ASOF_FORWARD_ORACLE),
    # -- Reference surface (events table; green in round 1) -------------
    # NOTE on the streaming e2e entries here and in the round-4 block
    # above: streaming_tws_user_stats_e2e (reference_queries.py) is
    # NOT registered — transformWithStateInPandas needs the protobuf
    # Python package at streaming-runner startup, absent in this
    # sandbox (same env-constraint class as Kafka/JDBC). The operator
    # + e2e query exist and self-test where the dependency is
    # available (tests/test_streaming_ops.py skips cleanly here); the
    # applyInPandasWithState twin (streaming_running_user_totals) is
    # the gate-checked form.
    QuerySpec("activity_windowed_count", ref.activity_windowed_count,
              ref.ACTIVITY_WINDOWED_ORACLE, headline=True),
    QuerySpec("activity_passthrough", ref.activity_passthrough,
              ref.ACTIVITY_PASSTHROUGH_ORACLE),
    QuerySpec("events_json_kpi", ref.events_json_kpi, ref.EVENTS_JSON_ORACLE,
              headline=True),
    QuerySpec("sliding_window_counts", ref.sliding_window_counts,
              ref.SLIDING_WINDOW_ORACLE),
    QuerySpec("session_windows_per_user", ref.session_windows_per_user,
              ref.SESSION_WINDOW_ORACLE, headline=True),
    QuerySpec("streaming_running_user_totals", ref.streaming_running_user_totals,
              ref.STREAMING_TOTALS_ORACLE),
    QuerySpec("streaming_windowed_count_e2e", ref.streaming_windowed_count_e2e,
              ref.ACTIVITY_WINDOWED_ORACLE),
    QuerySpec("streaming_session_windows_e2e",
              ref.streaming_session_windows_e2e, ref.SESSION_WINDOW_ORACLE),
    QuerySpec("streaming_dedup_e2e", ref.streaming_dedup_e2e,
              ref.STREAMING_DEDUP_ORACLE),
    QuerySpec("streaming_interval_join_e2e", ref.streaming_interval_join_e2e,
              ref.STREAMING_INTERVAL_JOIN_ORACLE),
    QuerySpec("streaming_split_e2e", ref.streaming_split_e2e,
              ref.STREAMING_SPLIT_ORACLE),
    QuerySpec("streaming_static_enrich_e2e", ref.streaming_static_enrich_e2e,
              ref.STREAMING_ENRICH_ORACLE),
    QuerySpec("synthetic_activity_stats", ref.synthetic_activity_stats,
              ref.SYNTHETIC_ACTIVITY_ORACLE),
    # -- Relational gap map (green in round 1) --------------------------
    QuerySpec("q3_shipping_priority", rel.q3_shipping_priority, rel.Q3_ORACLE,
              headline=True),
    QuerySpec("q5_local_supplier_volume", rel.q5_local_supplier_volume,
              rel.Q5_ORACLE, headline=True),
    QuerySpec("q6_forecast_revenue", rel.q6_forecast_revenue, rel.Q6_ORACLE,
              headline=True),
    QuerySpec("q4_order_priority_exists", rel.q4_order_priority_exists,
              rel.Q4_ORACLE),
    QuerySpec("having_big_customers", rel.having_big_customers,
              rel.HAVING_ORACLE),
    QuerySpec("q18_large_volume_orders", rel.q18_large_volume_orders,
              rel.Q18_ORACLE),
    QuerySpec("agg_argminmax_mode", rel.agg_argminmax_mode,
              rel.AGG_ARGMINMAX_ORACLE),
    QuerySpec("nullsafe_join_events", rel.nullsafe_join_events,
              rel.NULLSAFE_JOIN_ORACLE),
    QuerySpec("join_semi_customers", rel.join_semi_customers,
              rel.JOIN_SEMI_ORACLE),
    QuerySpec("join_anti_customers", rel.join_anti_customers,
              rel.JOIN_ANTI_ORACLE),
    QuerySpec("join_outer_nation_suppliers", rel.join_outer_nation_suppliers,
              rel.JOIN_OUTER_ORACLE),
    QuerySpec("join_range_price_bands", rel.join_range_order_events,
              rel.JOIN_RANGE_ORACLE),
    QuerySpec("topk_orders_per_customer", rel.topk_orders_per_customer,
              rel.TOPK_ORACLE, headline=True),
    QuerySpec("window_running_spend", rel.window_running_spend,
              rel.WINDOW_RUNNING_ORACLE),
    QuerySpec("rollup_order_stats", rel.rollup_order_stats, rel.ROLLUP_ORACLE),
    QuerySpec("cube_part_stats", rel.cube_part_stats, rel.CUBE_ORACLE),
    QuerySpec("setops_nation_overlap", rel.setops_nation_overlap,
              rel.SETOPS_INTERSECT_ORACLE),
    QuerySpec("setops_nation_except", rel.setops_nation_except,
              rel.SETOPS_EXCEPT_ORACLE),
    QuerySpec("union_high_balance_parties", rel.union_high_balance_parties,
              rel.UNION_ORACLE),
    QuerySpec("distinct_users_per_type", rel.distinct_users_per_type,
              rel.DISTINCT_USERS_ORACLE),
    QuerySpec("percentile_event_values", rel.percentile_event_values,
              rel.PERCENTILE_ORACLE),
    QuerySpec("scalar_string_math", rel.scalar_string_math,
              rel.SCALAR_STRING_ORACLE),
    QuerySpec("scalar_date_functions", rel.scalar_date_functions,
              rel.SCALAR_DATE_ORACLE),
    QuerySpec("grouping_sets_order_stats", rel.grouping_sets_order_stats,
              rel.GROUPING_SETS_ORACLE),
    QuerySpec("pivot_daily_event_counts", rel.pivot_daily_event_counts,
              rel.PIVOT_ORACLE),
    QuerySpec("asof_last_click_before_purchase",
              rel.asof_last_click_before_purchase, rel.ASOF_ORACLE,
              headline=True),
    QuerySpec("scalar_array_json", rel.scalar_array_json,
              rel.SCALAR_ARRAY_JSON_ORACLE),
    # -- TPC-H second wave, gate-covered portion (green in round 1) -----
    QuerySpec("q2_min_unitprice_supplier", t2.q2_min_unitprice_supplier,
              t2.Q2_ORACLE),
    QuerySpec("q7_volume_shipping", t2.q7_volume_shipping, t2.Q7_ORACLE),
    QuerySpec("q8_market_share", t2.q8_market_share, t2.Q8_ORACLE),
    QuerySpec("q9_product_type_profit", t2.q9_product_type_profit,
              t2.Q9_ORACLE, headline=True),
    QuerySpec("q10_returned_items", t2.q10_returned_items, t2.Q10_ORACLE),
    QuerySpec("q11_part_value_share", t2.q11_part_value_share, t2.Q11_ORACLE),
    QuerySpec("q12_priority_by_linestatus", t2.q12_priority_by_linestatus,
              t2.Q12_ORACLE),
    QuerySpec("q13_customer_order_distribution",
              t2.q13_customer_order_distribution, t2.Q13_ORACLE),
]

QUERIES: dict[str, QuerySpec] = {s.name: s for s in _SPECS}
HEADLINE_QUERIES: tuple[str, ...] = tuple(s.name for s in _SPECS if s.headline)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle
    }
