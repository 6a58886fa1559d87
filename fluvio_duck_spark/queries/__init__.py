"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named (spark_fn, oracle_sql) pair.  The driver runs the Spark side and
the DuckDB oracle side-by-side and hash-compares results (BASELINE.md t2).

Submodules register into their own ``QUERIES`` dict; ``all_queries()``
merges them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


#: Latest-driver-receipt bookkeeping.  As of round 8 every registered name
#: has at least one row in some CORRECTNESS_r0N.json (lifetime coverage is
#: complete), so the sets below partition the registry by the MOST RECENT
#: round in which the driver receipted each name (computed from
#: CORRECTNESS_r01–r09; each name appears in exactly one set).  Six rounds
#: of refactors ran over shared plumbing since the r01–r03 receipts, so
#: ``all_queries()`` now rotates: never-receipted new registrations first,
#: then oldest receipts ascending — a ~50-name driver sample refreshes the
#: ~50 stalest receipts each round (r8 verdict "Next round" #3).
#: REFRESH each round: move the names CORRECTNESS_r0N sampled into a new
#: _LATEST_RECEIPT_R0N set and clear _NEW_THIS_ROUND.
_LATEST_RECEIPT_R02 = frozenset({
    "agg_gini_by_type", "agg_promo_ratio", "agg_winsorized_mean",
    "batch_sessionize", "correlated_small_quantity", "dedup_semantic",
    "join_large_orders", "join_rich_idle_customers", "join_topk_shipping",
    "ngram_corpus_topk", "rollup_cascade_daily",
    "rollup_hist_percentiles", "rollup_hourly", "sample_stratified_quota",
    "sample_temperature_mixture", "sample_weighted_quota",
    "sim_range_search", "text_decontaminate", "text_pii_redact",
    "text_quality_gate", "text_seqlen_histogram", "window_quantile_bins",
})

_LATEST_RECEIPT_R03 = frozenset({
    "curate_domain_report", "curate_pipeline_e2e", "dedup_boilerplate",
    "dedup_canonical", "dedup_components", "dedup_exact",
    "dedup_incremental", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_prefix_blocks", "dedup_segments", "dedup_simhash",
    "dedup_substring_spans", "grouped_minmax_scale", "pack_token_budget",
    "sample_split_assign", "sample_training_order",
    "sample_upsample_repeat", "sim_embedding_near_dups", "sim_ivf_topk",
    "sim_ivf_topk_batch", "sim_ivf_trained", "sim_knn_graph",
    "sim_label_noise", "sim_matryoshka_energy", "sim_mmr_rerank",
    "sim_near_dups_blocked", "sim_normalize_embeddings", "sim_pq_rerank",
    "sim_random_projection", "sim_scalar_quantize", "sim_topk_batch",
    "sim_topk_batch_exact", "sim_topk_bruteforce", "text_bigram_logprob",
    "text_bm25_search", "text_char_entropy", "text_chunk_documents",
    "text_fingerprint_winnow", "text_hybrid_rrf", "text_langid_ngram",
    "text_quality_langid", "text_repetition", "text_stats",
    "text_tfidf_topterms", "text_token_regex", "text_unigram_logprob",
    "text_vocab_oov",
})

_LATEST_RECEIPT_R04 = frozenset({
    "consume_aggregate_fold", "consume_infer_typed", "curate_dsir_select",
    "curate_split_leakage", "curate_token_epochs", "dedup_jaccard_prefix",
    "dedup_minhash_portable", "dedup_semantic_portable",
    "dedup_simhash_portable", "eval_auc", "eval_calibration",
    "eval_ndcg_mrr", "mm_extract_features", "mm_frame_stats",
    "mm_sniff_formats", "pack_shard_manifest", "sim_anisotropy",
    "sim_binary_hamming", "sim_dim_stats", "sim_ivf_kmeans_portable",
    "sim_label_propagation", "sim_pq_portable", "stream_asof_enrich",
    "stream_audit_checksum", "stream_cdc_apply", "stream_compact_latest",
    "stream_consume_parity", "stream_datasource_parity",
    "stream_dedup_keys", "stream_dsir_gate", "stream_er_gate",
    "stream_ewma", "stream_ivm_additive", "stream_neardup_gate",
    "stream_neardup_gate_portable", "stream_ohlc_bars",
    "stream_rollup_hist", "stream_rollup_hourly", "stream_session_windows",
    "stream_skyline", "stream_sliding_windows", "stream_stateful_fold",
    "stream_static_enrich", "stream_stream_join", "stream_trend_ols",
    "stream_tumbling_windows", "text_bpe_encode", "text_bpe_fit",
    "text_dsir_weights", "text_span_corruption",
})

_LATEST_RECEIPT_R05 = frozenset({
    "agg_mode_event_type", "agg_ordered_list", "agg_stats_family",
    "agg_weighted_median", "cdc_apply_latest", "cohort_retention",
    "curate_classifier_gate", "curate_curriculum_order",
    "curate_keep_drop_manifest", "curate_source_cap",
    "dedup_containment_prefix", "dedup_edit_distance",
    "dedup_survivorship", "drift_psi_by_type", "funnel_conversion",
    "funnel_windowed", "graph_pagerank", "grouped_robust_scale",
    "mm_dedup_content_exact", "mm_extract_features_portable",
    "mm_frame_bytes", "mm_phash_neardup", "mm_resize_stats",
    "profile_documents", "rollup_gapfill_hourly", "sample_hard_negatives",
    "sample_negatives", "sample_time_folds", "scalar_bitwise_funcs",
    "sim_group_centroids", "sim_ivf_cell_balance", "sim_ivf_recall",
    "sim_mutual_knn", "sim_power_iteration_portable", "sim_topk_filtered",
    "sim_topk_filtered_ivf", "sim_whiten_residual",
    "stream_classifier_gate", "stream_decontaminate_gate",
    "stream_dsir_select", "stream_neardup_incremental",
    "stream_novelty_gate", "text_bpe_fertility", "text_compression_ratio",
    "text_novelty_fraction", "text_pmi_cooccurrence", "window_locf_fill",
    "window_trailing_features",
})

_LATEST_RECEIPT_R06 = frozenset({
    "ab_welch_ttest", "agg_bool_family", "attrib_first_last_touch",
    "audit_table_checksum", "basket_copurchase_lift",
    "cdc_roundtrip_identity", "er_fuzzy_join_parts", "eval_cohens_kappa",
    "events_attribution", "events_dau_wau", "events_journey_patterns",
    "events_markov_transitions", "events_pareto_share",
    "events_rfm_segments", "forecast_backtest_mape",
    "funnel_time_to_convert", "geo_route_distance", "graph_kcore",
    "graph_triangles", "ivm_delta_agg", "join_not_in_nullaware",
    "join_point_in_time", "merge_upsert_apply", "pareto_skyline",
    "privacy_k_anonymity", "quality_expectations", "rollup_gapfill_interp",
    "rollup_hll_sliding_wau", "scalar_map_funcs", "scalar_try_funcs",
    "sessions_journey_patterns", "sink_compacted_roundtrip",
    "sink_partitioned_export", "sketch_bloom_join_filter",
    "sketch_cms_users", "sketch_segment_overlap", "snapshot_diff",
    "source_csv_parity", "source_datasource_parity", "source_jsonl_parity",
    "source_mapped_typed", "source_orc_parity", "source_schema_evolution",
    "stats_join_estimate", "trend_ols_by_type", "ts_anomaly_mad",
    "ts_autocorr_hourly", "window_ewma", "window_rolling_stats",
    "window_running_distinct",
})

_LATEST_RECEIPT_R07 = frozenset({
    "agg_conditional_priority", "agg_exact_percentiles",
    "consume_aggregate_fold_partitioned", "dedup_threshold_calibration",
    "eval_brier_decomposition", "eval_pass_at_k",
    "events_out_of_order_audit", "ivm_delta_join",
    "mm_audio_energy_segments", "pack_concat_sequences",
    "rollup_kmv_weekly_users", "sink_wds_roundtrip", "sketch_kmv_distinct",
    "sketch_kmv_set_ops", "stream_kmv_distinct", "stream_pp_consume_opts",
    "stream_pp_datasource_parity", "stream_pp_windows",
    "text_compressibility_companion",
})

_LATEST_RECEIPT_R08 = frozenset({
    "agg_approx", "agg_part_value_share", "agg_salted_hotkey",
    "agg_supplier_cnt", "consume_beginning_rows", "consume_compact_latest",
    "consume_compact_tombstones", "consume_default_end_empty",
    "consume_head_rows", "consume_heavy_hitters", "consume_mapped_typed",
    "consume_partition_select", "consume_pp_budget",
    "consume_pp_partition_head", "consume_pp_tail",
    "consume_pp_transform_tail", "consume_smartmodule_filter",
    "consume_sql_avg_by_route", "consume_sql_join_topics",
    "consume_sql_pp", "consume_sql_pp_mapped", "consume_sql_topic_leo",
    "consume_start_end", "consume_tail_default", "consume_topic_tail",
    "consume_transform_chain", "consume_transform_jolt",
    "consume_transform_jolt_full", "fluvio_partitions", "fluvio_topics",
    "join_asof_nearest", "join_excess_shippers", "join_min_cost_supplier",
    "join_salted_skew", "loopback_filter_pushdown",
    "loopback_partitions_leo", "loopback_pp_tail",
    "loopback_stream_parity", "loopback_transform_tail",
    "partitions_sum_leo", "pp_partitions_leo", "rollup_hll_daily_users",
    "rollup_ohlc_bars", "sim_ann_lsh", "sim_near_dups_bucketed",
    "sink_wds_multimodal_roundtrip", "sketch_bloom_xxhash_fp",
    "source_pp_offsets_parity", "sql_passthrough", "unpivot_metrics",
})

_LATEST_RECEIPT_R09 = frozenset({
    "above_avg_orders", "agg_cube", "agg_distinct",
    "agg_filtered_revenue", "agg_grouping_sets", "agg_market_share",
    "agg_pricing_summary", "agg_rollup", "consume_transform_array_map",
    "consume_transform_filter_map", "join_anti", "join_asof",
    "join_asof_broadcast", "join_asof_forward", "join_asof_tolerance",
    "join_disjunctive_bands", "join_full_outer", "join_left_order_counts",
    "join_order_count_dist", "join_profit_by_nation_year",
    "join_range_band", "join_returned_top_customers",
    "join_revenue_by_nation", "join_semi", "join_session_error_overlap",
    "join_shipping_priority", "join_top_supplier", "join_volume_shipping",
    "join_waiting_suppliers", "loopback_aggregate_pushdown",
    "loopback_array_map_pushdown", "loopback_filter_map_pushdown",
    "loopback_transform_pushdown", "pivot_qty_by_status",
    "scalar_array_funcs", "scalar_case_buckets", "scalar_date_funcs",
    "scalar_math_funcs", "scalar_regex_null_funcs", "scalar_string_funcs",
    "scd2_intervals", "set_ops", "set_ops_all", "topk_orders",
    "window_distribution", "window_order_gaps", "window_rank_ntile",
    "window_running_spend", "window_topk_per_customer", "window_zscore",
})

_RECEIPT_ROUNDS: tuple[frozenset[str], ...] = (
    _LATEST_RECEIPT_R02, _LATEST_RECEIPT_R03, _LATEST_RECEIPT_R04,
    _LATEST_RECEIPT_R05, _LATEST_RECEIPT_R06, _LATEST_RECEIPT_R07,
    _LATEST_RECEIPT_R08, _LATEST_RECEIPT_R09,
)

#: Queries REGISTERED this round: never driver-receipted, so they lead the
#: ordering — the very next ~50-name driver sample must cover them before
#: refreshing old receipts (every new operator needs a first receipt).
_NEW_THIS_ROUND: frozenset[str] = frozenset({
    "loopback_chain_prefix_pushdown",
    "layout_zorder_skipping",
    "layout_compaction_plan",
    "sample_reservoir_global",
    "mm_scene_cuts",
    "stream_reservoir_sample",
    "eval_bradley_terry",
    "eval_bootstrap_ci",
})

#: Names whose latest receipt is stale-red or predates an oracle pairing
#: (none currently — the r7 backlog was closed in r8).  Kept as a hook:
#: anything placed here jumps to the front of the rotation.
_REVERIFY: frozenset[str] = frozenset()


def all_queries() -> dict[str, QuerySpec]:
    from fluvio_duck_spark.queries import (
        consume_queries,
        llm,
        loopback_queries,
        multimodal_queries,
        pipeline,
        quality,
        relational,
        streaming_queries,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (consume_queries, relational, llm, streaming_queries,
                   multimodal_queries, pipeline, quality, loopback_queries):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    receipted: set[str] = set()
    for i, s in enumerate(_RECEIPT_ROUNDS):
        dup = receipted & s
        if dup:
            raise ValueError(f"name in two receipt rounds: {dup}")
        receipted |= s
    if not _NEW_THIS_ROUND.isdisjoint(receipted):
        raise ValueError(
            f"_NEW_THIS_ROUND overlaps receipts: {_NEW_THIS_ROUND & receipted}"
        )
    # Ordering for a time-bounded driver sample (~50 names): reverify
    # flags first, then never-receipted registrations (new this round or
    # otherwise), then oldest receipts ascending by round.
    ordered = {k: v for k, v in merged.items() if k in _REVERIFY}
    ordered.update(
        (k, v) for k, v in merged.items()
        if k not in receipted and k not in _REVERIFY
    )
    for s in _RECEIPT_ROUNDS:
        ordered.update((k, v) for k, v in merged.items() if k in s)
    return ordered
