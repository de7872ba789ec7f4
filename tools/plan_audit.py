"""Physical-plan audit: renders the formatted Spark plan for a set of
queries plus the scale indicators that matter at 100 TB — shuffle
(Exchange) count, broadcast joins, whole-stage-codegen coverage, and
whether filters/projections reached the parquet scan.

Usage:
    PYTHONPATH=. python tools/plan_audit.py [sf_dir] [query ...] > PLANS.md

With no query names: audits the bench headliners plus the scale-critical
extension pipelines. This is evidence generation, not a gate — the hard
assertions live in tests/test_scale_plans.py (AQE skew split, bucketed
Exchange elimination, pushdown reaching the scan, no-cartesian and
no-unpartitioned-window invariants over every registered query).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

# script-style invocation shim (same as verify_local.py): repo root on path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # bench headliners
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "flagship_top_orders",
    "d1_month_rollup",
    "j1_inner_join_agg",
    "t1_topk_orders",
    "a1_a4_global_aggs",
    "x_dedup_exact",
    "x_line_dedup",
    "a10_stat_moments",
    "x_knn_cosine_topk",
    # scale-critical extension pipelines
    "x_dedup_minhash_lsh",
    "x_corpus_e2e",
    "x_pagerank",
    "x_bloom_semi_prune",
    "x_global_rank",
    "x_rfm_segments",
    "j6_asof_join",
    "x_interval_overlap",
    "x_bm25_topk",
    "x_scd2_history",
    "x_merge_upsert",
    "x_range_frame_trailing",
    "x_salted_join_revenue",
    "x_fpgrowth_itemsets",
    "x_expectations_orders",
    "x_funnel_steps",
    "x_event_transitions",
    "x_session_paths",
    "a18_anomaly_mad",
    "g5_unpivot",
    "x_zorder_key",
    "s7_stream_dedup",
    "x_ohlc_bars",
    "x_incremental_rollup",
    "x_funnel_strict",
    "x_mom_growth",
    "a19_chi2_contingency",
    "x_pareto_frontier",
    "x_scd2_asof",
    # round-5 additions
    "x_linreg_trend",
    "x_autocorr_daily",
    "x_cumulative_distinct",
    "x_ks_two_sample",
    "x_gini_concentration",
    "x_stratified_split",
    "x_token_entropy",
    "x_time_weighted_avg",
    "x_histogram_quantile",
    "x_join_size_estimate",
    "x_countmin_freq",
    "x_table_checksum",
    "x_ewma_halflife",
    "x_abtest_lift",
    "s8_view_click_left",
    "x_zonemap_prune",
    "x_rolling_distinct_7d",
    "x_scd2_event_enrich",
    "x_dataset_publish_e2e",
    "x_benford_digits",
    "x_basket_lift",
    "x_welch_ttest",
    "x_crosscorr_lagged",
    "x_cusum_changepoint",
    "x_ltv_cohort_triangle",
    # round-6 additions
    "x_dedup_jaccard_join",
    "x_dedup_incremental",
    "x_semdedup",
    "x_tokens_e2e",
    "j10_full_outer",
    "w5_rank_fractions",
    "x_bfs_hops",
    # round-7/8 additions (VERDICT r7 #8: semdedup kmeans chain, bucketed
    # join, bloom, zorder, dsir all need an audited executed plan)
    "x_bloom_decontaminate",
    "x_dsir_select",
    "x_zorder_cells",
    "x_bucketed_join",
    "x_decontam_e2e",
    "x_zorder_pruning_gain",
    "x_minhash_calibration",
    "x_ivf_recall",
    "x_label_propagation",
    "x_ingest_gate_e2e",
    "x_kcore_layers",
    # round-9 additions
    "x_hybrid_rrf",
    "x_random_walks",
    "x_compaction_plan",
    "x_vocab_coverage",
    "x_media_ahash_pairs",
    "x_tvd_drift",
    "x_length_bucketing",
    "x_target_encoding",
    "x_audio_energy",
    "x_video_shot_boundaries",
    "x_weighted_sample",
    "x_fd_profile",
    "s13_stream_scd2_enrich",
    "x_feature_hashing",
    "x_entity_resolution_e2e",
    # round-10 additions: the re-based blocked matcher's twin, executed
    # compaction, codec probe, stateful anomaly stream, LPA modularity,
    # composed IVF-PQ
    "x_levenshtein_blocked",
    "x_compaction_apply",
    "x_media_codec_coverage",
    "s14_stream_anomaly",
    "x_graph_modularity",
    "x_knn_ivfpq_topk",
    "x_passjoin_ed1",
    "s15_stream_session_timeout",
    # round-11 queries
    "x_ri_audit",
    "x_deletion_vectors",
    "x_snapshot_restore",
    "x_format_roundtrip",
    "s16_stream_hour_day_rollup",
    "x_graph_jaccard",
    "x_recs_eval",
    "x_knn_filtered_topk",
    "x_scd2_late_correction",
    "x_malformed_quarantine",
    "s17_stream_topk_complete",
    "s18_stream_backfill_available_now",
    "x_wap_publish",
    # round-12 queries
    "x_mor_compact_e2e",
    "x_fd_profile_approx",
    "x_kanon_audit",
    "x_containment_join",
    "x_bpe_encode",
    "x_snapshot_asof_ts",
    "x_source_overlap_kmv",
    "x_dp_noisy_counts",
    "x_graph_scc",
    "x_mixture_temperature",
    "x_ivm_join_delta",
    "x_phrase_search",
    "x_ktruss_peel",
    "x_scc_condensation",
    # round-13 queries
    "f7_f8_row_metadata_det",
    "x_ivm_agg_delta",
    "x_hll_rollup_merge",
    "x_kanon_generalize",
    "x_cluster_medoids",
    "x_ndcg_eval",
    "x_raking_weights",
    "x_cdc_net_effect",
    "x_graph_assortativity",
    "x_media_dedup_e2e",
    "s19_dynamic_session_gap",
    "x_winsorized_stats",
    "x_embed_centroid_drift",
    "s20_view_click_semi",
    # round-14 queries
    "x_quantile_rollup_merge",
    "x_kmv_rollup_merge",
    "x_ece_calibration",
    "s21_view_click_full",
    "x_bpe_fertility",
    "x_dedup_source_priority",
    "x_auc_rank",
    "x_bootstrap_ci",
    "x_dp_bounded_contribution",
    "s22_stream_quantile_rollup",
    "x_range_partition_balance",
    "s23_stream_static_anti",
    "x_media_hash_agreement",
    "x_weighted_quantile",
]


def formatted_plan(df, execute: bool = True) -> str:
    """Simple-mode plan of the EXECUTED query: AQE's final plan is what
    actually ran — runtime exchange/broadcast reuse and skew splits only
    appear there (the initial static plan duplicates shared subtrees
    that AQE later collapses into ReusedExchange). Simple mode keeps
    operator arguments inline, so the indicators parse one section."""
    if execute:
        # collect() (not count()) — count() plans a DIFFERENT query, so
        # the df's own AQE final plan would never materialize
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    # keep only the final plan; the trailing "Initial Plan" section would
    # double-count every indicator
    return plan.split("== Initial Plan ==")[0]


def indicators(plan: str) -> dict[str, object]:
    # simple-mode spellings: "Exchange hashpartitioning(...)",
    # "FileScan parquet [...] PushedFilters: [...]", "*(N)" codegen ids
    scans = len(re.findall(r"FileScan parquet", plan))
    pushed = len(
        [m for m in re.findall(r"PushedFilters: \[([^\],.]+)", plan) if m.strip()]
    )
    return {
        "shuffles": len(
            re.findall(
                r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)",
                plan,
            )
        ),
        "single_partition_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "parquet_scans": scans,
        "scans_with_pushed_filters": pushed,
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from recommender_systems_pyspark_spark.registry import all_queries
    from recommender_systems_pyspark_spark.session import get_spark

    spark = get_spark("plan-audit")
    specs = all_queries()
    print(f"# Physical-plan audit ({sf_dir}, shuffle.partitions="
          f"{spark.conf.get('spark.sql.shuffle.partitions')})\n")
    print("Indicators per query (AQE re-plans at runtime; these are the "
          "static plans Catalyst commits to):\n")
    print("| query | shuffles | 1-part exch. | broadcasts | reused exch. "
          "| codegen spans | scans | scans w/ pushdown | sorts | cartesian |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    details: list[tuple[str, str]] = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"| {name} | (unknown query) | | | | | | | | |")
            continue
        try:
            plan = formatted_plan(spec.fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - audit robustness
            print(f"| {name} | ERROR: {type(exc).__name__} | | | | | | | | |")
            continue
        ind = indicators(plan)
        print(
            f"| {name} | {ind['shuffles']} | {ind['single_partition_exchanges']} "
            f"| {ind['broadcasts']} | {ind['reused_exchanges']} | {ind['codegen_spans']} "
            f"| {ind['parquet_scans']} | {ind['scans_with_pushed_filters']} "
            f"| {ind['sorts']} | {ind['cartesian']} |"
        )
        details.append((name, plan))
    print("\n---\n")
    for name, plan in details:
        print(f"## {name}\n\n```\n{plan}\n```\n")


if __name__ == "__main__":
    main()
