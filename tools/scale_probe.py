"""Scale probe: replicate the sf0.1 inputs K times on disk and compare
query wall time against 1x — evidence that plans stay shuffle/key-bound
rather than input-bound, i.e. that the operator shapes survive a
scale-up. Writes scratch data under .scratch/ (gitignored).

    python tools/scale_probe.py [K]     # default 10

Replication shifts doc/vec/order ids per copy so keys stay unique and
join/group cardinalities scale with the data (the hard case), not just
row counts.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
PROBES = [
    # round-6 session-2 operators
    "kmv_distinct_users_per_type",
    "kmv_source_token_overlap",
    "kmv_weekly_users_rollup",
    "kmv_join_size_profile",
    "er_golden_records",
    "domain_quota_cap",
    "packing_next_fit_stats",
    "deterministic_corpus_shuffle",
    "jaccard_prefix_filter_join",
    "web_corpus_curation_funnel",
    "seasonal_naive_backtest",
    "cdc_net_aggregate_view",
    "kmv_trailing_7day_users",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "sessionize_events",
    "dedup_exact",
    "text_quality_score",
    "ann_lsh_cosine_topk",
    # round-7 additions
    "histogram_quantile_rollup",
    "kmv_join_size_estimate",
    "ann_ivfpq_topk",
    "sq8_cosine_topk",
    "timeseries_pattern_topk",
    "embedding_snapshot_drift",
    "scd2_temporal_enrichment",
    "rolling_7day_active_users",
    "tfidf_top_terms_per_lang",
    # round-8 additions
    "quality_classifier_scores",
    "quality_classifier_eval",
    "url_registered_domain_psl",
    "image_phash_neardup",
    "sa_repeated_span_stats",
    "embedding_random_projection",
    "jl_recall_eval",
    "quality_classifier_calibration",
    "audio_energy_neardup",
    # round-9 additions
    "exact_substr_cut",
    "video_temporal_neardup",
    "logistic_quality_eval",
    "url_registered_domain_psl",  # re-probe under the full 9.5k-rule PSL
    "decontaminate_exact_substr",
    "dedup_pipeline_lee2022",
    # round-10 additions
    "warc_ingest_accounting",
    "lm_kneser_ney_score",
    "hybrid_search_rrf",
    "mojibake_repair_roundtrip",
    "rm3_expanded_search",
    "mmr_diverse_topk",
    "retrieval_eval_ndcg",
    "ccnet_perplexity_buckets",
    "dedup_lines_first_occurrence",
    "url_canonicalize_dedup",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "gopher_repetition_signals",
    "psi_value_drift_per_type",
    "attribution_last_touch",
    "zipf_fit_per_lang",
    "classifier_auc_eval",
    "margin_mining_knn",
    "holt_linear_backtest",
    "token_burstiness_topk",
    "kcore_decomposition",
    "corpus_manifest",
    "jaro_winkler_part_pairs",
    "ks_test_value_drift",
    "benford_value_audit",
    "spearman_trend_per_type",
    "cramers_v_type_weekday",
    # round-11 additions
    "corpus_hash_split_manifest",
    "unigram_lm_piece_stats",
    "classifier_kappa_eval",
    "robust_value_stats_per_type",
    "cusum_level_shift_per_type",
    "durbin_watson_hourly_per_type",
    # round-3 operators (VERDICT r3 item 6): layout, one-pass DQ,
    # samplers, histogram/profile
    "zorder_events_row_preservation",
    "dq_expectations_lineitem",
    "sample_mixture_weighted",
    "sample_exact_n_per_source",
    "event_value_histogram",
    "profile_orders_columns",
    # round-4 queries: exact-moment statistics, pivot matrix, PageRank
    # in deterministic-fold mode
    "corr_value_day_per_type",
    "pivot_user_type_matrix",
    "pagerank_event_transitions",
    # round-4 span family: duplicated-span scrubbing + per-doc novelty
    "dedup_ngram_span_removal",
    "doc_ngram_novelty",
    # round-4 warehouse/pipeline family
    "scd2_user_state_history",
    "forward_fill_event_values",
    "text_pii_redaction",
    "zscore_event_anomalies",
    "ewma_event_value_per_user",
    "brand_basket_affinity",
    "chi2_value_drift_per_type",
    "temperature_mixture_weights",
    "embedding_second_moment_matrix",
    "embedding_pca_projection",
    "contrastive_chunk_pairs",
    "span_corruption_spec",
    "llm_clean_corpus_v2",
    "source_lang_drift",
    "embedding_norm_profile",
    "hilbert_events_row_preservation",
    # round-4 data-selection family
    "dsir_importance_selection",
    "semdedup_embeddings",
    "lm_fluency_score",
    "hashed_tf_features",
    "decontaminate_minhash_lsh",
    # round-4 quality/runtime-filter family
    "bloom_semi_join_urgent_revenue",
    "gopher_quality_rules",
    "vocab_growth_heaps",
    "neardup_canonical_selection",
    "token_budget_waterfill",
    "containment_bottomk_sketch",
    "containment_dedup_removal",
    "zlib_compression_ratio",
    # round-5 family: entity resolution, retrieval scoring, boilerplate,
    # calibrated gating, group-safe splitting
    "fuzzy_part_name_matches",
    "bm25_keyword_search",
    "boilerplate_prefix_detection",
    "calibrated_quality_gate",
    "leakage_safe_group_split",
    "range_frame_trailing_stats",
    "gapfill_hourly_event_series",
    "sa_repeated_span_stats",
    "copurchase_graph_triangles",
    "rfm_customer_scores",
    # round-6 web-curation family
    "url_domain_accounting",
    "domain_duplicate_share",
    "html_text_extraction",
    "sq8_embedding_quantization",
    "sq8_recall_eval",
    "corpus_snapshot_diff",
]
# id column to shift per replica so keys stay unique across copies
ID_SHIFT = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def replicate(spark, k: int, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        out = f"{dest}/{t}.parquet"
        # a completed write ends with parquet's _SUCCESS marker; anything
        # else (killed prior run) is partial and must be rewritten — a
        # truncated input would silently produce bogus "scales flat"
        # ratios, the exact evidence this tool exists to produce
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        shutil.rmtree(out, ignore_errors=True)
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in ID_SHIFT:
            col, shift = ID_SHIFT[t]
            parts = [
                df.withColumn(col, F.col(col) + F.lit(i * shift))
                for i in range(k)
            ]
            big = parts[0]
            for p in parts[1:]:
                big = big.union(p)
        else:
            big = df  # dims stay fixed — the realistic star-schema case
        big.write.mode("overwrite").parquet(out)


def time_queries(spark, sf_dir: str, probes: list[str] | None = None) -> dict[str, float]:
    qs = all_queries()
    out = {}
    for name in probes if probes is not None else PROBES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    # usage: scale_probe.py [k] [query ...] — trailing names restrict the
    # probe set (iterating on one operator shouldn't re-run all ~50)
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probes = sys.argv[2:] or list(PROBES)
    # same cache dir bench.py's sf1 block uses: replicate once, reuse
    # everywhere; `rm -rf .scratch` reclaims the disk
    dest = os.path.join(REPO, ".scratch", f"bench_sf1_x{k}")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, k, dest)
    # Warmup pass: the first execution of each plan pays whole-stage
    # codegen + JIT; without it the 1x baseline absorbs that cost and
    # ratios come out absurdly low (observed <1.0, which a genuine 10x
    # input can't produce).
    time_queries(spark, SRC, probes)
    base = time_queries(spark, SRC, probes)
    big = time_queries(spark, dest, probes)
    print(f"\nscale probe: sf0.1 -> {k}x replicated ({k * 0.6:.0f}M lineitem rows)")
    for name in probes:
        ratio = big[name] / base[name] if base[name] else float("nan")
        print(f"  {name:36s} 1x={base[name]:7.3f}s  {k}x={big[name]:7.3f}s  ratio={ratio:4.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
