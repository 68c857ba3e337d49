"""Measured shuffle-volume ledger -> SHUFFLES.md.

"Minimize shuffles" is the core 100 TB discipline; this tool turns it
into MEASURED evidence instead of plan-shape assertions: it runs each
listed query at sf0.01, walks the executed (AQE-final) plan, and sums
the real SQLMetric values — rows scanned, shuffle exchanges hit, bytes
and records actually written to shuffle — then writes the table to
SHUFFLES.md. The headline quantity is the shuffle-to-scan row ratio: a
partial-aggregated plan moves orders of magnitude fewer rows than it
reads; a plan that shuffles what it scans gets flagged by eye.

Queries whose plan contains a pin() (localCheckpoint -> Scan
ExistingRDD) execute in several separate jobs; the ledger reports the
FINAL execution's metrics and marks the row `+pinned upstream` so the
partiality is explicit.

    python tools/shuffle_ledger.py            # default query set
    python tools/shuffle_ledger.py q1 q2 ...  # chosen queries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"

# Representative set: the headline chain + one per heavy family + the
# round-6 additions. Every entry collects at sf0.01 (small outputs).
LEDGER_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_revenue_forecast",
    "medallion_gold_agg",
    "window_top3_orders_per_segment",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "sessionize_events",
    "text_quality_score",
    "url_domain_accounting",
    "domain_quota_cap",
    "kmv_distinct_users_per_type",
    "kmv_weekly_users_rollup",
    "kmv_trailing_7day_users",
    "kmv_source_token_overlap",
    "kmv_join_size_profile",
    "kmv_join_size_estimate",
    "er_golden_records",
    "packing_next_fit_stats",
    "deterministic_corpus_shuffle",
    "jaccard_prefix_filter_join",
    "web_corpus_curation_funnel",
    "seasonal_naive_backtest",
    "cdc_net_aggregate_view",
    "sequence_packing",
    "bm25_keyword_search",
    "histogram_quantile_rollup",
    "sq8_cosine_topk",
    "timeseries_pattern_topk",
    "scd2_temporal_enrichment",
    # round-8 additions
    "quality_classifier_scores",
    "quality_classifier_eval",
    "url_registered_domain_psl",
    "image_phash_neardup",
    "embedding_random_projection",
    # round-10 additions
    "lm_kneser_ney_score",
    "hybrid_search_rrf",
    "mojibake_repair_roundtrip",
    "rm3_expansion_terms",
    "rm3_expanded_search",
    "mmr_diverse_topk",
    "retrieval_eval_ndcg",
    "ccnet_perplexity_buckets",
    # round-10 session-3 additions
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
    "corpus_hash_split_manifest",
    "unigram_lm_piece_stats",
    # r12: the widened-moment pair + the frozen-Viterbi family
    "corr_value_day_per_type",
    "zscore_event_anomalies",
    "unigram_frozen_viterbi_stats",
    "tokenizer_fertility_per_lang",
    "dictionary_term_scan",
    "robust_zscore_event_anomalies",
    "classifier_kappa_eval",
    "robust_value_stats_per_type",
    "cusum_level_shift_per_type",
    "durbin_watson_hourly_per_type",
    "cdc_chunk_dedup",
    "reshard_movement_rendezvous",
    "apportion_budget_largest_remainder",
    "ann_multiprobe_lsh_topk",
]


def _metric(node, key: str) -> int:
    o = node.metrics().get(key)
    return o.get().value() if o.isDefined() else 0


def measure(df) -> dict:
    """Execute via collect() (same queryExecution instance, so the
    driver-side SQLMetric accumulators populate) and fold the AQE-final
    tree."""
    rows_out = len(df.collect())
    totals = {
        "scan_rows": 0,
        "scans": 0,
        "exchanges": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "rows_out": rows_out,
        "pinned": False,
    }

    def walk(node):
        nm = node.nodeName()
        if "Exchange" in nm:
            b = _metric(node, "shuffleBytesWritten")
            r = _metric(node, "shuffleRecordsWritten")
            totals["exchanges"] += 1
            totals["shuffle_bytes"] += b
            totals["shuffle_records"] += r
        if nm.startswith("Scan parquet"):
            totals["scans"] += 1
            totals["scan_rows"] += _metric(node, "numOutputRows")
        if "ExistingRDD" in nm:
            totals["pinned"] = True
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if nm == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif "QueryStage" in nm:
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def main() -> None:
    names = sys.argv[1:] or LEDGER_QUERIES
    spark = get_spark("shuffle_ledger")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(all_queries())
    # Queries whose registered form pins the FINAL output would measure
    # only the checkpoint scan; ledger their unpinned plan builders
    # instead (same logical plan, metrics visible end to end).
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        jaccard_prefix_filter_join_plan,
    )

    qs["jaccard_prefix_filter_join"] = jaccard_prefix_filter_join_plan
    lines = [
        "# SHUFFLES.md — measured shuffle volumes (sf0.01, AQE-final plans)",
        "",
        "Generated by `python tools/shuffle_ledger.py`. Real SQLMetric",
        "values from executed plans — rows scanned vs rows/bytes actually",
        "moved through shuffle. Partial aggregation shows up as a",
        "shuffle-to-scan row ratio orders of magnitude under 1; `+pinned`",
        "marks plans whose upstream ran as separate pinned executions",
        "(their pre-pin shuffles are not in the row). Explode-based",
        "text operators (LSH, prefix-filter join) legitimately shuffle",
        "the exploded shingle relation — linear in corpus tokens, so the",
        "row ratio exceeds 1 against the DOC-row denominator; the",
        "failure mode to look for is quadratic growth, not ratio > 1.",
        "",
        "| query | scan rows | exchanges | shuffle records | shuffle bytes | out rows | shuffle/scan |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in names:
        t = measure(qs[name](spark, SF_DIR))
        ratio = (
            f"{t['shuffle_records'] / t['scan_rows']:.4f}"
            if t["scan_rows"]
            else "n/a"
        )
        pin_note = " `+pinned`" if t["pinned"] else ""
        lines.append(
            f"| {name}{pin_note} | {t['scan_rows']:,} | {t['exchanges']} "
            f"| {t['shuffle_records']:,} | {t['shuffle_bytes']:,} "
            f"| {t['rows_out']:,} | {ratio} |"
        )
        print(lines[-1])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SHUFFLES.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} with {len(names)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
