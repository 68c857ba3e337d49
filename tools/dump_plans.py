"""Dump formatted physical plans of the headline queries to PLANS.md —
the at-a-glance evidence that filters push down, dims broadcast,
aggregations are partial, and Python only appears at the declared UDF
sites. Regenerate after plan-affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

PLAN_QUERIES = [
    ("medallion_gold_agg", "scan -> pushed raw-nanos filter -> partial+final agg"),
    ("medallion_end_to_end", "flatten -> window dedup -> filter -> agg, one plan"),
    ("tpch_q1_pricing_summary", "partial aggregation before the exchange"),
    ("tpch_q3_shipping_priority", "broadcast dim + shuffled fact-fact join + top-k"),
    ("tpch_q6_revenue_forecast", "all predicates pushed; 4-column read schema"),
    ("broadcast_join_brand_volume", "fact x broadcast-dim, single agg shuffle"),
    ("sort_limit_topk_orders", "TakeOrderedAndProject (no global sort)"),
    ("dedup_minhash_lsh", "explode -> 32 partial min-aggs -> band self-join"),
    ("knn_bruteforce_cosine", "broadcast queries x scan, window top-k"),
    ("sessionize_events", "single sort per window chain (lag + running sum share order)"),
    ("tpch_q21_suppliers_who_kept_orders_waiting", "decorrelated EXISTS/NOT EXISTS: one per-order agg, pruned scans, broadcast dims"),
    ("grouping_sets_order_margins", "one Expand + one aggregate exchange for all grouping sets"),
    ("unpivot_lineitem_rates", "wide-to-long as a single scan + Expand (no union of scans)"),
    ("dataset_split_deterministic", "hash-bucket split: stateless map + 3-group agg"),
    ("sketch_rollup_daily_users", "hourly HLL sketches -> mergeable daily union (re-aggregatable rollup)"),
    ("vocab_topk_per_lang", "explode reduced by partial (lang,token) agg BEFORE the per-lang window"),
    ("doc_length_deciles", "global rank via range partitioning + offsets (no single-partition window)"),
    ("stratified_sample_per_lang", "hash-bucket sample: narrow filter, zero exchanges"),
    ("multimodal_image_stats", "Arrow-batched mapInPandas; payload dropped before any shuffle"),
    ("retention_cohorts_daily", "(user, day) distinct collapse before the cohort join"),
    ("text_chunking", "chunk arithmetic on token counts; text dropped before the explode"),
    ("tpch_q9_product_type_profit", "derived partsupp star join: every dim broadcast; only orders join + final agg shuffle"),
    ("tpch_q2_min_cost_supplier", "correlated min as one window pass (no partsupp re-scan); all dims broadcast"),
    ("dedup_simhash", "UDF-free simhash: explode + algebraic bit votes, partial agg before (doc,bit) shuffle"),
    ("event_value_percentiles_exact", "nearest-rank percentiles: range-partitioned global rank, 3 rows selected"),
    ("rolling_7day_active_users", "contribution explode of distinct (user,day) pairs; no range join / per-day rescan"),
    ("skew_salted_event_stats", "two-phase salted agg: (key,salt) partial 16-way, key merge over 16 rows/key"),
    ("tfidf_top_terms_per_lang", "tf/df aggs collapse the explode before the token join + per-lang window"),
    ("dq_expectations_lineitem", "every rule one conditional sum: ONE scan, ONE 1-row aggregate, exploded report"),
    ("corr_value_day_per_type", "exact int64 moments: broadcast day-zero scalar + one partial-agg'd shuffle"),
    ("pivot_user_type_matrix", "pivot desugared: pair-count -> pivotfirst, two partial-agg'd exchanges, no join"),
    ("user_event_type_sequences", "ordered collect: struct gather + array_sort, one partial-agg'd shuffle"),
    ("dedup_ngram_span_removal", "gram-DF shuffle -> broadcast hot-gram probe -> per-row HOF removal"),
    ("doc_ngram_novelty", "gram occurrences co-partitioned with doc-frequencies; per-doc partial agg"),
    ("scd2_user_state_history", "both SCD2 windows share ONE user_id exchange + sort"),
    ("forward_fill_event_values", "last-non-null carry: one exchange, one linear window scan"),
    ("llm_clean_corpus_v2", "scrub -> gate -> cleaned-fingerprint dedup -> rollup as ONE Catalyst plan"),
    ("zscore_event_anomalies", "5-row moment relation broadcast back onto a map-side scoring pass (no 5-reducer window)"),
    ("ewma_event_value_per_user", "non-associative fold inside ONE groupBy(user) shuffle; no Python eval"),
    ("brand_basket_affinity", "post-checkpoint: broadcast-only joins over the <=326-row pair/marginal/total relation"),
    ("chi2_value_drift_per_type", "post-checkpoint: contingency-derived grid, broadcast totals, sorted-fold chi2"),
    ("embedding_second_moment_matrix", "d^2 explode collapsed map-side to <=2080 Gram cells before ONE exchange"),
    ("dsir_importance_selection", "bigram explode -> (doc,bucket) tf shuffle -> broadcast 256-row distribution + 1-row totals -> TakeOrdered top-N"),
    ("semdedup_embeddings", "Arrow-batched cluster assignment -> within-cluster self-join (n^2/k pair space) -> broadcast anti-join drop"),
    ("lm_fluency_score", "instance->model co-keyed join, vocabulary-sized window, 1-row V broadcast, per-doc sorted fold in ONE groupBy"),
    ("lm_kneser_ney_score", "KN model from vocabulary-sized type-table rollups; instances pay ONE (w1,w2,w3) join; 1-row N1+(..) broadcast (plan via the unpinned builder — the registered form pins the type table, cutting 14 corpus scans to the 2 the algorithm needs)"),
    ("hybrid_search_rrf", "two TakeOrderedAndProject legs (BM25 expression scan; broadcast 1-row query vector) -> 50-row rank windows -> full-outer fusion join of two leg-depth relations"),
    ("mojibake_repair_roundtrip", "replace-length marker detection in codegen; ONE Arrow-batched repair UDF map-side; single source-keyed partial agg"),
    ("rm3_expansion_terms", "initial BM25 TakeOrdered -> explode ONLY the 10 feedback docs -> integer-nano term rollup -> TakeOrdered top-5"),
    ("rm3_expanded_search", "two corpus scans total: feedback pass + re-retrieval; derived 8-row term relation broadcast into the bm25_param cross join"),
    ("mmr_diverse_topk", "corpus-sized work is the sem_leg TakeOrdered; greedy MMR runs on <=50 survivors in ONE Arrow batch (coalesce(1) is leg-depth-bounded by contract)"),
    ("retrieval_eval_ndcg", "grades are one extra column on the BM25 feature scan; 10-row system rankings broadcast into the grade join; ideal ranking is one TakeOrdered"),
    ("ccnet_perplexity_buckets", "KN scoring inherits the type-table plan; bucketing adds ONE lang-partitioned window (exact-anchor form; production uses sampled cutoffs + map-only threshold)"),
    ("decontaminate_minhash_lsh", "corpus bands x BROADCAST benchmark bands -> pinned candidates -> semi-join-pruned exact verify"),
    ("hashed_tf_features", "vocabulary-free signed hashing: narrow map + ONE partial-agg'd (doc,bucket) shuffle"),
    ("bloom_semi_join_urgent_revenue", "bitmap build bounded by m/64 word rows -> map-only broadcast-join probe -> exact semi join on survivors"),
    ("gopher_quality_rules", "all four quality rules in ONE narrow projection pass, zero shuffles"),
    ("vocab_growth_heaps", "first-occurrence min-agg (vocab-sized shuffle); cumulative window on bucket-count rows only"),
    ("neardup_canonical_selection", "LSH pair graph -> min-label components -> BROADCAST cluster map onto token scan -> per-cluster window"),
    ("token_budget_waterfill", "per-source partial agg; threshold search + windows on a sources-sized relation only"),
    ("containment_bottomk_sketch", "bottom-K sketch bucket join (K rows/doc) -> semi-join-pruned full-set verify; never all-pairs"),
    ("zlib_compression_ratio", "ONE Arrow-batched mapInPandas pass, zero shuffles, payload never leaves its partition"),
    ("fuzzy_part_name_matches", "blocked levenshtein ER join: distinct-name collapse first, token-block self-join, verify on candidates only"),
    ("bm25_keyword_search", "no explode/no index: replace-arithmetic tf map-side, 1-row stats broadcast, TakeOrderedAndProject top-k"),
    ("boilerplate_prefix_detection", "prefix slice map-side, (source,prefix) partial agg, window over collapsed counts only"),
    ("calibrated_quality_gate", "rank-based per-lang cutoff: one scored projection, one lang window, one aggregate"),
    ("leakage_safe_group_split", "stateless md5(source) map + 3-row aggregate; zero wide shuffles"),
    ("range_frame_trailing_stats", "true RANGE frame in microsecond int math: one user exchange + sort, two-pointer sliding frame"),
    ("gapfill_hourly_event_series", "generated calendar spine (1-row bounds -> sequence explode) LEFT-joined by the hourly rollup"),
    ("sa_repeated_span_stats", "escalating window-sort suffix array: one range sort at W=16, then active-only re-sorts; LCP = rank self-join + deep-tail windows; r10: consumed via the shared pinned span profile"),
    ("copurchase_graph_triangles", "mutual top-K graph (degree <= K by construction) -> two equi-joins enumerate each triangle once"),
    ("rfm_customer_scores", "customer collapse in ONE partial agg; 3 range-partitioned global ranks over the aggregate only"),
    ("containment_dedup_removal", "sketch-join pairs -> strict total drop order (set size, id) -> tiny broadcast drop list onto per-source counts"),
    ("url_domain_accounting", "map-only URL parse/normalize in codegen; (domain,lang) partial agg -> domain rollup, two key-bound exchanges"),
    ("url_blocklist_filter", "every rule one conditional sum: ONE scan, 1-row aggregate, stack unpivot"),
    ("domain_duplicate_share", "md5 fingerprint partial-agg + count join on fp key -> domain rollup; fingerprint relation never broadcast"),
    ("html_text_extraction", "WET extraction as ONE codegen span over the scan: zero exchanges, no Python"),
    ("bm25_param_topk", "corpus x broadcast term relation (no corpus explode); terms-sized df agg broadcast back; TakeOrdered top-k"),
    ("sq8_embedding_quantization", "posexplode stats collapse to d rows map-side; ONE broadcast min/max row; code+error map-only"),
    ("sq8_recall_eval", "two broadcast-queries x scan legs, TOP_K survivors per query to tiny window exchanges, recall join on N*K rows"),
    ("corpus_snapshot_diff", "both sides collapse to key+md5 map-side; ONE full-outer join, never the payload twice; status rollup partial-agg'd"),
    ("kmv_distinct_users_per_type", "distinct partial-agg then salted two-level bottom-k: WindowGroupLimit partials BEFORE each exchange, k rows/group out"),
    ("kmv_source_token_overlap", "corpus touched once (explode+distinct+bottom-k); all pair algebra on k-per-source sketch rows, tiny broadcast joins"),
    ("er_golden_records", "corpus collapses to the name dictionary; blocked pairs -> O(diameter) CC rounds; survivorship window partitions by cluster only"),
    ("domain_quota_cap", "PSL match on the DISTINCT-domain dim (broadcast rules), reg_domain attach broadcast back (r12); then ONE reg_domain exchange: quota window and rollup share the same key+sort; output corpus-size-free accounting"),
    ("packing_next_fit_stats", "sequential fold as JVM aggregate() HOF over per-shard arrays: ONE partial-agg shuffle, no window, no Python"),
    ("kmv_weekly_users_rollup", "raw scan feeds ONE distinct partial-agg; daily bottom-k bounds state k/day; weekly merge runs on days-x-k sketch rows"),
    ("deterministic_corpus_shuffle", "seeded md5 permutation; range-partitioned global rank (uniform hash keys -> balanced ranges), NO 1-partition window"),
    ("jaccard_prefix_filter_join", "rarest-first df-ordered prefixes as blocking keys (hot shingles pushed OUT of prefixes); verify against the once-persisted shingle relation (plan via the unpinned builder)"),
    ("kmv_join_size_profile", "per-side distinct partial-agg + bottom-k; merged window <= 2k rows; actual-cardinality eval = key-count aggs joined, no row join"),
    ("kmv_join_size_estimate", "the production estimator: identical prediction pipeline, evaluation leg GONE — the exact join never appears in the plan"),
    ("web_corpus_curation_funnel", "whole curation pass ONE plan: pinned survivor chain feeds 4 unioned stage aggregates; stages reuse standalone-query semantics"),
    ("seasonal_naive_backtest", "two tiny training aggs broadcast onto the test scan; int64 cents until ONE division per output column; no cross-row double sums"),
    ("cdc_net_aggregate_view", "counting-IVM path as a plan: (key,value,net) partial-agg -> surviving-multiplicity rollup; two key-bound exchanges total"),
    ("kmv_trailing_7day_users", "sliding distinct from pinned daily sketches: contribution explode fans k rows/day to <=7 windows; bottom-k per window"),
    ("histogram_quantile_rollup", "mergeable bin summaries: raw scan collapses to (day,hour,bin) partials in ONE partial-agg exchange; quantile window touches bin rows only"),
    ("sq8_cosine_topk", "production SQ8 search: d-row stats shuffle + broadcast fold; broadcast queries x coded scan; int64 LUT-free dots; TOP_K survivors to the window"),
    ("ann_ivfpq_topk", "IVFPQ: two Arrow map-only corpus passes (cell id + codes, raw vector dropped pre-shuffle); broadcast cell-id join bounds candidates; ADC scores codes"),
    ("timeseries_pattern_topk", "daily partial-agg collapse -> map-side HOF gapfill/window slicing over per-user arrays -> broadcast 1-row pattern -> TakeOrdered top-k"),
    ("embedding_snapshot_drift", "two Gram-cell collapses (<= d(d+1)/2 cells each before ONE shuffle) -> cells-x-cells outer join -> decimal cross-multiplied ranking"),
    ("scd2_temporal_enrichment", "history build = two user-keyed windows on ONE exchange; validity join equi-on-user + range residual; exact-cents partial-agg rollup"),
    ("neardup_safe_split", "shared near-dup cluster relation -> BROADCAST cluster map onto the corpus -> stateless md5 split + 3-group aggregate"),
    ("quality_classifier_weights", "training = ONE (doc,bucket)->bucket partial-agg to <=64x2 int64 cells + 1-row class counts; weights a fixed IEEE chain"),
    ("quality_classifier_scores", "corpus pays only the vectorizer's (doc,bucket) shuffle; 64-row weights + 1-row bias BROADCAST; per-doc sorted fold"),
    ("url_registered_domain_psl", "PSL match on the DISTINCT-domain relation: label-suffix explode (x2 keys) -> broadcast rules join -> per-domain argmax"),
    ("embedding_random_projection", "JL +-1 projection as a LITERAL sign matrix in the plan: map-only int64 folds, ZERO exchanges"),
    ("jl_recall_eval", "two broadcast-queries x scan ranking legs (64-dim exact vs 16-dim projected) -> TOP_K window rows -> recall join on N*K rows"),
    ("quality_classifier_calibration", "range-partitioned global rank + NTILE arithmetic (no 1-partition window) -> 10-group partial agg"),
    # round-9 additions
    ("video_temporal_neardup", "per-frame Arrow hashing (payload dropped at the hash) -> banded chunk self-join on composite (video,frame) ids -> two partial-agg alignment votes; pixels never shuffle"),
    ("exact_substr_cut", "ExactSubstr cut tail: per-doc running-max coverage window over the pinned repeat profile -> merged-interval collapse -> per-row HOF token filter (map-only reconstruction)"),
    ("url_registered_domain_idn", "punycode pandas UDF on the DISTINCT-domain relation only (never per-doc) -> label-suffix explode -> broadcast 9.5k-rule PSL join"),
    ("decontaminate_exact_substr", "cross-set decontamination tail: per-doc partial agg + every-doc left join over the SHARED pinned span profile (segment ids derived distributively upstream — range-partitioned running benchmark count)"),
    ("warc_ingest_accounting", "WARC first mile: binaryFile segment scan -> mapInPandas record split -> per-type partial aggs (HTTP body split + WET extraction as map-only string work)"),
    ("dedup_pipeline_lee2022", "NearDup anti-join feeds the GRAM-based ExactSubstr cut (r10: one gram-keyed agg + coverage reconstruction, no suffix array on the survivor corpus); accounting = three 1-row aggregates"),
    # round-10 session-3 additions
    ("dedup_lines_first_occurrence", "CCNet line dedup: text dropped before segment explode -> ONE md5-keyed window shuffle (uniform) -> doc_id regroup with in-expression reassembly"),
    ("url_canonicalize_dedup", "RFC 3986 canonicalization entirely in whole-stage codegen (regexp/array exprs, no UDF) -> one algebraic partial-agg shuffle on the canonical key"),
    ("winnowing_fingerprints", "k-gram hashing map-side -> per-doc window min (doc-frame sort, no cross-doc exchange) -> distinct + count partial-agg shuffles"),
    ("winnowing_overlap_pairs", "fingerprint buckets gated by the df-cap (<=C(10,2) pairs per fp) -> bucket join -> pair count; the MOSS ignore-rule doubles as the join bound"),
    ("gopher_repetition_signals", "repetition battery: per-(doc,gram) partial-agg counts x3 + shared line groups; exact-int threshold predicates, fractions one IEEE division each"),
    ("psi_value_drift_per_type", "ONE (type,bin,half) partial-agg corpus shuffle; PSI terms over the tiny contingency, sorted fold, rounded (ln has no cross-engine bit guarantee)"),
    ("attribution_last_touch", "both IGNORE-NULLS last_value calls share ONE user exchange+sort; 4-group DECIMAL rollup"),
    ("zipf_fit_per_lang", "token explode collapsed by partial (lang,token) agg; rank window + OLS folds on vocab-sized groups only"),
    ("classifier_auc_eval", "scoring inherits the classifier vectorizer shuffle; range-partitioned global rank (no 1-partition window); U sums exact int64, AUC/Gini one division each"),
    ("margin_mining_knn", "broadcast-queries x scan cosine leg (knn baseline; IVF-PQ is the registered 100 TB candidate path); margin arithmetic touches only QxK and candidate-top-k rows"),
    ("holt_linear_backtest", "ONE (type,hour) partial-agg shuffle; calendar-bounded per-type series folded in the JVM (ewma pattern) — state never corpus-sized"),
    ("token_burstiness_topk", "two partial-agg'd shuffles ((doc,token) then token moments); Fano = S/T - T/N exact; TakeOrderedAndProject top-k"),
    ("kcore_decomposition", "h-index iteration on the degree-bounded mutual-KNN graph: one join + one constant-frame window + one agg per round, 1-row convergence check"),
    ("corpus_manifest", "map-side per-row hash + ONE source-keyed partial-agg shuffle of 6-scalar partials; XOR/sum/min/max all mergeable"),
    ("jaro_winkler_part_pairs", "dictionary-collapse (r11): token-blocked + length-ratio-filtered DISTINCT-NAME pairs score the greedy JW fold once each behind an Exchange barrier; qualifying names broadcast back into an output-sensitive (name,brand,size) equi-join — no part-level quadratic block join"),
    ("ks_test_value_drift", "ONE (type,value,half) partial-agg shuffle -> per-type running-ECDF window on collapsed distinct values; D maximized over exact int64 cross-products, single final division"),
    ("benford_value_audit", "map-side digit extraction -> ONE (type,digit) partial-agg shuffle; 9-digit broadcast grid + sorted fold"),
    ("spearman_trend_per_type", "ONE (type,us,value) partial-agg shuffle collapses the corpus (r11); closed-form rank sums via one rows-frame + two RANGE-frame windows sharing the per-type exchange (no value-level join); 6-scalar DECIMAL(38,0) moment partial agg (r12 — int64 wrapped at ~1.3e6 rows/type); rho = fixed doubles + correctly-rounded sqrt"),
    ("cramers_v_type_weekday", "ONE (type,weekday) partial-agg corpus shuffle -> shared chi2 core over the r x c contingency -> two-level sorted fold + sqrt"),
    ("corpus_hash_split_manifest", "map-side md5 bucket per row -> ONE (source,split) partial-agg shuffle of 5-scalar partials; manifests merge by sum/XOR"),
    ("classifier_kappa_eval", "inherits the classifier vectorizer shuffle; confusion matrix is ONE map + single 5-scalar agg; kappa = one IEEE division of exact int64s"),
    ("robust_value_stats_per_type", "ONE (type,value) partial-agg corpus shuffle; median/MAD by ECDF selection over COLLAPSED distinct values; trimmed mean = exact rank-range overlap * DECIMAL value, one final division"),
    ("cusum_level_shift_per_type", "ONE (type,hour) partial-agg corpus shuffle; deviation walk + prefix extrema as cumulative windows sharing the per-type exchange; all int64, one unit-conversion division"),
    ("durbin_watson_hourly_per_type", "same (type,hour) monoid as CUSUM; lag + two DECIMAL(38) quadratic sums, round-9 ratio"),
    ("unigram_lm_piece_stats", "corpus collapses to the (word,freq) vocabulary in one shuffle; EM rounds are vocab-sized Arrow batches + one piece partial-agg each; final stats one vocab-sized explode+agg"),
    ("unigram_frozen_viterbi_stats", "same (word,freq) vocabulary collapse; frozen seed model = one substring partial-agg + two bounded collects; ONE vocab-sized Arrow segmentation pass + explode/agg (r12)"),
    ("tokenizer_fertility_per_lang", "corpus collapses to (lang,word,freq) in ONE shuffle; distinct-word dim segments once (Arrow, vocab-sized) and joins back vocab-to-vocab; lang-sized finalize of exact int64 sums (r12)"),
    ("dictionary_term_scan", "ONE Aho-Corasick corpus pass (Arrow mapInPandas, dictionary-size-independent); term-sized partial agg broadcast back onto the term dim so zero-hit terms report (r12)"),
    ("robust_zscore_event_anomalies", "median/MAD by ECDF selection over the collapsed (type,cents) relation; 5-row dims broadcast back onto a map-side scan; the 3.5-sigma cut is pure int64 (6745*|dev| >= 35000*mad) — no float boundary (r12)"),
    ("cdc_chunk_dedup", "content-defined chunking: rolling hash + cut detection + md5 fingerprints all map-only codegen HOFs (byte array bound once per row — no quadratic substring walk, no UDF); ONE corpus shuffle on (fp,len); histogram-sized rollup (r13)"),
    ("reshard_movement_rendezvous", "double HRW argmax = map-only HOF md5 work per doc; ONE shard-count-sized groupBy shuffle (r13)"),
    ("apportion_budget_largest_remainder", "ONE lang-keyed partial-agg corpus shuffle; Hamilton arithmetic as windows over the lang-sized relation, all int64 (r13)"),
    ("ann_multiprobe_lsh_topk", "corpus hashes home buckets once (Arrow batch at the declared UDF site); query side probes home + 2 low-margin flips broadcast into the bucket join; exact cosine re-rank on candidates (r13)"),
]


def _plan_builders():
    """Unpinned plan builders for queries whose REGISTERED form pins the
    final output (a dumped plan of a localCheckpoint scan shows
    nothing). Each returns the same logical plan the query materializes."""
    from databricks_end_to_end_streaming_spark.queries.classifier import (
        quality_classifier_scores_plan,
    )
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        jaccard_prefix_filter_join_plan,
    )
    from databricks_end_to_end_streaming_spark.queries.text import (
        lm_kneser_ney_score_plan,
    )

    return {
        "jaccard_prefix_filter_join": jaccard_prefix_filter_join_plan,
        "quality_classifier_scores": quality_classifier_scores_plan,
        "lm_kneser_ney_score": lm_kneser_ney_score_plan,
    }


def main() -> None:
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(all_queries())
    qs.update(_plan_builders())
    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        "Generated by `python tools/dump_plans.py` at sf0.001 (plan shape is",
        "scale-independent; AQE re-plans exchanges at runtime). What to look",
        "for per query is noted above each plan.",
        "",
    ]
    for name, note in PLAN_QUERIES:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{note}*", "", "```", buf.getvalue().rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(PLAN_QUERIES)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
