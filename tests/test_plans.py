"""Physical-plan assertions: the 100 TB posture is only real if the
plans show it (pushed filters, broadcast joins, partial aggregation,
top-k without full sort). These guard against silent plan regressions."""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(spark, name: str) -> str:
    import io
    from contextlib import redirect_stdout

    df = all_queries()[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark):
    plan = formatted_plan(spark, "tpch_q6_revenue_forecast")
    assert "PushedFilters" in plan
    # shipdate bounds + discount/quantity predicates reach the scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_reads_only_needed_columns(spark):
    plan = formatted_plan(spark, "tpch_q6_revenue_forecast")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_discount" in read_schema
    assert "l_orderkey" not in read_schema  # untouched column pruned


def test_q3_broadcasts_dimension(spark):
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    plan = plan_of(spark, "tpch_q5_local_supplier_volume")
    # customer, supplier, nation, region all broadcast: >= 4 broadcasts
    assert plan.count("BroadcastHashJoin") >= 4


def test_q1_has_partial_aggregation(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    assert "partial" in plan.lower()  # map-side combine before exchange


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "sort_limit_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_knn_broadcasts_queries(spark):
    plan = plan_of(spark, "knn_bruteforce_cosine")
    assert "Broadcast" in plan


def test_whole_stage_codegen_active_in_gold(spark):
    # AQE materializes the final plan on execution; codegen spans render
    # as "*(n)" stage markers in the plan string
    df = all_queries()["medallion_gold_agg"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in plan and "*(2)" in plan


def test_gold_partial_agg_and_pruned_scan(spark):
    plan = plan_of(spark, "medallion_gold_agg")
    assert "partial_count" in plan
    read_schema = plan.split("ReadSchema")[1]
    assert "props" not in read_schema and "event_id" not in read_schema


def test_gold_cutoff_pushed_to_raw_nanos_column(spark):
    """The gold cutoff must reach the parquet scan as a pushed filter on
    the stored epoch-nanos long (load_events_since), not sit above the
    timestamp conversion where pushdown is impossible."""
    plan = formatted_plan(spark, "medallion_gold_agg")
    pushed = plan.split("PushedFilters")[1][:200]
    assert "GreaterThanOrEqual(ts" in pushed


def test_q21_prunes_columns_and_broadcasts_suppliers(spark):
    plan = formatted_plan(spark, "tpch_q21_suppliers_who_kept_orders_waiting")
    # lineitem scans carry only the 3 needed columns
    read_schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema")[1:]
    ]
    li_schemas = [s for s in read_schemas if "l_orderkey" in s]
    assert li_schemas and all("l_extendedprice" not in s for s in li_schemas)
    # supplier+nation side broadcasts; top-k has no global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_grouping_sets_single_expand_single_exchange(spark):
    plan = plan_of(spark, "grouping_sets_order_margins")
    assert "Expand" in plan
    # one aggregate exchange, not one per grouping set
    assert plan.count("Exchange hashpartitioning") == 1


def test_unpivot_is_single_scan_expand(spark):
    plan = plan_of(spark, "unpivot_lineitem_rates")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1  # not a 3-way union of scans


def test_vocab_topk_window_sees_only_aggregated_counts(spark):
    """The heavy explode must be reduced by the (lang, token) aggregate
    BEFORE the per-lang window: partial map-side combine on the exploded
    rows, and the window's exchange keys on lang — never on raw tokens."""
    plan = plan_of(spark, "vocab_topk_per_lang")
    assert "Generate explode" in plan
    assert "partial_count" in plan
    assert "Window" in plan


def test_stratified_sample_is_narrow(spark):
    """Hash-bucket sampling is a pure filter: no exchange anywhere."""
    plan = plan_of(spark, "stratified_sample_per_lang")
    assert "Exchange" not in plan


def test_deciles_use_range_partitioning_not_single_partition(spark):
    """The global rank comes from range repartitioning pinned by a
    localCheckpoint (the plan reads the checkpointed RDD — lineage above
    it is truncated by design, see operators/ranking.py); the window
    partitions by _pid, so NO single-partition Exchange may appear
    anywhere in the plan."""
    plan = plan_of(spark, "doc_length_deciles")
    assert "ExistingRDD" in plan  # pinned (checkpointed) partitioning
    assert "SinglePartition" not in plan


def test_corpus_stats_partial_agg(spark):
    plan = plan_of(spark, "corpus_stats_by_source")
    assert "partial_count" in plan or "partial" in plan.lower()


def test_json_extract_prunes_scan_to_two_columns(spark):
    plan = formatted_plan(spark, "json_props_extract_agg")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "props" in read_schema and "event_type" in read_schema
    assert "user_id" not in read_schema and "value" not in read_schema
    assert "partial" in plan.lower()


def test_funnel_stages_aggregate_before_joining(spark):
    """Each funnel stage is a per-user min-ts agg; the stage joins see
    one row per user, never raw events x raw events."""
    plan = plan_of(spark, "funnel_view_click_purchase")
    assert "partial_min" in plan
    # final 1-row stage counts may nested-loop; the user-level joins must
    # be hash/sort joins on user_id
    assert "Join" in plan


def test_salted_agg_two_phase(spark):
    # salted query: phase-1 agg on (key, salt), phase-2 merge on key —
    # at least two distinct HashAggregate key sets with an exchange
    # between, and the salt column never reaches the output.
    plan = plan_of(spark, "skew_salted_event_stats")
    assert plan.count("HashAggregate") >= 4  # 2 phases x (partial+final)
    # the salt expression participates in the first grouping (Catalyst
    # rewrites the `_salt` alias to an internal _groupingexpression)
    assert "abs(hash(event_id" in plan
    df = all_queries()["skew_salted_event_stats"](spark, SF)
    assert "_salt" not in df.columns


def test_tfidf_window_sees_only_counts(spark):
    # the exploded token corpus must be aggregated before the ranking
    # window: no Generate (explode) may appear above the Window.
    plan = plan_of(spark, "tfidf_top_terms_per_lang")
    assert "Window" in plan
    above_window = plan.split("Window")[0]
    assert "Generate" not in above_window


def test_rolling_active_users_no_range_join(spark):
    # contribution-explode formulation: the per-day membership comes
    # from explode + equi-join semantics, never a theta/range join
    # (BroadcastNestedLoopJoin would be the O(days x rows) trap).
    plan = plan_of(spark, "rolling_7day_active_users")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pivot_two_partial_agg_exchanges_no_join(spark):
    """pivot with explicit values plans as pair-count -> pivotfirst:
    two exchanges, each preceded by a map-side partial aggregate, one
    scan, and (since the total is a row-sum of pivot columns) no join."""
    plan = plan_of(spark, "pivot_user_type_matrix")
    assert plan.count("Exchange") == 2
    assert "Join" not in plan
    assert plan.count("FileScan") == 1
    assert "partial_pivotfirst" in plan and "partial_count" in plan


def test_unpivot_metrics_is_expand_without_exchange(spark):
    plan = plan_of(spark, "unpivot_profile_metrics")
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_corr_single_agg_shuffle_and_broadcast_scalar(spark):
    """corr query: the day-zero scalar broadcasts (no shuffle for the
    cross join) and the moments are one partial-agg'd exchange."""
    plan = plan_of(spark, "corr_value_day_per_type")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exchanges: broadcast of the 1-row scalar + the groupBy agg + sort
    assert "HashAggregate" in plan


def test_scd2_single_exchange_single_sort(spark):
    """Both SCD2 windows (change detection, then lead/row_number over the
    collapsed change rows) must share ONE user_id exchange and ONE sort —
    the filter preserves the (user_id; ts, event_id) clustering, so a
    second shuffle or re-sort is a plan regression."""
    plan = plan_of(spark, "scd2_user_state_history")
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") + plan.count("Sort\n") <= 2  # one logical sort (AQE may print reused node)
    assert "hashpartitioning(user_id" in plan


def test_forward_fill_single_window_pass(spark):
    plan = plan_of(spark, "forward_fill_event_values")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan


def test_span_removal_broadcasts_hot_grams(spark):
    """The hot-gram membership probe must be a broadcast join — if the
    hot set ever shuffles the corpus-sized gram relation, the operator
    loses its 100 TB shape."""
    plan = plan_of(spark, "dedup_ngram_span_removal")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_clean_v2_broadcasts_hot_grams_no_cartesian(spark):
    plan = plan_of(spark, "llm_clean_corpus_v2")
    assert "BroadcastHashJoin" in plan  # hot-gram membership probe
    assert "CartesianProduct" not in plan


def test_lang_drift_broadcasts_marginals(spark):
    """The lang marginal and the 1-row total must reach the grid as
    broadcasts — a shuffled cross join here would be a plan bug."""
    plan = plan_of(spark, "source_lang_drift")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_embedding_norm_profile_is_shuffle_free(spark):
    plan = plan_of(spark, "embedding_norm_profile")
    assert "Exchange" not in plan


def test_zscore_broadcasts_moments_no_window(spark):
    """Row-level z-scoring must join the 5-row moment relation back by
    broadcast — a Window over partitionBy(event_type) would funnel the
    whole corpus through 5 reducers."""
    plan = plan_of(spark, "zscore_event_anomalies")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # the only shuffle is the partial-agg'd 5-row moment groupBy
    assert plan.count("Exchange hashpartitioning") == 1


def test_ewma_single_user_exchange_no_python(spark):
    """The EWMA fold runs inside the JVM on one groupBy(user) shuffle:
    no Python eval in the plan, and no second corpus exchange."""
    plan = plan_of(spark, "ewma_event_value_per_user")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(user_id" in plan
    assert "EvalPython" not in plan


def test_basket_affinity_no_self_join_after_checkpoint(spark):
    """Pair generation is per-basket array arithmetic aggregated once
    into a checkpointed <=326-row relation; everything downstream of the
    checkpoint must be broadcast-only — no corpus re-scan, no sort-merge
    self-join, no shuffle."""
    plan = plan_of(spark, "brand_basket_affinity")
    assert "lineitem" not in plan  # corpus work done before checkpoint
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("BroadcastHashJoin") == 2


def test_chi2_drift_tiny_after_contingency_checkpoint(spark):
    """The corpus contributes exactly one shuffle (the contingency
    groupBy, materialized at the checkpoint); everything downstream is
    arithmetic over <= types x bins rows with broadcasts."""
    plan = plan_of(spark, "chi2_value_drift_per_type")
    assert "Scan parquet" not in plan  # corpus scanned only pre-checkpoint
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_gram_matrix_single_cell_shuffle(spark):
    """The d^2 explode collapses map-side: exactly one hash exchange (of
    <= 2080 cells), and the 1-row corpus count arrives by broadcast."""
    plan = plan_of(spark, "embedding_second_moment_matrix")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contrastive_pairs_no_global_window(spark):
    """Positives window by doc, negatives by md5 bucket — a global
    (single-partition) window would be the 100 TB failure mode."""
    plan = plan_of(spark, "contrastive_chunk_pairs")
    assert plan.count("Window") >= 2
    assert "SinglePartition" not in plan


def test_dsir_broadcasts_bucket_distributions(spark):
    """The 256-row bucket table and the 1-row totals must both reach the
    per-doc tf relation as broadcasts, and top-N must be TakeOrdered —
    a shuffled bucket join or a global sort would break the 100 TB
    shape."""
    plan = plan_of(spark, "dsir_importance_selection")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_lm_fluency_vocab_broadcast_no_cartesian(spark):
    """V must reach the term relation as a 1-row broadcast, and the
    instance->model join must be a real equi-join, not a cartesian."""
    plan = plan_of(spark, "lm_fluency_score")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_topk_without_global_sort_or_explode(spark):
    plan = plan_of(spark, "bm25_keyword_search")
    assert "TakeOrderedAndProject" in plan  # per-partition heaps
    assert "Generate" not in plan  # tf via replace-arithmetic, no explode
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats broadcast


def test_fuzzy_join_is_blocked_not_cartesian(spark):
    plan = plan_of(spark, "fuzzy_part_name_matches")
    assert "CartesianProduct" not in plan  # token blocks, never all-pairs


def test_boilerplate_partial_agg_before_window(spark):
    plan = plan_of(spark, "boilerplate_prefix_detection")
    assert "partial" in plan.lower()  # (source,prefix) collapse map-side


def test_range_frame_single_user_exchange(spark):
    plan = plan_of(spark, "range_frame_trailing_stats")
    # both window aggregates ride ONE hashpartitioning(user_id) exchange
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "specifiedwindowframe(RangeFrame" in plan


def test_gapfill_join_is_broadcast(spark):
    plan = plan_of(spark, "gapfill_hourly_event_series")
    # the spine x hourly-rollup gap-fill join never shuffles the corpus:
    # both sides are aggregate-sized, one broadcasts
    assert "BroadcastHashJoin" in plan


def test_kmv_bottom_k_has_group_limit_before_exchange(spark):
    """The skew-safe bottom-k must plant WindowGroupLimit partials so
    only <= k rows per (group, salt) reach each exchange."""
    plan = plan_of(spark, "kmv_distinct_users_per_type")
    assert plan.count("WindowGroupLimit") >= 2  # partial + final level
    assert "Exchange" in plan


def test_kmv_overlap_pairs_never_touch_corpus(spark):
    """All pairwise algebra runs on the k-per-source sketch relation:
    the pinned sketch truncates lineage, so the FINAL plan contains at
    most one parquet scan (zero when the pin is an RDD scan) — never
    one scan per pair leg (12 before the pin landed)."""
    plan = formatted_plan(spark, "kmv_source_token_overlap")
    assert plan.count("Scan parquet") <= 1


def test_corpus_shuffle_uses_range_partitioning(spark):
    """Global position must come from range partitioning, never a
    single-partition ORDER BY window."""
    plan = plan_of(spark, "deterministic_corpus_shuffle")
    # the range partitioning happens upstream of the frozen pin inside
    # global_row_number; since the r13 window-free rewrite the local row
    # number rides monotonically_increasing_id INSIDE the pin and the
    # global position comes from the broadcast _offset join — no Window
    # pass at all. The failure mode this guards is a global ORDER BY
    # window, which compiles to an Exchange SinglePartition — assert it
    # never appears, and that no window snuck back in after the pin.
    assert "SinglePartition" not in plan
    assert "windowspecdefinition" not in plan  # window-free ranking
    assert "_offset" in plan  # offsets join supplies the global position


def test_packing_fold_stays_jvm_side(spark):
    """The sequential next-fit fold is an aggregate() HOF — no Python
    evaluation anywhere in the plan."""
    plan = plan_of(spark, "packing_next_fit_stats")
    assert "Python" not in plan  # no Arrow/row UDF evaluation anywhere
    opt = (
        all_queries()["packing_next_fit_stats"](spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "aggregate(" in opt  # the fold is the JVM HOF, not Python


def test_prefix_filter_join_no_cartesian(spark):
    """Candidate generation is an equi-join on prefix shingles —
    never a cartesian/nested-loop product over docs. Introspects the
    pure plan builder (the registered query pins its output for the
    persist-release hygiene, which would hide the join in a
    checkpoint scan)."""
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        jaccard_prefix_filter_join_plan,
    )

    df = jaccard_prefix_filter_join_plan(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_timeseries_pattern_search_shape(spark):
    """Global top-k without a global sort; the window-moment relation
    joins the 1-row pattern by BROADCAST; daily collapse is partial-
    agg'd before any per-user work."""
    plan = plan_of(spark, "timeseries_pattern_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Broadcast" in plan
    assert "partial" in plan.lower()


def test_scd2_temporal_join_is_key_bound(spark):
    """The validity-window join is equi on user_id with a range
    residual — never a cartesian product; spend rollup partial-aggs."""
    plan = plan_of(spark, "scd2_temporal_enrichment")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial" in plan.lower()


def test_neardup_safe_split_broadcasts_clusters(spark):
    """The cluster relation (docs in near-dup pairs only) broadcasts
    onto the corpus scan; the split is a stateless map + 3-group agg."""
    plan = plan_of(spark, "neardup_safe_split")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _optimized(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_no_inferred_generate_duplication(spark):
    """InferFiltersFromGenerate turns a plain explode over a COMPUTED
    array into a pushed `size(arr) > 0` filter that inlines the whole
    array-building expression — the expensive per-row build (char
    shingles, fixed-point quantization) then evaluates twice per row
    (measured: decontaminate's corpus shingle leg 15.0 s -> 1.7 s at
    sf0.1 from this alone). The affected sites use outer generates
    (+ isnotnull on the generator output, which drops exactly the null
    row outer adds — row-set identical to inner on every input); this
    guard asserts no Filter re-evaluates an expensive array build in
    the queries that regressed."""
    for name in (
        "decontaminate_ngram_overlap",
        "sq8_cosine_topk",
        "embedding_second_moment_matrix",
        "embedding_snapshot_drift",
    ):
        opt = _optimized(spark, name)
        offenders = [
            line.strip()[:160]
            for line in opt.splitlines()
            if "Filter" in line
            and "size(" in line
            and ("transform(" in line or "array_distinct(" in line)
        ]
        assert not offenders, f"{name}: {offenders}"
