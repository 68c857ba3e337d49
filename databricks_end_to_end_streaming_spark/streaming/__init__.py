from .dedup_stage import neardup_batch, neardup_stage
from .ingest import ingest_avro_stream
from .medallion import (
    bronze_stage,
    dq_split_stage,
    gold_stage,
    run_pipeline,
    silver_stage,
    upsert_stage,
)
from .anomaly import (
    anomaly_stage,
    partial_scalar_moments,
    score_zscore,
    summed_scalar_moments,
)
from .drift import chi2_drift, contingency_stage, summed_contingency
from .dsir import dsir_scores_from_log, dsir_stage
from .semdedup_stage import kept_vectors, semdedup_batch
from .ewma import current_ewma, ewma_stage
from .gram import covariance_from_log, gram_stage, pca_from_log
from .moments import (
    finalize_stats,
    moments_stage,
    partial_moments,
    summed_moments,
)
from .heavy_hitters import (
    estimate_heavy_hitters,
    heavy_hitters_stage,
    merged_grid,
)
from .ingest import replay_quarantined
from .observe import (
    assert_expectations,
    observe_batch,
    observe_stream,
    progress_metrics,
)
from .sampling import (
    finalize_sample,
    finalize_weighted_sample,
    sample_stage,
    weighted_sample_stage,
)
from .ivm import ivm_consistency_check, ivm_stage, ivm_view
from .kmv_stage import kmv_report_from_log, kmv_sketch_stage, kmv_stage
from .ppjoin_stage import exact_neardup_batch, exact_neardup_stage
from .seasonal import score_against_profile, seasonal_monitor_stage
from .sinks import ParquetTable

__all__ = [
    "ivm_stage",
    "ivm_view",
    "ivm_consistency_check",
    "kmv_stage",
    "kmv_sketch_stage",
    "kmv_report_from_log",
    "exact_neardup_batch",
    "exact_neardup_stage",
    "seasonal_monitor_stage",
    "score_against_profile",
    "ParquetTable",
    "ingest_avro_stream",
    "bronze_stage",
    "silver_stage",
    "gold_stage",
    "run_pipeline",
    "upsert_stage",
    "dq_split_stage",
    "neardup_batch",
    "neardup_stage",
    "anomaly_stage",
    "partial_scalar_moments",
    "score_zscore",
    "summed_scalar_moments",
    "ewma_stage",
    "current_ewma",
    "contingency_stage",
    "summed_contingency",
    "chi2_drift",
    "dsir_stage",
    "dsir_scores_from_log",
    "semdedup_batch",
    "kept_vectors",
    "gram_stage",
    "covariance_from_log",
    "pca_from_log",
    "moments_stage",
    "partial_moments",
    "summed_moments",
    "finalize_stats",
    "sample_stage",
    "finalize_sample",
    "weighted_sample_stage",
    "finalize_weighted_sample",
    "heavy_hitters_stage",
    "merged_grid",
    "estimate_heavy_hitters",
    "replay_quarantined",
    "observe_batch",
    "observe_stream",
    "progress_metrics",
    "assert_expectations",
]
