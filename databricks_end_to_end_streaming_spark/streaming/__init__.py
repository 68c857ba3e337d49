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
from .moments import (
    finalize_stats,
    moments_stage,
    partial_moments,
    summed_moments,
)
from .sampling import finalize_sample, sample_stage
from .sinks import ParquetTable

__all__ = [
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
    "moments_stage",
    "partial_moments",
    "summed_moments",
    "finalize_stats",
    "sample_stage",
    "finalize_sample",
]
