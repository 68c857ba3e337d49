from .sinks import ParquetTable
from .ingest import ingest_avro_stream
from .medallion import (
    bronze_stage,
    silver_stage,
    gold_stage,
    run_pipeline,
    upsert_stage,
    dq_split_stage,
)

__all__ = [
    "ParquetTable",
    "ingest_avro_stream",
    "bronze_stage",
    "silver_stage",
    "gold_stage",
    "run_pipeline",
    "upsert_stage",
    "dq_split_stage",
]
