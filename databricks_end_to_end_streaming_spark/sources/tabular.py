"""Schema-pinned batch CSV / JSON sources.

The reference ingests only Kafka+Avro, but an engine users switch to
must also read the interchange formats their upstream lands as files.
Two disciplines, both about 100 TB behavior:

* ALWAYS an explicit schema. Schema inference is a full extra pass over
  the data before the real job starts — at 100 TB that doubles the scan
  — and it can silently flip types between runs (a column of ints with
  one stray float). The helpers here refuse to infer.
* Malformed-record policy is explicit, mirroring the Avro decode modes
  (X7, ``avro/functions.py``): PERMISSIVE keeps bad rows with the raw
  line in ``_corrupt_record`` (quarantine-able), DROPMALFORMED silently
  drops, FAILFAST aborts the job on first bad record.

Spark quirk handled here: in PERMISSIVE mode the corrupt-record column
exists only if it appears in the user schema, and a query that selects
ONLY that column is rejected (the parser prunes all data columns and
then has nothing to judge malformed-ness against) — callers filtering
quarantine rows should select data columns alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def _with_corrupt(schema: T.StructType, mode: str) -> T.StructType:
    if mode != "PERMISSIVE" or CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Batch CSV with explicit schema and malformed-record mode."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    return (
        spark.read.schema(_with_corrupt(schema, mode))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    **options: str,
) -> DataFrame:
    """Batch JSON-lines with explicit schema and malformed-record mode."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    return (
        spark.read.schema(_with_corrupt(schema, mode))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
