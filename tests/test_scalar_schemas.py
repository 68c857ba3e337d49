"""Every ORACLED query must emit only scalar (atomic) columns.

The driver's correctness harness canonicalizes query output with pandas
(sort_values over every column) before hashing; array/map/struct cells
are unhashable there and produce a red row regardless of whether the
values are right (this is exactly how sq8_embedding_quantization failed
in round 6 — see VERDICT.md r6 §wrong-1). This test makes that failure
class impossible to reintroduce: any registered query that ships an
oracle must serialize complex columns (e.g. ``concat_ws`` /
``array_to_string``) before returning.

Rows-only queries (no oracle) are exempt: the driver only counts their
rows, and several legitimately return arrays for in-repo consumers.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from databricks_end_to_end_streaming_spark.queries import all_oracles, all_queries

SF = "/root/testdata/sf0.001"

_ATOMIC = (
    T.StringType,
    T.BinaryType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
    T.DoubleType,
    T.FloatType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.NullType,
)


def test_all_oracled_queries_emit_scalar_columns_only(spark):
    oracled = set(all_oracles())
    bad: list[str] = []
    for name, fn in all_queries().items():
        if name not in oracled:
            continue
        schema = fn(spark, SF).schema
        for field in schema.fields:
            if not isinstance(field.dataType, _ATOMIC):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "oracled queries with non-scalar output columns (driver hash "
        f"harness cannot canonicalize these): {bad}"
    )


def test_guard_covers_the_r6_regression():
    # the query that regressed in r6 is oracled, so the guard above
    # actually watches it
    assert "sq8_embedding_quantization" in all_oracles()
