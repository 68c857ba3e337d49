"""Python UDTFs (PySpark 4 user-defined table functions).

The reference uses no UDTFs (SURVEY §2.9); this completes the engine's
modern-PySpark API surface (DataSource API, pandas UDFs, applyInPandas,
transformWithState, UDTF) with the one table-generating case where a
UDTF is the right tool: variable-fan-out row expansion whose per-row
logic is genuinely imperative.

Scale discipline: a UDTF is row-at-a-time Python — the SLOW path. Use
it for moderate-volume expansion (config tables, samples, debugging
lateral joins), and keep hot-path expansion in built-in expressions:
``segment_sentences`` has an expression twin in ``queries/text.py``
(text_chunking) that stays inside whole-stage codegen. The pytest suite
asserts the two agree, which is exactly the relationship a production
repo should maintain: UDTF for flexibility, expressions for scale.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="seg_idx: int, segment: string, n_tokens: int")
class SegmentText:
    """Lateral-join text segmenter: emit one row per fixed-size token
    window (size 50, stride 40 — the text_chunking parameters).

    SQL: ``SELECT d.doc_id, s.* FROM documents d,
    LATERAL SegmentText(d.text)`` (after ``register_udtfs``), or
    DataFrame: ``df.lateralJoin(SegmentText(F.col("text")))``.
    """

    SIZE = 50
    STRIDE = 40

    def eval(self, text: str):  # noqa: A002 - Spark UDTF contract
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        i = 0
        idx = 0
        while i < len(toks):
            window = toks[i : i + self.SIZE]
            yield idx, " ".join(window), len(window)
            if i + self.SIZE >= len(toks):
                break
            i += self.STRIDE
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (idempotent)."""
    spark.udtf.register("segment_text", SegmentText)
