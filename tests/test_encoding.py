"""Mojibake repair operator (operators/encoding.py).

The damage model is ``sloppy_cp1252_decode(utf8_bytes)`` — exactly what
a lenient cp1252 reader does to UTF-8 — and the repair must invert it
for any string that is itself a repair fixpoint (a string that already
LOOKS like mojibake is indistinguishable from damage; same caveat as
the public ftfy library)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_end_to_end_streaming_spark.operators.encoding import (
    MOJIBAKE_HINTS,
    fix_mojibake_col,
    fix_mojibake_text,
    mojibake_marker_count,
    sloppy_cp1252_decode,
    substr_count,
)


def corrupt(s: str) -> str:
    return sloppy_cp1252_decode(s.encode("utf-8"))


SAMPLES = [
    "café",
    "naïve — “quotes” … it’s",
    "日本語のテキスト",
    "привет мир",
    "emoji \U0001f389 party",
    "ā with a cp1252-hole byte (0x81)",  # C4 81 exercises the sloppy path
    "mixed ascii and é and 中",
    "żółć",  # multiple 2-byte sequences
]


@pytest.mark.parametrize("s", SAMPLES)
def test_roundtrip_recovers_original(s):
    damaged = corrupt(s)
    assert damaged != s
    assert fix_mojibake_text(damaged) == s


@pytest.mark.parametrize("s", SAMPLES)
def test_double_encoding_recovers(s):
    # doubly-misdecoded text repairs within the bounded fixpoint (the
    # sloppy decode emits only cp1252/Latin-1-control chars, so the
    # intermediate always re-encodes to UTF-8 — no skip path needed)
    assert fix_mojibake_text(corrupt(corrupt(s))) == s


def test_clean_text_untouched():
    for s in ["plain ascii", "bâtiment français", "él niño — “ok”", ""]:
        # genuine accented text must survive: its cp1252 bytes are not
        # valid UTF-8, so the strict decode rejects the repair
        assert fix_mojibake_text(s) == s


def test_non_latin_original_untouched():
    # original non-Latin text has no cp1252 encoding at all -> no-op
    assert fix_mojibake_text("привет") == "привет"
    assert fix_mojibake_text("日本語") == "日本語"


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=40,
    )
)
def test_property_damage_then_repair(s):
    # precondition: the original must be a repair fixpoint (text that
    # already looks like mojibake is indistinguishable from damage)
    if fix_mojibake_text(s) != s:
        return
    damaged = corrupt(s)
    assert fix_mojibake_text(damaged) == s


def test_spark_column_repair_and_markers(spark):
    rows = [(i, corrupt(s) if i % 2 == 0 else s) for i, s in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = (
        df.withColumn("fixed", fix_mojibake_col("text"))
        .withColumn("hints", mojibake_marker_count("text", MOJIBAKE_HINTS))
        .collect()
    )
    texts = dict(rows)
    for r in out:
        assert r.fixed == SAMPLES[r.id]
        # marker count must equal the exact non-overlapping substring
        # count (the three hint patterns are mutually non-overlapping);
        # Latin damage (Ã/â€/Â leads) must be detected, CJK/Cyrillic
        # damage legitimately lacks these hints
        want = sum(texts[r.id].count(h) for h in MOJIBAKE_HINTS)
        assert r.hints == want
        if r.id % 2 == 0 and any(h in texts[r.id] for h in MOJIBAKE_HINTS):
            assert r.hints > 0


def test_substr_count_raw_not_tokenized(spark):
    df = spark.createDataFrame([("aÃ©bÃ©c Ã©",)], "t string")
    n = df.select(substr_count("t", "Ã©").alias("n")).head().n
    assert n == 3  # raw substrings, not whitespace-delimited tokens


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("cafÃ©",)], "t string")
    got = [r.f for r in df.select(fix_mojibake_col("t").alias("f")).collect()]
    assert got == [None, "café"]
