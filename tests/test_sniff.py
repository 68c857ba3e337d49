"""Container-header metadata sniffing (operators/multimodal.py
sniff_media_meta): real PNG/WAV/JPEG headers parse correctly without any
codec library, unknown bytes degrade to format='unknown', and the
distributed pass is map-side only with the payload dropped."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from databricks_end_to_end_streaming_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _sniff_header,
    sniff_media_meta,
)
from databricks_end_to_end_streaming_spark.operators.png_stdlib import encode_png


def _wav_bytes(n_frames=37, channels=2, rate=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x01" * channels * n_frames)
    return buf.getvalue()


def _jpeg_header(width=44, height=33, ncomp=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + bytes([ncomp])
        + bytes(3 * ncomp)
    )
    return b"\xff\xd8" + app0 + sof0


def test_sniff_header_all_formats():
    png = _sniff_header(encode_png(np.zeros((7, 5, 3), dtype=np.uint8)))
    assert (png["format"], png["width"], png["height"], png["channels"]) == (
        "png", 5, 7, 3,
    )
    wav = _sniff_header(_wav_bytes())
    assert (wav["format"], wav["channels"], wav["sample_rate"], wav["n_frames"]) == (
        "wav", 2, 16000, 37,
    )
    jpg = _sniff_header(_jpeg_header())
    assert (jpg["format"], jpg["width"], jpg["height"], jpg["channels"]) == (
        "jpeg", 44, 33, 3,
    )
    assert _sniff_header(b"garbage")["format"] == "unknown"
    assert _sniff_header(b"")["format"] == "unknown"


def test_sniff_truncated_headers_do_not_crash():
    for blob in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"RIFFxxxxWAVE"):
        out = _sniff_header(blob)
        assert out["width"] is None and out["n_frames"] is None


def test_distributed_sniff_matches_scalar_and_drops_payload(spark):
    payloads = {
        1: ("image", encode_png(np.zeros((7, 5, 3), dtype=np.uint8))),
        2: ("audio", _wav_bytes(n_frames=11, channels=1, rate=8000)),
        3: ("image", _jpeg_header(width=9, height=4, ncomp=1)),
        4: ("image", b"not-a-container"),
    }
    rows = [
        (mid, kind, payload, {"format": None})
        for mid, (kind, payload) in payloads.items()
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sniff_media_meta(df)
    assert "payload" not in out.columns
    got = {r["media_id"]: r["sniffed"].asDict() for r in out.collect()}
    for mid, (_kind, payload) in payloads.items():
        assert got[mid] == _sniff_header(payload), mid
    # map-side only: no exchange in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sniff_flags_declared_vs_actual_mismatch(spark):
    """The profiling use case: declared meta says 640x480 but the
    container header says 5x7 — the mismatch is visible in one pass."""
    import pyspark.sql.functions as F

    png = encode_png(np.zeros((7, 5, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "image", png, {"format": "png", "width": 640, "height": 480})],
        MEDIA_SCHEMA,
    )
    flagged = sniff_media_meta(df).where(
        (F.col("meta.width") != F.col("sniffed.width"))
        | (F.col("meta.height") != F.col("sniffed.height"))
    )
    assert flagged.count() == 1


# -- property tests: sniffed metadata equals the writer's parameters --

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n_frames=st.integers(1, 500),
        channels=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        width=st.sampled_from([1, 2]),
    )
    def test_wav_sniff_roundtrip_property(n_frames, channels, rate, width):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(width)
            wf.setframerate(rate)
            wf.writeframes(b"\x01" * width * channels * n_frames)
        out = _sniff_header(buf.getvalue())
        assert (out["format"], out["channels"], out["sample_rate"], out["n_frames"]) == (
            "wav", channels, rate, n_frames,
        )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        c=st.sampled_from([1, 2, 3, 4]),
    )
    def test_png_sniff_roundtrip_property(w, h, c):
        arr = np.zeros((h, w, c), dtype=np.uint8)
        out = _sniff_header(encode_png(arr))
        assert (out["format"], out["width"], out["height"], out["channels"]) == (
            "png", w, h, c,
        )

except ImportError:  # pragma: no cover - hypothesis is in this container
    pass
