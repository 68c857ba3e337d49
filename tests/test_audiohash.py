"""Audio energy-delta fingerprinting (operators/audiohash.py): exact
agreement with a NumPy big-int twin on REAL (stdlib-encoded) WAV clips,
gain invariance, noise robustness within the Hamming budget, and the
corpus query's exact-dup floor."""

from __future__ import annotations

import io
import wave

import numpy as np

from databricks_end_to_end_streaming_spark.operators.audiohash import (
    audio_hashes,
    audio_neardup_pairs,
    energy_delta_hash,
)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytearray:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bytearray(buf.getvalue())


def _clip(seed: int, n: int = 4000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (
        6000 * np.sin(t / (20.0 + seed))
        + 3000 * np.sin(t / 7.0)
        + rng.normal(0, 300, n)
    )
    # even integers: a 0.5 gain stays EXACT in int16, so the scaled
    # twin's energies are exactly 1/4 and every bit is preserved
    return (np.clip(x, -16000, 16000).astype(np.int64) // 2 * 2).astype(
        np.int16
    )


def _media(spark, rows):
    data = [
        (
            int(mid),
            "audio",
            _wav_bytes(s),
            (None, None, 1, 8000, None, "wav"),
        )
        for mid, s in rows
    ]
    return spark.createDataFrame(
        data,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, channels:int, "
        "sample_rate:int, n_frames:int, format:string>",
    )


def test_hashes_match_python_twin_on_real_wavs(spark):
    rows = [(i, _clip(i)) for i in range(4)]
    got = {
        r["media_id"]: r["audiohash"]
        for r in audio_hashes(_media(spark, rows)).collect()
    }
    for i, s in rows:
        # the wav decode path reshapes to (n, 1, ch); hashing flattens
        assert got[i] == energy_delta_hash(s.astype(np.int64)), i


def test_gain_scaled_and_noisy_twins_pair_unrelated_does_not(spark):
    base = _clip(42)
    half = (base.astype(np.int64) // 2).astype(np.int16)  # exact 0.5 gain
    noisy = (
        base.astype(np.int64)
        + np.random.default_rng(1).integers(-40, 41, base.shape[0])
    ).astype(np.int16)
    other = _clip(7)
    media = _media(spark, [(0, base), (1, half), (2, noisy), (9, other)])
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in audio_neardup_pairs(media).collect()
    }
    assert pairs.get((0, 1)) == 0  # exact gain invariance
    assert (0, 2) in pairs  # noise stays within the Hamming budget
    assert not any(9 in p for p in pairs)


def test_corpus_query_finds_exact_dup_streams(spark):
    from databricks_end_to_end_streaming_spark.queries.extensions import (
        REINGEST_ID_FLAG,
        audio_energy_neardup,
    )

    pairs = audio_energy_neardup(spark, "/root/testdata/sf0.001").collect()
    assert len(pairs) > 0
    # every re-ingested clip (doc_id % 7 == 0, >= 130 bytes) pairs with
    # its original at hamming 0
    reingested = {
        (r["media_a"], r["media_b"])
        for r in pairs
        if r["hamming"] == 0
        and r["media_b"] - r["media_a"] == REINGEST_ID_FLAG
    }
    assert len(reingested) >= 50  # ~427/7 eligible docs
