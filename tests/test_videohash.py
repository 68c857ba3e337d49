"""Video near-dup (operators/phash.py frame_hashes/video_neardup_pairs):
per-frame hashes match the sequential twin exactly; a re-encoded
(brightness-shifted) + truncated clip pairs with its original at the
correct temporal offset; a single coincidental shared frame (title
card) fails the alignment vote; unrelated videos never pair."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.operators.phash import (
    ahash_dhash,
    frame_hashes,
    video_neardup_pairs,
)
from tests.test_phash import _base_image


def _video_rows(spark, rows):
    # rows: (media_id, ndarray n x h x w x c uint8) as fake/raw buffers
    data = [
        (
            int(mid),
            "video",
            bytearray(arr.tobytes()),
            (
                int(arr.shape[2]),
                int(arr.shape[1]),
                int(arr.shape[3]),
                None,
                int(arr.shape[0]),
                "fake/raw",
            ),
        )
        for mid, arr in rows
    ]
    return spark.createDataFrame(
        data,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, channels:int, "
        "sample_rate:int, n_frames:int, format:string>",
    )


def _clip(seed: int, n: int = 12) -> np.ndarray:
    return np.stack([_base_image(seed * 100 + t) for t in range(n)])


def test_frame_hashes_match_python_twin(spark):
    clips = [(0, _clip(1, n=4)), (1, _clip(2, n=3))]
    got = {
        (r["media_id"], r["frame_idx"]): (r["ahash"], r["dhash"])
        for r in frame_hashes(_video_rows(spark, clips)).collect()
    }
    for mid, arr in clips:
        for t in range(arr.shape[0]):
            assert got[(mid, t)] == ahash_dhash(arr[t]), (mid, t)
    assert len(got) == 7


def test_truncated_reencoded_clip_pairs_at_correct_offset(spark):
    base = _clip(7, n=12)
    # truncated (frames 3..11) + global brightness shift: the classic
    # trimmed re-upload
    trunc = np.clip(base[3:].astype(np.int16) + 9, 0, 255).astype(np.uint8)
    other = _clip(31, n=12)
    # title-card collision: one frame of `base` spliced into an
    # otherwise-unrelated clip — must FAIL the alignment vote
    splice = _clip(55, n=10).copy()
    splice[4] = base[5]
    media = _video_rows(
        spark, [(0, base), (1, trunc), (2, other), (3, splice)]
    )
    pairs = {
        (r["media_a"], r["media_b"]): r
        for r in video_neardup_pairs(media).collect()
    }
    assert (0, 1) in pairs, pairs.keys()
    got = pairs[(0, 1)]
    # frame j of the truncated clip is frame 3+j of the original:
    # offset (ib - ia) = -3, and ALL 9 surviving frames align
    assert got["offset"] == -3
    assert got["aligned_frames"] >= 6  # >= 0.6 of the 9-frame clip
    assert got["min_frames"] == 9
    assert not any(
        2 in p or 3 in p for p in pairs
    ), pairs.keys()  # unrelated + single-frame splice both rejected


def test_exact_duplicate_video_full_alignment(spark):
    base = _clip(9, n=6)
    media = _video_rows(spark, [(10, base), (20, base.copy())])
    rows = video_neardup_pairs(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["media_a"], r["media_b"]) == (10, 20)
    assert r["offset"] == 0 and r["aligned_frames"] == 6
    assert r["aligned_frac"] == 1.0
