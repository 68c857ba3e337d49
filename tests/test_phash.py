"""Perceptual image near-dup (operators/phash.py): exact agreement with
a sequential big-int twin, and the planted-twin guarantees — a resized
copy and a brightness-shifted copy of a REAL (stdlib-encoded) PNG must
pair with their original within 3 Hamming bits while an unrelated image
must not."""

from __future__ import annotations

import numpy as np

from databricks_end_to_end_streaming_spark.operators.phash import (
    GRID,
    _grid_means,
    _to_gray,
    ahash_dhash,
    perceptual_hashes,
    phash_neardup_pairs,
)
from databricks_end_to_end_streaming_spark.operators.png_stdlib import (
    encode_png,
)

def _media_rows(spark, rows):
    # rows: (media_id, ndarray HxWxC uint8) encoded as real PNGs
    data = [
        (
            int(mid),
            "image",
            bytearray(encode_png(arr)),
            (
                int(arr.shape[1]),
                int(arr.shape[0]),
                int(arr.shape[2]),
                None,
                1,
                "png",
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


def _base_image(seed: int, h: int = 24, w: int = 24) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth-ish structure so the perceptual grid is meaningful
    y, x = np.mgrid[0:h, 0:w]
    img = (
        96
        + 64 * np.sin(x / 5.0 + seed)
        + 48 * np.cos(y / 7.0 - seed)
        + rng.integers(0, 8, size=(h, w))
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img, img, np.clip(img + 10, 0, 255).astype(np.uint8)], axis=2)


def test_hashes_match_python_twin_exactly(spark):
    rows = [(i, _base_image(i)) for i in range(5)]
    got = {
        r["media_id"]: (r["ahash"], r["dhash"])
        for r in perceptual_hashes(_media_rows(spark, rows)).collect()
    }
    for i, arr in rows:
        assert got[i] == ahash_dhash(arr)  # decode(encode(png)) is lossless


def test_grid_means_cover_tiny_and_tall_images():
    tiny = _to_gray(_base_image(1, h=3, w=5))
    s, a = _grid_means(tiny, GRID, GRID)
    assert (a >= 1).all() and s.shape == (GRID, GRID)
    tall = _to_gray(_base_image(2, h=64, w=4))
    s, a = _grid_means(tall, GRID, GRID + 1)
    assert (a >= 1).all() and int(a.sum()) >= tall.size


def test_resize_and_brightness_twins_pair_with_original(spark):
    base = _base_image(42)
    bright = np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8)
    resized = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)  # 2x upscale
    other = _base_image(7)  # unrelated image
    media = _media_rows(
        spark, [(0, base), (1, bright), (2, resized), (9, other)]
    )
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in phash_neardup_pairs(media, max_hamming=3).collect()
    }
    assert (0, 1) in pairs  # brightness twin caught
    assert (0, 2) in pairs  # resize twin caught
    assert not any(9 in p for p in pairs)  # unrelated image not paired


def test_negative_signature_pairing_is_correct(spark):
    """Signatures with bit 63 set are negative longs — the unsigned
    chunking must still bucket them; plant two such signatures 1 bit
    apart and one far away."""
    from databricks_end_to_end_streaming_spark.operators.simhash import (
        hamming_neardup_pairs,
    )

    s1 = -(1 << 62) - 5  # bit 63 set
    s2 = s1 ^ 1  # hamming 1
    s3 = 12345
    sigs = spark.createDataFrame(
        [(1, s1), (2, s2), (3, s3)], "media_id long, sig long"
    )
    got = hamming_neardup_pairs(
        sigs, id_col="media_id", sig_col="sig", bits=64, n_chunks=4
    ).collect()
    assert [(r["media_id_a"], r["media_id_b"], r["hamming"]) for r in got] == [
        (1, 2, 1)
    ]


def test_corpus_query_finds_exact_dup_rasters(spark):
    from databricks_end_to_end_streaming_spark.queries.extensions import (
        image_phash_neardup,
    )

    pairs = image_phash_neardup(spark, "/root/testdata/sf0.001").collect()
    assert len(pairs) > 0
    assert any(r["hamming"] == 0 for r in pairs)  # exact-dup docs exist
