"""operators/ package: SimHash, hyperplane-LSH ANN, multimodal plumbing —
each checked against a NumPy / pure-Python reference (SURVEY §5)."""

from __future__ import annotations

import random

import numpy as np
import pytest
import pyspark.sql.functions as F
from pyspark.sql import types as T

from databricks_end_to_end_streaming_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    image_feature_stats,
    make_fake_payload,
    resize_images,
    sample_video_frames,
)
from databricks_end_to_end_streaming_spark.operators.simhash import (
    BITS,
    simhash_neardup_pairs,
    simhash_signatures,
)
from databricks_end_to_end_streaming_spark.operators.similarity import (
    ann_lsh_topk,
)

# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def py_simhash(text: str) -> int:
    import hashlib

    votes = [0] * BITS
    for tok in text.lower().split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(BITS) if votes[b] > 0)


def test_simhash_matches_python_reference(spark):
    rng = random.Random(3)
    docs = [(i, " ".join(rng.choice(WORDS) for _ in range(30))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    for i, text in docs:
        assert got[i] == py_simhash(text)


def test_simhash_finds_close_pairs_and_exact_hamming(spark):
    rng = random.Random(4)
    base_docs = [(i, " ".join(rng.choice(WORDS) for _ in range(60))) for i in range(25)]
    # plant: identical copy (hamming 0) and a 1-word edit (small hamming)
    copy_of_3 = (100, base_docs[3][1])
    toks = base_docs[7][1].split()
    toks[5] = "omega"
    edit_of_7 = (101, " ".join(toks))
    docs = base_docs + [copy_of_3, edit_of_7]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(3, 100)] == 0
    # hamming reported must equal the python computation for all pairs
    sig = {i: py_simhash(t) for i, t in docs}
    for (a, b), h in pairs.items():
        assert bin(sig[a] ^ sig[b]).count("1") == h


def test_simhash_banding_guard():
    with pytest.raises(ValueError):
        simhash_neardup_pairs(None, max_hamming=4)


# ---------------------------------------------------------------------------
# ANN (hyperplane LSH)
# ---------------------------------------------------------------------------


def test_ann_recall_vs_bruteforce(spark):
    rng = np.random.RandomState(11)
    n, dim = 400, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-identical neighbors for the first 5 vectors
    for i in range(5):
        vecs[n - 5 + i] = vecs[i] + rng.standard_normal(dim).astype(np.float32) * 0.05
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = ann_lsh_topk(emb, queries, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    # brute-force ground truth in numpy
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    for q in range(5):
        true_top1 = int(np.argsort(-np.delete(sims[q], q))[0])
        true_top1 = true_top1 if true_top1 < q else true_top1 + 1
        assert true_top1 == n - 5 + q  # the planted twin is the true top-1
        ranked = sorted(by_query[q])
        assert ranked[0][1] == true_top1  # ANN finds it at rank 1


def test_multiprobe_recall_beats_single_probe_at_equal_tables(spark):
    """Multi-probe's reason to exist: at the SAME index size (4 tables),
    probing the low-margin bit flips recovers strictly more candidate
    mass than home buckets alone — planted twins are found at rank 1,
    and the probe sequence is deterministic across invocations."""
    from databricks_end_to_end_streaming_spark.operators.similarity import (
        ann_multiprobe_topk,
        multiprobe_buckets,
    )

    rng = np.random.RandomState(13)
    n, dim = 400, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(5):
        vecs[n - 5 + i] = vecs[i] + rng.standard_normal(dim).astype(
            np.float32
        ) * 0.05
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = ann_multiprobe_topk(emb, queries, k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"])
        )
    for q in range(5):
        assert sorted(by_query[q])[0][1] == n - 5 + q  # planted twin top-1

    # candidate-mass comparison at equal index size: the 3-probe query
    # bucket set strictly contains the 1-probe set and is larger
    one = multiprobe_buckets(queries, "qv", dim, 8, 4, 1).collect()
    three = multiprobe_buckets(queries, "qv", dim, 8, 4, 3).collect()
    for r1, r3 in zip(sorted(one, key=lambda r: r.query_id),
                      sorted(three, key=lambda r: r.query_id)):
        s1 = {(p.table_id, p.bucket) for p in r1.probes}
        s3 = {(p.table_id, p.bucket) for p in r3.probes}
        assert s1 < s3 and len(s3) == 3 * len(s1)
    # determinism: a second invocation yields the identical probe lists
    again = multiprobe_buckets(queries, "qv", dim, 8, 4, 3).collect()
    key = lambda rows: sorted(
        (r.query_id, tuple((p.table_id, p.bucket) for p in r.probes))
        for r in rows
    )
    assert key(three) == key(again)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def meta(w=4, h=4, c=1, n=1, fmt="fake/raw", sr=None):
    return {
        "width": w,
        "height": h,
        "channels": c,
        "sample_rate": sr,
        "n_frames": n,
        "format": fmt,
    }


def test_image_feature_stats_matches_numpy(spark):
    m = meta(w=8, h=4)
    rows = [(i, "image", make_fake_payload(i, m), m) for i in range(6)]
    df = media_df(spark, rows)
    got = {r["media_id"]: r for r in image_feature_stats(df).collect()}
    for i, _, payload, mm in rows:
        arr = np.frombuffer(payload, dtype=np.uint8).reshape(4, 8, 1)
        assert got[i]["mean_intensity"] == pytest.approx(arr.mean())
        assert got[i]["min_intensity"] == arr.min()
        assert sum(got[i]["histogram"]) == arr.size


def test_resize_plumbing_preserves_schema_and_dims(spark):
    m = meta(w=8, h=8)
    rows = [(1, "image", make_fake_payload(1, m), m)]
    out = resize_images(media_df(spark, rows), out_w=4, out_h=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2
    assert len(bytes(r["payload"])) == 4 * 2 * 1
    # nearest-neighbor picks existing bytes
    src = np.frombuffer(rows[0][2], dtype=np.uint8).reshape(8, 8, 1)
    dst = np.frombuffer(bytes(r["payload"]), dtype=np.uint8).reshape(2, 4, 1)
    assert set(dst.ravel()) <= set(src.ravel())


def test_video_frame_sampling(spark):
    m = meta(w=4, h=2, n=6)
    rows = [
        (7, "video", make_fake_payload(7, m), m),
        (8, "image", make_fake_payload(8, meta(w=4, h=2)), meta(w=4, h=2)),
    ]
    out = sample_video_frames(media_df(spark, rows), every_k=2).collect()
    # only the video row explodes; frames 0,2,4
    assert {r["media_id"] for r in out} == {7}
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]
    for r in out:
        assert len(bytes(r["frame"])) == 4 * 2 * 1
        assert r["meta"]["n_frames"] == 1


def test_real_format_decode_raises_without_codec():
    from databricks_end_to_end_streaming_spark.operators import multimodal

    if multimodal._pil_image is None:
        with pytest.raises(NotImplementedError, match="media library"):
            decode_stub(b"\xff\xd8", {"format": "jpeg"})
    # pyav formats always raise here (never probed)
    with pytest.raises(NotImplementedError, match="media library"):
        decode_stub(b"\x00", {"format": "mp4"})
    with pytest.raises(ValueError, match="unknown media format"):
        decode_stub(b"", {"format": "weird"})


def test_real_png_decodes_with_pillow():
    """Runs only on Pillow-equipped environments (skipped here): the
    jpeg/png path must produce the (h, w, c) array the fake path does."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    img = PIL_Image.new("RGB", (4, 3), color=(10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = decode_stub(buf.getvalue(), {"format": "png"})
    assert arr.shape == (3, 4, 3)
    assert (arr[0, 0] == np.asarray([10, 20, 30])).all()


def _pcm16_wav_bytes(samples, rate=16000):
    """Write (n, ch) int16 samples to WAV via the stdlib encoder."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_real_wav_decodes_in_every_environment():
    """The stdlib `wave` fallback makes real 16-bit PCM WAV decode with
    no third-party codec — exercised in-container, not skipped."""
    import numpy as np

    samples = (np.arange(16, dtype=np.int16) - 8).reshape(8, 2)
    arr = decode_stub(_pcm16_wav_bytes(samples), {"format": "wav"})
    assert arr.shape == (8, 1, 2)
    assert (arr[:, 0, :] == samples).all()


def test_real_wav_8bit_matches_soundfile_convention():
    """8-bit unsigned PCM maps to int16 as (x-128)<<8 — soundfile's
    convention, so the two wav paths agree where both exist."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([0, 128, 255]))
    arr = decode_stub(buf.getvalue(), {"format": "wav"})
    assert arr.shape == (3, 1, 1)
    assert arr[:, 0, 0].tolist() == [-32768, 0, 32512]


def test_real_wav_in_feature_stats_pipeline(spark):
    """End-to-end: a REAL wav payload through the Arrow-batched
    image_feature_stats operator (moments over int16 samples)."""
    import numpy as np

    from databricks_end_to_end_streaming_spark.operators.multimodal import (
        image_feature_stats,
    )

    samples = np.array([[0], [100], [200], [50]], dtype=np.int16)
    payload = _pcm16_wav_bytes(samples)
    media = spark.createDataFrame(
        [
            (
                1,
                "audio",
                bytearray(payload),
                {"sample_rate": 16000, "channels": 1, "format": "wav"},
            )
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<sample_rate:int, channels:int, format:string>",
    )
    row = image_feature_stats(media).collect()[0]
    assert row["media_id"] == 1
    assert row["mean_intensity"] == pytest.approx(87.5)
    assert row["min_intensity"] == 0
    assert row["max_intensity"] == 200


def test_approx_percentiles_within_rank_bound(spark):
    """percentile_approx values must sit within the GK rank-error bound
    (n/accuracy, here < 1 rank at sf0.001) of the exact nearest-rank
    order statistics."""
    from databricks_end_to_end_streaming_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    approx = {
        r["percentile"]: r["value"]
        for r in all_queries()["event_value_percentiles_approx"](spark, sf).collect()
    }
    exact_rows = sorted(
        r["value"]
        for r in all_queries()["event_value_percentiles_exact"](spark, sf)
        .sparkSession.read.parquet(f"{sf}/events.parquet")
        .select("value")
        .collect()
    )
    n = len(exact_rows)
    import math

    for label, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        target = math.ceil(q * n)
        got_rank = exact_rows.index(approx[label]) + 1
        assert abs(got_rank - target) <= 1, (label, got_rank, target)


def test_corr_query_matches_numpy(spark):
    """The exact-integer-moment corr/slope/stddev must agree with
    NumPy's float implementations to well under 1e-9 relative (the
    moments are exact; only the final IEEE expression differs)."""
    import numpy as np

    from databricks_end_to_end_streaming_spark.queries import all_queries
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["corr_value_day_per_type"](spark, sf).collect()
    ev = load_table(spark, sf, "events").select(
        "event_type", "value", "ts"
    ).collect()
    d0 = min(r["ts"].date() for r in ev)
    by_type: dict = {}
    for r in ev:
        cents = round(r["value"] * 100)
        day = (r["ts"].date() - d0).days
        by_type.setdefault(r["event_type"], []).append((cents, day))
    assert rows, "query returned nothing"
    for row in rows:
        xs, ys = zip(*by_type[row["event_type"]])
        x, y = np.array(xs, dtype=float), np.array(ys, dtype=float)
        ref_corr = np.corrcoef(x, y)[0, 1]
        ref_slope = np.polyfit(y, x, 1)[0]
        ref_std = x.std() / 100.0
        assert row["n"] == len(xs)
        assert abs(row["corr_value_day"] - ref_corr) < 1e-9
        assert abs(row["slope_cents_per_day"] - ref_slope) < 1e-6
        assert abs(row["stddev_value"] - ref_std) < 1e-9


def test_gram_matrix_close_to_numpy_float_gram(spark):
    """The fixed-point second-moment matrix approximates the float Gram
    within the documented 2^-20-per-coordinate quantization bound."""
    import numpy as np

    from databricks_end_to_end_streaming_spark.queries import all_queries

    rows = all_queries()["embedding_second_moment_matrix"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"
            ).collect()
        ],
        dtype=np.float64,
    )
    n, d = emb.shape
    gram = emb.T @ emb / n
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        # quantization perturbs each coordinate by < 2^-20; the moment
        # of products then drifts by ~2 * 2^-20 * max|x| ~ 1.2e-6
        assert abs(r["moment"] - gram[r["i"], r["j"]]) < 5e-6, (r["i"], r["j"])


def test_robust_value_stats_planted(spark):
    """Hand-computable median / MAD / trimmed mean through the real
    query machinery (a temp view standing in for the events table), on
    odd and even counts with a planted outlier the robust trio must
    shrug off."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        robust_value_stats_per_type,
    )
    from databricks_end_to_end_streaming_spark import tables

    # odd: values 1..5 -> median 3, devs {2,1,0,1,2} -> MAD 1
    # even+outlier: 1,2,3,1000 -> median 2 (rank ceil(4/2)=2),
    #   devs {1,0,1,998} sorted {0,1,1,998} -> MAD rank2 = 1
    #   n=4 -> lo=0, hi=4: no trim -> trimmed = mean = 251.5
    # big: 1..20 with one 10000 swapped in for 20 -> n=20, lo=2, hi=18
    #   -> trimmed mean of ranks 3..18 = values 3..18 -> 10.5
    rows = (
        [("odd", float(v), i) for i, v in enumerate([3, 1, 5, 2, 4])]
        + [("even", float(v), 10 + i) for i, v in enumerate([1000, 2, 3, 1])]
        + [("big", float(v), 100 + i)
           for i, v in enumerate(list(range(1, 20)) + [10000])]
    )
    df = spark.createDataFrame(
        rows, "event_type string, value double, event_id long"
    )

    orig = tables.load_table
    try:
        tables.load_table = lambda sp, sf, name: df
        import databricks_end_to_end_streaming_spark.queries.analytics as A

        orig_a = A.load_table
        A.load_table = lambda sp, sf, name: df
        try:
            got = {
                r["event_type"]: (
                    r["n"], r["median"], r["mad"], r["trimmed_mean_10"]
                )
                for r in robust_value_stats_per_type(spark, "unused").collect()
            }
        finally:
            A.load_table = orig_a
    finally:
        tables.load_table = orig
    assert got["odd"] == (5, 3.0, 1.0, 3.0)
    assert got["even"] == (4, 2.0, 1.0, 251.5)
    n, med, mad, tm = got["big"]
    assert (n, med) == (20, 10.0)
    assert tm == sum(range(3, 19)) / 16  # = 10.5: outlier trimmed away
