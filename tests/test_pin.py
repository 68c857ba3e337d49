"""pin() durability switch (pin.py): the local default, the reliable
(fault-tolerant sc.checkpoint) path for spot-executor clusters, and the
recompute-on-loss persist path all yield identical data."""

from __future__ import annotations

import os

import pytest

from databricks_end_to_end_streaming_spark.pin import pin, pin_mode


def _df(spark):
    return spark.range(100).selectExpr("id", "id * 2 AS twice")


def test_local_default(spark):
    out = pin(_df(spark))
    assert out.count() == 100
    assert pin_mode() == "local"


def test_reliable_checkpoint(spark, workdir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", f"{workdir}/reliable_ckpt")
    out = pin(_df(spark), mode="reliable")
    assert sorted(r.twice for r in out.collect()) == [i * 2 for i in range(100)]
    # blocks really went to the reliable checkpoint dir
    found = []
    for root, _dirs, files in os.walk(f"{workdir}/reliable_ckpt"):
        found.extend(files)
    assert found, "reliable checkpoint wrote no files"


def test_persist_disk(spark):
    out = pin(_df(spark), mode="persist")
    try:
        assert out.count() == 100
        assert out.storageLevel.useDisk and not out.storageLevel.useMemory
    finally:
        out.unpersist()


def test_bad_mode_rejected(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "banana")
    with pytest.raises(ValueError):
        pin_mode()


def test_bloom_stage_under_persist_pin(spark, workdir, monkeypatch):
    """A real streaming stage runs correctly under a non-default pin
    mode: same cross-batch suppression as the local-mode test, with
    every pin site routed through DISK_ONLY persist."""
    import random

    from databricks_end_to_end_streaming_spark.streaming.bloom_stage import (
        bloom_dedup_batch,
    )
    from databricks_end_to_end_streaming_spark.streaming.sinks import ParquetTable

    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "persist")
    words = "alpha beta gamma delta epsilon zeta".split()
    rng = random.Random(5)

    def doc():
        return " ".join(rng.choice(words) for _ in range(12))

    b1 = spark.createDataFrame(
        [(i, doc()) for i in range(15)], "doc_id long, text string"
    )
    dup_text = b1.collect()[3].text
    b2 = spark.createDataFrame(
        [(100, doc()), (101, dup_text)], "doc_id long, text string"
    )
    out = ParquetTable(f"{workdir}/out")
    fp = ParquetTable(f"{workdir}/fp")
    bm = ParquetTable(f"{workdir}/bitmap")
    bloom_dedup_batch(b1, out, fp, bm, 0, m_bits=1 << 14)
    c = bloom_dedup_batch(b2, out, fp, bm, 1, m_bits=1 << 14)
    assert c["emitted"] == 1
    ids = {r.doc_id for r in out.read(spark).collect()}
    assert 100 in ids and 101 not in ids


def test_frozen_under_persist_routes_or_warns(spark, workdir, monkeypatch):
    """require_frozen under persist mode must not silently lose fault
    tolerance (ADVICE r5): with a checkpoint dir it upgrades to a
    reliable checkpoint; without one it warns once and localCheckpoints."""
    import warnings

    from databricks_end_to_end_streaming_spark import pin as pin_mod

    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "persist")
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    had_dir = not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
    if not had_dir:
        pin_mod._warned_frozen_sites.clear()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = pin(_df(spark), require_frozen=True, site="test.site_a")
            assert out.count() == _df(spark).count()
            assert any("non-fault-tolerant" in str(x.message).lower() for x in w)
            # per-SITE warn-once (ADVICE r6): a different frozen site
            # warns too; the same site repeated stays quiet
            pin(_df(spark), require_frozen=True, site="test.site_b")
            pin(_df(spark), require_frozen=True, site="test.site_a")
            msgs = [
                str(x.message)
                for x in w
                if "non-fault-tolerant" in str(x.message).lower()
            ]
            assert len(msgs) == 2 and any("test.site_b" in m for m in msgs)
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", f"{workdir}/ckpt")
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out = pin(_df(spark), require_frozen=True)
        assert out.count() == _df(spark).count()
        # routed to reliable: no downgrade warning, and the context has a
        # checkpoint dir with rdd-* payloads (an earlier test may have
        # configured a different dir on the shared context - glob there)
        assert not any("non-fault-tolerant" in str(x.message).lower() for x in w2)
    import glob as _glob

    ckpt = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert _glob.glob(ckpt.replace("file:", "") + "/rdd-*")
