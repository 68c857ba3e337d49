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
