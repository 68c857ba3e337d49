"""CCNet head/middle/tail perplexity bucketing
(queries/text.py::ccnet_perplexity_buckets) — the hash oracle is the
primary check; these pin the tercile semantics."""

from __future__ import annotations

import os
from collections import Counter, defaultdict

import pytest

from databricks_end_to_end_streaming_spark.queries.text import (
    ccnet_perplexity_buckets,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def rows(spark):
    return ccnet_perplexity_buckets(spark, SF_DIR).collect()


def test_terciles_balanced_per_lang(rows):
    sizes = defaultdict(Counter)
    for r in rows:
        sizes[r.lang][r.bucket] += 1
    for lang, c in sizes.items():
        n = sum(c.values())
        # exact integer tercile cut: |head| = floor(n/3),
        # |head|+|middle| = floor(2n/3)
        assert c["head"] == n // 3, (lang, dict(c))
        assert c["head"] + c["middle"] == (2 * n) // 3, (lang, dict(c))
        assert set(c) <= {"head", "middle", "tail"}


def test_head_more_fluent_than_tail(rows):
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.bucket].append(r.mean_kn_prob)
    for lang, b in by_lang.items():
        if b["head"] and b["tail"]:
            assert min(b["head"]) >= max(b["tail"]), lang


def test_every_scored_doc_bucketed_once(rows):
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) > 0
