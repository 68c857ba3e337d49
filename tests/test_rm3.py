"""RM3 pseudo-relevance feedback (queries/text.py) — the hash oracle is
the primary check (full two-pass pipeline replayed in DuckDB); these
pin the retrieval-semantics invariants."""

from __future__ import annotations

import os

import pytest

from databricks_end_to_end_streaming_spark.queries.text import (
    BM25_TERMS,
    RM3_EXP_TERMS,
    RM3_MIN_TERM_LEN,
    bm25_param_topk,
    rm3_expanded_search,
    rm3_expansion_terms,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_expansion_terms_valid(spark):
    rows = rm3_expansion_terms(spark, SF_DIR).collect()
    assert 0 < len(rows) <= RM3_EXP_TERMS
    weights = [r.weight_nano for r in rows]
    assert weights == sorted(weights, reverse=True)
    for r in rows:
        assert r.term not in BM25_TERMS  # never re-adds query terms
        assert len(r.term) >= RM3_MIN_TERM_LEN
        assert r.weight_nano > 0


def test_expanded_search_reranks(spark):
    plain = [r.doc_id for r in bm25_param_topk(spark, SF_DIR).collect()]
    expanded = [r.doc_id for r in rm3_expanded_search(spark, SF_DIR).collect()]
    assert len(expanded) == len(plain)
    assert expanded != plain  # expansion actually changes the ranking
