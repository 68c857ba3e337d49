"""Hybrid BM25 + cosine retrieval fused by Reciprocal Rank Fusion
(queries/similarity.py::hybrid_search_rrf)."""

from __future__ import annotations

import os

import pytest

from databricks_end_to_end_streaming_spark.queries.similarity import (
    RRF_K,
    RRF_LEG_DEPTH,
    RRF_TOP,
    hybrid_search_rrf,
)
from databricks_end_to_end_streaming_spark.queries.text import (
    bm25_keyword_search,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def fused(spark):
    return hybrid_search_rrf(spark, SF_DIR).collect()


def test_shape_and_rank_domains(fused):
    assert 0 < len(fused) <= RRF_TOP
    for r in fused:
        assert r.lex_rank is None or 1 <= r.lex_rank <= RRF_LEG_DEPTH
        assert r.sem_rank is None or 1 <= r.sem_rank <= RRF_LEG_DEPTH
        assert r.lex_rank is not None or r.sem_rank is not None


def test_rrf_score_is_exactly_rank_fusion(fused):
    for r in fused:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            want += 1.0 / (RRF_K + r.sem_rank)
        assert r.rrf_score == want  # exact: built from integer ranks


def test_output_ordered_by_fused_score(fused):
    keys = [(-r.rrf_score, r.doc_id) for r in fused]
    assert keys == sorted(keys)


def test_both_leg_doc_beats_single_leg_equal_rank(fused):
    # any doc present in both legs outscores a doc whose single-leg rank
    # equals the better of the pair — fusion rewards agreement
    both = [r for r in fused if r.lex_rank is not None and r.sem_rank is not None]
    single = [r for r in fused if (r.lex_rank is None) != (r.sem_rank is None)]
    for b in both:
        best = min(b.lex_rank, b.sem_rank)
        for s in single:
            srank = s.lex_rank if s.lex_rank is not None else s.sem_rank
            if srank >= best:
                assert b.rrf_score > s.rrf_score


def test_lexical_leg_agrees_with_bm25_query(spark, fused):
    # the fused lexical ranks must be the bm25_keyword_search ordering
    bm25 = bm25_keyword_search(spark, SF_DIR).collect()
    order = {r.doc_id: i + 1 for i, r in enumerate(bm25)}
    for r in fused:
        if r.lex_rank is not None and r.lex_rank <= len(order):
            assert order.get(r.doc_id) == r.lex_rank


def test_ranks_unique_per_leg(fused):
    lex = [r.lex_rank for r in fused if r.lex_rank is not None]
    sem = [r.sem_rank for r in fused if r.sem_rank is not None]
    assert len(lex) == len(set(lex))
    assert len(sem) == len(set(sem))


def test_incremental_lexical_leg_fuses_identically(spark, workdir, fused):
    """Serve the lexical leg from a DRAINED streaming BM25 log and fuse:
    must equal the batch hybrid_search_rrf bit-for-bit — the incremental
    serving path for hybrid retrieval."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.similarity import (
        _RRF_QUERY_VEC_ID,
        lex_ranks,
        rrf_fuse,
        sem_leg,
        sem_ranks,
    )
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.bm25 import (
        bm25_stage,
        bm25_topk_from_log,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    f_t = ParquetTable(f"{workdir}/features")
    s_t = ParquetTable(f"{workdir}/stats")
    stage = bm25_stage(f_t, s_t)
    for i in range(3):  # arbitrary slicing — the monoid is split-invariant
        stage(docs.where(F.col("doc_id") % 3 == i), i)
    lex_top = bm25_topk_from_log(spark, f_t, s_t, top_k=RRF_LEG_DEPTH)
    emb = load_table(spark, SF_DIR, "embeddings")
    got = rrf_fuse(
        lex_ranks(lex_top), sem_ranks(sem_leg(emb, _RRF_QUERY_VEC_ID))
    ).collect()
    want = [tuple(r) for r in fused]
    assert [tuple(r) for r in got] == want


def test_retrieval_eval_invariants(spark):
    from databricks_end_to_end_streaming_spark.queries.similarity import (
        NDCG_AT,
        retrieval_eval_ndcg,
    )

    rows = {r.system: r for r in retrieval_eval_ndcg(spark, SF_DIR).collect()}
    assert set(rows) == {"bm25", "rrf"}
    for r in rows.values():
        assert 0 < r.ndcg_nano <= 1_000_000_000  # nDCG in (0, 1]
        assert 0 <= r.mrr_nano <= 1_000_000_000
        assert 0 <= r.n_rel_at_k <= NDCG_AT
    # BM25 ranks by exactly the signal the qrels grade (term coverage),
    # so it cannot trail the hybrid on this judgment
    assert rows["bm25"].ndcg_nano >= rows["rrf"].ndcg_nano
