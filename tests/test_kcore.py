"""K-core decomposition (operators/graph.py): the h-index iteration
must equal the sequential textbook peeling exactly, on planted shapes
(clique + tail, bowtie) and on the real co-purchase graph."""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.operators.graph import (
    kcore_decomposition,
)
from databricks_end_to_end_streaming_spark.queries import all_queries


def peel(edges):
    """Textbook sequential coreness: repeatedly remove the minimum-
    degree node; its coreness is the running maximum of min-degrees."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core, k = {}, 0
    live = dict(adj)
    while live:
        v = min(live, key=lambda n: (len(live[n]), n))
        k = max(k, len(live[v]))
        core[v] = k
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def check(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.node: (r.degree, r.coreness)
        for r in kcore_decomposition(df).collect()
    }
    want = peel(edges)
    assert {n: c for n, (_, c) in got.items()} == want
    return got


def test_clique_with_tail(spark):
    # 4-clique (coreness 3) with a path tail (coreness 1)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    got = check(spark, edges)
    assert got[1][1] == 3 and got[5][1] == 1 and got[6][1] == 1


def test_two_cliques_bridged(spark):
    # two triangles joined by one bridge edge: all coreness 2
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = check(spark, edges)
    assert all(c == 2 for _, c in got.values())


def test_registered_query_matches_peeling_on_testdata(spark):
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.analytics import (
        copurchase_mutual_knn_edges,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = [
        (r.a, r.b) for r in copurchase_mutual_knn_edges(li).collect()
    ]
    assert edges  # graph is non-trivial
    got = {
        r.node: r.coreness
        for r in all_queries()["kcore_decomposition"](spark, sf).collect()
    }
    assert got == peel(edges)
    assert max(got.values()) >= 2  # the corpus has a dense core


def test_degree_guard_fails_loudly_on_hot_node(spark):
    # r14: a star graph's hub would concentrate its whole neighbor-value
    # list in one collect_list buffer — the guard must raise BEFORE the
    # iteration, not OOM a task at scale.
    import pytest

    edges = [(0, i) for i in range(1, 9)]  # hub degree 8
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(ValueError, match="max degree"):
        kcore_decomposition(df, max_degree=4)
    # at/below the cap the same graph computes normally
    got = check(spark, edges)
    assert got[0][1] == 1  # a star peels at k = 1
