"""PageRank: exactness vs a NumPy power iteration with identical
semantics (synchronous updates, dangling-mass redistribution), plus
closed-form sanity on tiny graphs."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Window

from databricks_end_to_end_streaming_spark.operators.graph import pagerank
from databricks_end_to_end_streaming_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def ref_pagerank(edges, damping=0.85, iters=10):
    """edges: [(src, dst, w)] — the same synchronous formulation."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros((n, n))
    outw: dict = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0.0) + w
    for u, v, w in edges:
        p[idx[u], idx[v]] += w / outw[u]
    dangling = [idx[x] for x in nodes if x not in outw]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dmass = r[dangling].sum()
        r = (1 - damping) / n + damping * (r @ p + dmass / n)
    return dict(zip(nodes, r))


def test_two_node_cycle_is_uniform(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert abs(out["a"] - 0.5) < 1e-12 and abs(out["b"] - 0.5) < 1e-12


def test_dangling_node_mass_conserved(spark):
    # a -> b, b dangles: total rank must stay 1.0 (mass redistribution)
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = pagerank(e, iters=10).collect()
    total = sum(r["rank"] for r in out)
    assert abs(total - 1.0) < 1e-9
    ref = ref_pagerank([("a", "b", 1.0)], iters=10)
    for r in out:
        assert abs(r["rank"] - ref[r["node"]]) < 1e-12


def test_event_transition_graph_matches_numpy(spark):
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    edges = [(r["event_type"], r["next_type"], float(r["n"])) for r in trans]
    ref = ref_pagerank(edges, iters=10)

    e = spark.createDataFrame(
        edges, "src string, dst string, n double"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight="n", iters=10).collect()
    }
    assert set(got) == set(ref)
    for node, rank in got.items():
        assert abs(rank - ref[node]) < 1e-9, node
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_random_graph_sweep_matches_numpy(spark):
    """Seeded sweep: random weighted digraphs (with dangling nodes and
    parallel-edge collapse) match the NumPy reference and conserve
    total mass."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n_nodes = rng.randint(3, 8)
        names = [f"n{i}" for i in range(n_nodes)]
        edges = []
        for _ in range(rng.randint(2, 14)):
            u, v = rng.choice(names), rng.choice(names)
            edges.append((u, v, float(rng.randint(1, 5))))
        # collapse parallel edges the same way the operator does
        agg: dict = {}
        for u, v, w in edges:
            agg[(u, v)] = agg.get((u, v), 0.0) + w
        collapsed = [(u, v, w) for (u, v), w in agg.items()]
        ref = ref_pagerank(collapsed, iters=8)

        e = spark.createDataFrame(edges, "src string, dst string, n double")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(e, weight="n", iters=8).collect()
        }
        assert set(got) == set(ref), trial
        for node in got:
            assert abs(got[node] - ref[node]) < 1e-9, (trial, node)
        assert abs(sum(got.values()) - 1.0) < 1e-9, trial


def test_deterministic_mode_matches_default_and_numpy(spark):
    """deterministic=True changes only the float summation ORDER (sorted
    left fold vs algebraic partial agg) — ranks must agree with the
    default mode and the NumPy reference to well under rounding noise,
    and dangling mass must still be redistributed."""
    edges = [
        ("a", "b", 3.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("c", "a", 1.0),
        ("c", "d", 5.0),  # d is dangling
    ]
    ref = ref_pagerank(edges, iters=10)
    e = spark.createDataFrame(edges, "src string, dst string, n double")
    det = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight="n", iters=10, deterministic=True).collect()
    }
    dflt = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight="n", iters=10).collect()
    }
    assert set(det) == set(ref)
    for node in det:
        assert abs(det[node] - ref[node]) < 1e-9, node
        assert abs(det[node] - dflt[node]) < 1e-12, node
    assert abs(sum(det.values()) - 1.0) < 1e-9
