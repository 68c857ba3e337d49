"""Rendezvous resharding + largest-remainder apportionment (r13): the
invariants the operators exist for, beyond the oracle's bit-equality."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries import all_queries
from databricks_end_to_end_streaming_spark.queries.dq import APPORTION_BUDGET
from databricks_end_to_end_streaming_spark.queries.pipeline import (
    RDV_NEW_SHARDS,
    RDV_OLD_SHARDS,
    _rdv_argmax,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rendezvous_moves_only_to_added_shards(spark):
    """THE consistent-hashing property: every document whose new-ring
    argmax survives on an old shard stays exactly where it was —
    n_incoming is 0 on shards 0..11 and equals n_docs on 12..14 — and
    the movement total is in the ~3/15 ballpark, far below the ~11/12
    a mod-N rehash forces."""
    rows = all_queries()["reshard_movement_rendezvous"](
        spark, SF_DIR
    ).collect()
    assert {r.shard for r in rows} <= set(range(RDV_NEW_SHARDS))
    moved = total = 0
    for r in rows:
        if r.shard < RDV_OLD_SHARDS:
            assert r.n_incoming == 0, r
        else:
            assert r.n_incoming == r.n_docs, r
            moved += r.n_incoming
        total += r.n_docs
    expected = total * (RDV_NEW_SHARDS - RDV_OLD_SHARDS) / RDV_NEW_SHARDS
    assert 0 < moved < 2 * expected  # binomial around 1/5 of the corpus


def test_rendezvous_assignment_matches_python_reference(spark):
    """The HOF argmax equals a literal Python recomputation of the
    md5-prefix weights for a sample of documents."""
    import hashlib

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .limit(25)
    )
    got = {
        r.doc_id: (r.new_s, r.old_s)
        for r in docs.select(
            "doc_id",
            _rdv_argmax(RDV_NEW_SHARDS).alias("new_s"),
            _rdv_argmax(RDV_OLD_SHARDS).alias("old_s"),
        ).collect()
    }

    def ref(doc_id: int, n: int) -> int:
        best = (-1, -1)
        for s in range(n):
            h = hashlib.md5(f"rdv|{doc_id}|{s}".encode()).hexdigest()
            w = int(h[:15], 16)
            if w > best[0]:
                best = (w, s)
        return best[1]

    for doc_id, (new_s, old_s) in got.items():
        assert new_s == ref(doc_id, RDV_NEW_SHARDS)
        assert old_s == ref(doc_id, RDV_OLD_SHARDS)


def test_apportionment_sums_exactly_and_is_near_quota(spark):
    rows = all_queries()["apportion_budget_largest_remainder"](
        spark, SF_DIR
    ).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert sum(r.alloc for r in rows) == APPORTION_BUDGET  # exact, always
    for r in rows:
        exact = APPORTION_BUDGET * r.n_docs / total_docs
        assert abs(r.alloc - exact) < 1  # Hamilton stays within quota
        assert r.alloc in (r.base_alloc, r.base_alloc + 1)


def test_apportionment_known_vector(spark):
    """Hand-checked Hamilton vector: B=7 over counts (5,3,2), driving
    the production code via the call-time module constant."""
    from databricks_end_to_end_streaming_spark.queries.dq import (
        apportion_budget_largest_remainder,
    )
    import databricks_end_to_end_streaming_spark.queries.dq as dq

    # synthesize a tiny sf_dir: langs a/b/c with 5, 3, 2 docs and B=7:
    # quotas 3.5/2.1/1.4 -> base 3/2/1 (sum 6), leftover 1 seat to the
    # largest remainder: a (rem 5) beats b (rem 1*10%..); exact ints:
    # 7*5=35: 35//10=3 rem 5; 7*3=21: 2 rem 1; 7*2=14: 1 rem 4
    import os

    rows = [(i, f"d{i}", lang, "src", 1) for i, lang in enumerate(
        ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    )]
    sf = os.path.join(os.environ.get("TMPDIR", "/tmp"), "apportion_sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    orig = dq.APPORTION_BUDGET
    try:
        # the Spark body interpolates the module constant at CALL time,
        # so the rebind drives the same production code at B=7
        dq.APPORTION_BUDGET = 7
        got = {
            r.lang: r
            for r in apportion_budget_largest_remainder(spark, sf).collect()
        }
    finally:
        dq.APPORTION_BUDGET = orig
    # Hamilton at B=7 over (5,3,2): bases 3/2/1 (sum 6), one leftover
    # seat to the largest remainder (a: 35%10=5 beats c: 14%10=4)
    assert (got["a"].alloc, got["b"].alloc, got["c"].alloc) == (4, 2, 1)
    assert (got["a"].extra_seat, got["b"].extra_seat, got["c"].extra_seat) == (
        1,
        0,
        0,
    )
    assert sum(r.alloc for r in got.values()) == 7


def test_reshard_stage_drained_equals_batch_and_replays(spark, workdir):
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.reshard_stage import (
        reshard_report_from_log,
        reshard_stage,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/reshard_log")
    stage = reshard_stage(t)
    for i in range(3):
        stage(d.where(F.col("doc_id") % 3 == i), i)
    got = [tuple(r) for r in reshard_report_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["reshard_movement_rendezvous"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(d.where(F.col("doc_id") % 3 == 1), 1)  # replay
    assert [
        tuple(r) for r in reshard_report_from_log(spark, t).collect()
    ] == want


def test_apportion_stage_drained_equals_batch_and_as_of_view(spark, workdir):
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.apportion_stage import (
        apportionment_from_log,
        lang_count_stage,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    t = ParquetTable(f"{workdir}/lang_log")
    stage = lang_count_stage(t)
    for i in range(3):
        stage(d.where(F.col("doc_id") % 3 == i), i)
    got = [tuple(r) for r in apportionment_from_log(spark, t).collect()]
    want = [
        tuple(r)
        for r in all_queries()["apportion_budget_largest_remainder"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == want and len(got) > 0
    stage(d.where(F.col("doc_id") % 3 == 2), 2)  # replay
    assert [
        tuple(r) for r in apportionment_from_log(spark, t).collect()
    ] == want
    # as-of batch 0: the plan as it stood = a from-scratch apportionment
    # of batch 0's corpus alone (and it still sums to B exactly)
    from databricks_end_to_end_streaming_spark.queries.dq import (
        APPORTION_BUDGET,
        apportion_over_counts,
    )
    from databricks_end_to_end_streaming_spark.pin import pin

    asof = apportionment_from_log(spark, t, up_to_batch=0).collect()
    scratch = apportion_over_counts(
        pin(
            d.where(F.col("doc_id") % 3 == 0)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"))
        )
    ).collect()
    assert sorted(map(tuple, asof)) == sorted(map(tuple, scratch))
    assert sum(r.alloc for r in asof) == APPORTION_BUDGET
