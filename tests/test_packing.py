"""Next-fit doc-boundary packing (queries/text.py::packing_next_fit_stats):
the distributed int64-encoded fold must agree with a plain sequential
Python packer on planted groups, across shards, with exact padding."""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.queries.text import (
    PACK_BUDGET,
    PACK_SHARDS,
    packing_next_fit_stats,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _pack_ref(lens: list[int]) -> int:
    """Sequential reference: sorted next-fit bins over truncated lens."""
    bins, running = 0, 0
    for l in sorted(lens, reverse=True):
        l = min(l, PACK_BUDGET)
        if running + l > PACK_BUDGET:
            bins, running = bins + 1, l
        else:
            running += l
    return bins + (1 if running > 0 else 0)


def _write(spark, workdir, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{workdir}/p/documents.parquet"
    )
    return f"{workdir}/p"


def test_next_fit_matches_sequential_reference(spark, workdir):
    # doc i in shard i%PACK_SHARDS with i+100 tokens (some > budget —
    # truncated to one full bin each); lengths vary enough that greedy
    # packing is non-trivial.
    rows = [
        (i, " ".join(["w"] * (37 * (i % 9) + 5)), "en", "srcA", 1)
        for i in range(40)
    ]
    sf = _write(spark, workdir, rows)
    out = {r.shard: r for r in packing_next_fit_stats(spark, sf).collect()}
    assert set(out) == set(range(PACK_SHARDS))
    for shard, r in out.items():
        lens = [37 * (i % 9) + 5 for i in range(40) if i % PACK_SHARDS == shard]
        want_bins = _pack_ref(lens)
        assert r.n_bins == want_bins
        assert r.tokens_packed == sum(min(l, PACK_BUDGET) for l in lens)
        assert r.padding == want_bins * PACK_BUDGET - r.tokens_packed
        assert 0.0 < r.fill_rate <= 1.0


def test_exact_budget_doc_closes_bin(spark, workdir):
    # Three docs of exactly PACK_BUDGET tokens -> exactly three bins,
    # zero padding; a doc never splits across bins.
    rows = [
        (i * PACK_SHARDS, " ".join(["w"] * PACK_BUDGET), "en", "srcA", 1)
        for i in range(3)
    ]
    sf = _write(spark, workdir, rows)
    (r,) = packing_next_fit_stats(spark, sf).collect()
    assert (r.n_bins, r.padding, r.fill_rate) == (3, 0, 1.0)


def test_oversize_doc_truncates_to_one_bin(spark, workdir):
    rows = [(0, " ".join(["w"] * (3 * PACK_BUDGET)), "en", "srcA", 1)]
    sf = _write(spark, workdir, rows)
    (r,) = packing_next_fit_stats(spark, sf).collect()
    assert (r.n_bins, r.tokens_packed, r.padding) == (1, PACK_BUDGET, 0)
