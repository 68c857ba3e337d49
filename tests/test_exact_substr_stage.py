"""Incremental corpus-internal ExactSubstr (streaming/exact_substr_stage):
the folded view equals the batch ``exact_substr_removal`` over the union
corpus BIT-FOR-BIT — including a span whose two copies arrive in
DIFFERENT micro-batches (the case any per-batch run is blind to, and
the retroactive cut of the first copy), replay idempotence, and batch
slicing insensitivity."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.operators.suffix import (
    exact_substr_removal,
)
from databricks_end_to_end_streaming_spark.streaming import ParquetTable
from databricks_end_to_end_streaming_spark.streaming.exact_substr_stage import (
    cleaned_from_log,
    exact_substr_batch,
    gram_occurrences,
)

DOCS_SCHEMA = "doc_id long, text string"
SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
SPAN_B = "one two three four five six seven eight"  # exactly 8 tokens


def _corpus(spark):
    texts = {
        # cross-batch pair: doc 0 lands in batch 0, doc 4 in batch 1
        0: f"intro {SPAN} tail words here now",
        4: f"{SPAN} opens this other document",
        # within-batch pair (both % 4 == 1 -> batch 1)
        1: f"left {SPAN_B} right",
        5: f"pad {SPAN_B} end",
        # within-DOC repeat (the corpus-internal case df-based scrubs miss)
        2: f"{SPAN_B} middle filler {SPAN_B}",
        # 7-token shared prefix: below min_len=8, must NOT be cut
        3: "alpha beta gamma delta epsilon zeta eta DIFFERENT close",
        # clean docs + a short doc + an empty doc
        6: "completely unique document nothing shared at all",
        7: "tiny",
        8: "",
        # triple: third copy arrives in batch 2 (doc 9 % 4 == 1? no:
        # 9 % 4 == 1 -> batch 1; use 10 -> batch 2)
        10: f"third copy {SPAN} arrives much later",
    }
    return spark.createDataFrame(list(texts.items()), DOCS_SCHEMA)


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in df.collect()
    )


def _tables(workdir, tag):
    return (
        ParquetTable(f"{workdir}/{tag}_docs"),
        ParquetTable(f"{workdir}/{tag}_grams"),
        ParquetTable(f"{workdir}/{tag}_cuts"),
    )


def _drive(docs, tables, splits):
    for bid, pred in enumerate(splits):
        exact_substr_batch(docs.where(pred), *tables, bid)


def test_cross_batch_span_cut_and_batch_parity(spark, workdir):
    docs = _corpus(spark)
    tables = _tables(workdir, "a")
    _drive(docs, tables, [F.col("doc_id") % 4 == i for i in range(4)])
    got = _rows(cleaned_from_log(spark, tables[0], tables[2]))
    want = _rows(exact_substr_removal(docs))
    assert got == want
    by_id = {d: (n, r, t) for d, n, r, t in got}
    # the cross-batch 10-token span is cut from BOTH carriers — doc 0
    # retroactively (it was clean when batch 0 ran), doc 4 on arrival
    assert by_id[0] == (15, 10, "intro tail words here now")
    assert by_id[4] == (14, 10, "opens this other document")
    assert by_id[10] == (15, 10, "third copy arrives much later")
    # within-batch and within-doc repeats cut; sub-threshold prefix kept
    assert by_id[1] == (10, 8, "left right")
    assert by_id[5] == (10, 8, "pad end")
    assert by_id[2] == (18, 16, "middle filler")
    assert by_id[3][1] == 0
    assert by_id[6][1] == 0 and by_id[7] == (1, 0, "tiny")
    assert by_id[8][0] == 0 and by_id[8][1] == 0


def test_replay_idempotent_and_slicing_insensitive(spark, workdir):
    docs = _corpus(spark)
    t1 = _tables(workdir, "b")
    splits = [F.col("doc_id") % 4 == i for i in range(4)]
    _drive(docs, t1, splits)
    # replay the middle batch verbatim: the token'd append must no-op
    exact_substr_batch(docs.where(splits[1]), *t1, 1)
    # a DIFFERENT slicing (2 batches, by halves) of the same corpus
    t2 = _tables(workdir, "c")
    _drive(docs, t2, [F.col("doc_id") < 4, F.col("doc_id") >= 4])
    want = _rows(exact_substr_removal(docs))
    assert _rows(cleaned_from_log(spark, t1[0], t1[2])) == want
    assert _rows(cleaned_from_log(spark, t2[0], t2[2])) == want


def test_log_growth_bounded_on_hot_span(spark, workdir):
    """A span re-arriving in EVERY batch must not re-emit the whole
    prior coverage each time: cut rows are anti-joined against the log,
    so per-(doc, off) coverage is logged exactly once."""
    docs = spark.createDataFrame(
        [(i, f"copy number {i} says {SPAN_B} always") for i in range(6)],
        DOCS_SCHEMA,
    )
    tables = _tables(workdir, "d")
    _drive(docs, tables, [F.col("doc_id") % 3 == i for i in range(3)])
    cuts = tables[2].read(spark).select("doc_id", "off")
    assert cuts.count() == cuts.distinct().count()
    assert _rows(cleaned_from_log(spark, tables[0], tables[2])) == _rows(
        exact_substr_removal(docs)
    )


def test_streaming_wrapper(spark, workdir):
    from databricks_end_to_end_streaming_spark.streaming.exact_substr_stage import (
        exact_substr_stage,
    )

    docs = _corpus(spark)
    src = f"{workdir}/src"
    # two parquet files + maxFilesPerTrigger=1 -> at least two triggers,
    # so the cross-batch span really crosses micro-batches
    docs.where("doc_id < 4").coalesce(1).write.parquet(src)
    docs.where("doc_id >= 4").coalesce(1).write.mode("append").parquet(src)
    source = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tables = _tables(workdir, "s")
    exact_substr_stage(source, *tables, f"{workdir}/ckpt")
    assert _rows(cleaned_from_log(spark, tables[0], tables[2])) == _rows(
        exact_substr_removal(docs)
    )


def test_gram_occurrences_guards_short_docs(spark):
    from databricks_end_to_end_streaming_spark.operators.suffix import (
        doc_token_arrays,
    )

    docs = spark.createDataFrame(
        [(1, "only seven tokens in this short doc"), (2, ""), (3, "a b c d e f g h")],
        DOCS_SCHEMA,
    )
    occ = gram_occurrences(doc_token_arrays(docs), 8).collect()
    assert [(r["doc_id"], r["off"]) for r in occ] == [(3, 0)]
