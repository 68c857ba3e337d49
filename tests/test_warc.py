"""WARC/WET container source (sources/warc.py): framing round-trip
(gzip per-record members and plain), loud failure on corrupt archives,
deterministic synthesis, and the funnel-from-WARC wiring — the real
first mile produces the identical curation funnel to the in-memory
synthetic relation."""

from __future__ import annotations

import glob
import gzip
import os

import pyspark.sql.functions as F
import pytest

from databricks_end_to_end_streaming_spark.queries.web import (
    curation_funnel_over,
    docs_from_warc_responses,
    extract_text,
    synthesize_warc_corpus,
    with_html,
    with_url,
)
from databricks_end_to_end_streaming_spark.sources.warc import (
    WARCINFO_PAYLOAD,
    http_response_body,
    parse_warc,
    read_warc_files,
    warc_record_bytes,
    write_warc_segments,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _records_df(spark, n=10):
    rows = [
        (
            i % 3,
            i,
            "response" if i % 2 == 0 else "conversion",
            f"https://host{i % 3}.example.com/page/{i}",
            "application/http; msgtype=response"
            if i % 2 == 0
            else "text/plain",
            (
                f"HTTP/1.1 200 OK\r\nX-N: {i}\r\n\r\n<html>doc {i}</html>"
                if i % 2 == 0
                else f"extracted text of doc {i}"
            ).encode(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "seg int, doc_id long, warc_type string, target_uri string,"
        " content_type string, block binary",
    )


@pytest.mark.parametrize("compress", [True, False])
def test_round_trip(spark, workdir, compress):
    df = _records_df(spark)
    n_segs = write_warc_segments(df, f"{workdir}/w", compress=compress)
    assert n_segs == 3
    got = read_warc_files(spark, f"{workdir}/w").collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r["warc_type"], []).append(r)
    # one warcinfo per segment, fixed payload, spec content-type
    assert len(by_type["warcinfo"]) == 3
    for r in by_type["warcinfo"]:
        assert bytes(r["block"]) == WARCINFO_PAYLOAD.encode()
        assert r["content_type"] == "application/warc-fields"
        assert r["rec_idx"] == 0
    # every record round-trips bytes, uri, id, length exactly
    originals = {r["doc_id"]: r for r in df.collect()}
    seen = {}
    for r in by_type["response"] + by_type["conversion"]:
        doc = int(r["record_id"].split(":")[-1].rstrip(">"))
        seen[doc] = r
        o = originals[doc]
        assert bytes(r["block"]) == bytes(o["block"])
        assert r["target_uri"] == o["target_uri"]
        assert r["content_length"] == len(bytes(o["block"]))
        assert r["warc_date"] == "2024-01-01T00:00:00Z"
    assert sorted(seen) == list(range(10))


def test_http_body_split_and_gzip_members(spark, workdir):
    write_warc_segments(_records_df(spark), f"{workdir}/w")
    # per-record gzip members: each segment file holds MULTIPLE members
    f = sorted(glob.glob(f"{workdir}/w/*.warc.gz"))[0]
    raw = open(f, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 2
    got = (
        read_warc_files(spark, f"{workdir}/w")
        .where("warc_type = 'response'")
        .select("record_id", http_response_body().alias("body"))
        .collect()
    )
    for r in got:
        doc = int(r["record_id"].split(":")[-1].rstrip(">"))
        assert r["body"] == f"<html>doc {doc}</html>"


def test_parse_warc_is_loud_on_corruption():
    rec = warc_record_bytes(
        "resource", b"hello", "<urn:x:1>", "2024-01-01T00:00:00Z"
    )
    assert parse_warc(rec)[0]["block"] == b"hello"
    with pytest.raises(ValueError, match="truncated|trailing|missing"):
        parse_warc(rec[:-6])  # lost the trailing CRLFs + block tail
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gzip.compress(rec)[:-4])


def test_synthesis_is_deterministic(spark):
    p1 = synthesize_warc_corpus(spark, SF_DIR)
    first = {
        os.path.basename(f): open(f, "rb").read()
        for f in glob.glob(f"{p1}/*.warc.gz")
    }
    p2 = synthesize_warc_corpus(spark, SF_DIR)
    assert p1 == p2
    for f in glob.glob(f"{p2}/*.warc.gz"):
        assert open(f, "rb").read() == first[os.path.basename(f)]
    assert len(first) == 4


def test_funnel_from_warc_equals_in_memory_funnel(spark):
    """The wiring claim: curation over WARC-parsed documents == curation
    over the synthetic in-memory relation with the same extraction —
    the container round-trip is lossless for the whole funnel."""
    path = synthesize_warc_corpus(spark, SF_DIR)
    warc_docs = docs_from_warc_responses(read_warc_files(spark, path))
    mem = with_html(with_url(load_table(spark, SF_DIR, "documents")))
    mem_docs = mem.select(
        "doc_id",
        "url",
        "lang",
        extract_text(F.col("html")).alias("text"),
    ).withColumn(
        "domain",
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"^https://([^/:]+)", 1)),
            r"^www\.",
            "",
        ),
    ).withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), " +")).cast("long")
    )
    got = sorted(map(tuple, curation_funnel_over(warc_docs).collect()))
    want = sorted(map(tuple, curation_funnel_over(mem_docs).collect()))
    assert got == want
    # sanity: the WARC relation itself matches the in-memory one
    assert sorted(map(tuple, warc_docs.collect())) == sorted(
        map(tuple, mem_docs.select(*warc_docs.columns).collect())
    )


def test_streaming_first_mile_and_wet_export(spark, workdir):
    """The incremental first mile: stream the synthesized segments one
    file per trigger, and prove (a) the drained docs log equals the
    batch-read derivation, (b) the folded (domain, lang) accounting
    equals the batch rollup over the same docs, (c) a WET export of the
    cleaned text round-trips bit-for-bit."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        domain_accounting_rollup,
        domain_lang_partials,
    )
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.warc_stage import (
        warc_docs_from_log,
        warc_first_mile_stage,
        warc_ingest_batch,
    )
    from databricks_end_to_end_streaming_spark.streaming.web_stage import (
        domain_accounting_from_log,
    )
    from databricks_end_to_end_streaming_spark.sources.warc import (
        stream_warc_files,
        wet_conversion_rows,
    )

    path = synthesize_warc_corpus(spark, SF_DIR)
    d_t = ParquetTable(f"{workdir}/docs")
    p_t = ParquetTable(f"{workdir}/partials")
    source = stream_warc_files(spark, path, max_files_per_trigger=1)
    warc_first_mile_stage(source, d_t, p_t, f"{workdir}/ckpt")

    batch_docs = docs_from_warc_responses(read_warc_files(spark, path))
    got_docs = sorted(map(tuple, warc_docs_from_log(spark, d_t).collect()))
    want_docs = sorted(map(tuple, batch_docs.collect()))
    assert got_docs == want_docs and len(got_docs) == 500

    got_acc = sorted(
        map(tuple, domain_accounting_from_log(spark, p_t).collect())
    )
    want_acc = sorted(
        map(
            tuple,
            domain_accounting_rollup(
                domain_lang_partials(batch_docs)
            ).collect(),
        )
    )
    assert got_acc == want_acc
    # replay batch 1 VERBATIM — its contents come from the docs log's
    # own _batch_id (the file stream orders segments by mtime, which is
    # not guaranteed to follow segment numbering), so this replays
    # exactly what batch 1 actually processed; token'd appends no-op
    b1_ids = [
        r["doc_id"]
        for r in d_t.read(spark).where("_batch_id = 1").select("doc_id").collect()
    ]
    assert b1_ids  # four segments -> batch 1 exists and is non-empty
    recs = read_warc_files(spark, path).where(
        F.regexp_extract("target_uri", r"/(\d+)(\?|$)", 1)
        .cast("long")
        .isin(b1_ids)
    )
    warc_ingest_batch(recs, d_t, p_t, 1)
    assert sorted(
        map(tuple, domain_accounting_from_log(spark, p_t).collect())
    ) == got_acc

    # WET export of the parsed text (as .wet.gz — the profile's own
    # extension), read back through the same reader
    wet_dir = f"{workdir}/wet"
    write_warc_segments(
        wet_conversion_rows(batch_docs), wet_dir, extension=".wet.gz"
    )
    assert glob.glob(f"{wet_dir}/*.wet.gz")
    back = (
        read_warc_files(spark, wet_dir)
        .where("warc_type = 'conversion'")
        .select(
            F.regexp_extract("target_uri", r"/(\d+)(\?|$)", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("block").cast("string").alias("text"),
        )
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, batch_docs.select("doc_id", "text").collect())
    )
