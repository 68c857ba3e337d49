"""Avro Object Container Files: byte-level round-trip (both codecs,
multi-block), corruption detection, and the distributed directory read."""

from __future__ import annotations

import json

import pytest

from databricks_end_to_end_streaming_spark.avro.ocf import (
    read_avro_files,
    read_ocf,
    write_ocf,
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "kind", "type": "string"},
            {"name": "score", "type": ["null", "double"], "default": None},
        ],
    }
)

RECORDS = [
    {"id": i, "kind": f"k{i % 3}", "score": None if i % 5 == 0 else i / 4.0}
    for i in range(250)
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_multiblock(tmp_path, codec):
    p = str(tmp_path / f"a-{codec}.avro")
    write_ocf(p, RECORDS, SCHEMA, codec=codec, records_per_block=100)
    schema, back = read_ocf(open(p, "rb").read())
    assert json.loads(schema) == json.loads(SCHEMA)
    assert back == RECORDS


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "x1.avro"), str(tmp_path / "x2.avro")
    write_ocf(p1, RECORDS, SCHEMA)
    write_ocf(p2, RECORDS, SCHEMA)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "c.avro")
    write_ocf(p, RECORDS[:10], SCHEMA)
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(bytes(data))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="bad magic"):
        read_ocf(b"PAR1" + b"\x00" * 32)


def test_read_avro_files_distributed(spark, workdir):
    import os

    os.makedirs(f"{workdir}/avrodir")
    for part in range(3):
        write_ocf(
            f"{workdir}/avrodir/part-{part}.avro",
            RECORDS[part * 50 : (part + 1) * 50],
            SCHEMA,
            records_per_block=20,
        )
    df = read_avro_files(spark, f"{workdir}/avrodir")
    assert df.columns == ["id", "kind", "score"]
    got = sorted(
        (r["id"], r["kind"], r["score"]) for r in df.collect()
    )
    want = sorted(
        (r["id"], r["kind"], r["score"]) for r in RECORDS[:150]
    )
    assert got == want


def test_write_avro_files_roundtrip(spark, workdir):
    """Executor-side .avro export -> distributed read -> same rows."""
    from databricks_end_to_end_streaming_spark.avro.ocf import write_avro_files

    schema = json.dumps(
        {
            "type": "record",
            "name": "ev",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "kind", "type": "string"},
            ],
        }
    )
    df = spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(500)], "id long, kind string"
    ).repartition(4)
    write_avro_files(df, f"{workdir}/export", schema)

    import os

    files = [f for f in os.listdir(f"{workdir}/export") if f.endswith(".avro")]
    assert len(files) >= 2  # parallel, one file per non-empty partition

    back = read_avro_files(spark, f"{workdir}/export")
    got = sorted((r["id"], r["kind"]) for r in back.collect())
    assert got == sorted((i, f"k{i % 3}") for i in range(500))
