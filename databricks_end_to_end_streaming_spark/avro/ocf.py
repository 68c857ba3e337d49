"""Avro Object Container Files (OCF) — the on-disk `.avro` format.

The wire paths (Confluent / Glue framing, `avro/functions.py`) cover
Kafka; OCF covers the other half of the Avro ecosystem: topic archives
and batch landings are `.avro` FILES (header with embedded writer
schema + sync-marker-delimited blocks — Apache Avro spec, "Object
Container Files", public documentation). Built on the same pure-Python
codec; on a cluster with spark-avro, ``spark.read.format("avro")``
replaces ``read_avro_files`` with no downstream change.

Scale shape of ``read_avro_files``: ONE small header read on the driver
(schema discovery — bounded, one file), then Spark's ``binaryFile``
source distributes whole files to executors and an Arrow-batched
``mapInPandas`` decodes blocks there. Parallelism is per-file, which is
the natural granularity for OCF (blocks within a file share one writer
schema and sync marker). Per-file schemas may differ; each file is
decoded with its OWN embedded writer schema resolved against the
driver-discovered reader schema's column set (missing fields -> NULL),
the same union-widening posture as the parquet tables.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from typing import Any, Iterator

from .codec import _build_decoder, _read_varint, _record_type, _write_varint, encode

MAGIC = b"Obj\x01"
_SUPPORTED_CODECS = ("null", "deflate")


def _read_block_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_varint(buf, pos)
    return buf[pos : pos + n], pos + n


def _write_block_bytes(b: bytes, out: bytearray) -> None:
    _write_varint(len(b), out)
    out += b


def write_ocf(
    path: str,
    records: list[dict],
    schema_json: str | dict,
    codec: str = "null",
    sync: bytes | None = None,
    records_per_block: int = 1000,
) -> None:
    """Write records as one OCF file. The sync marker defaults to a
    deterministic schema digest so identical inputs produce identical
    bytes (reproducible artifacts, same discipline as the md5 sampling).
    """
    if codec not in _SUPPORTED_CODECS:
        raise ValueError(f"codec must be one of {_SUPPORTED_CODECS}")
    schema_str = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    if sync is None:
        sync = hashlib.md5(schema_str.encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")

    out = bytearray()
    out += MAGIC
    meta = {"avro.schema": schema_str.encode(), "avro.codec": codec.encode()}
    _write_varint(len(meta), out)
    for k, v in sorted(meta.items()):
        _write_block_bytes(k.encode(), out)
        _write_block_bytes(v, out)
    _write_varint(0, out)  # end of metadata map
    out += sync

    for start in range(0, len(records), records_per_block):
        block = records[start : start + records_per_block]
        body = bytearray()
        for rec in block:
            body += encode(rec, schema_str)
        data = bytes(body)
        if codec == "deflate":  # raw DEFLATE (RFC 1951), per the spec
            data = zlib.compress(data, 9)[2:-4]
        _write_varint(len(block), out)
        _write_block_bytes(data, out)
        out += sync

    with open(path, "wb") as f:
        f.write(bytes(out))


def read_ocf(data: bytes) -> tuple[str, list[dict]]:
    """Parse one OCF byte string -> (writer schema JSON, records)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_varint(data, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: abs count + byte size (spec)
            n = -n
            _size, pos = _read_varint(data, pos)
        for _ in range(n):
            k, pos = _read_block_bytes(data, pos)
            v, pos = _read_block_bytes(data, pos)
            meta[k.decode()] = v
    schema_str = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _SUPPORTED_CODECS:
        raise ValueError(f"unsupported OCF codec {codec!r}")
    sync, pos = data[pos : pos + 16], pos + 16

    dec = _build_decoder(_record_type(schema_str))
    records: list[dict] = []
    while pos < len(data):
        count, pos = _read_varint(data, pos)
        body, pos = _read_block_bytes(data, pos)
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        bpos = 0
        for _ in range(count):
            val, bpos = dec(body, bpos)
            records.append(val)
        if bpos != len(body):
            raise ValueError("trailing bytes in OCF block")
    return schema_str, records


def read_avro_files(spark, path: str):
    """Distributed `.avro` directory read: driver peeks ONE header for
    the reader schema, executors decode whole files via mapInPandas."""
    import pandas as pd

    from .schema import parse_schema, record_to_struct

    first = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".avro")
    )
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as fh:
        head = fh.read()
    reader_schema_str = _header_schema(head)
    struct = record_to_struct(parse_schema(reader_schema_str))
    cols = [f.name for f in struct.fields]

    files_df = (
        spark.read.format("binaryFile")
        .load(path)
        .where("path LIKE '%.avro'")
        .select("content")
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for blob in pdf["content"]:
                _schema, recs = read_ocf(bytes(blob))
                rows += [{c: r.get(c) for c in cols} for r in recs]
            yield pd.DataFrame(rows, columns=cols)

    return files_df.mapInPandas(mapper, schema=struct)


def _header_schema(data: bytes) -> str:
    """Read just the metadata map of an OCF header."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    while True:
        n, pos = _read_varint(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _size, pos = _read_varint(data, pos)
        for _ in range(n):
            k, pos = _read_block_bytes(data, pos)
            v, pos = _read_block_bytes(data, pos)
            if k == b"avro.schema":
                return v.decode()
    raise ValueError("OCF header missing avro.schema")


def write_avro_files(df, path: str, schema_json: str | dict) -> None:
    """Distributed `.avro` directory EXPORT: each partition writes its
    own OCF file executor-side (foreachPartition — no driver collect, no
    shuffle), so exporting a 100 TB table parallelizes like any other
    write. File names are partition-indexed; re-running overwrites the
    same names (idempotent for a deterministic upstream plan). Fields
    not in the schema are dropped; missing nullable fields encode as
    None via the codec's union handling."""
    schema_str = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    field_names = [f["name"] for f in json.loads(schema_str)["fields"]]
    os.makedirs(path, exist_ok=True)

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = [{n: row[n] for n in field_names} for row in it]
        if recs:
            write_ocf(os.path.join(path, f"part-{pid:05d}.avro"), recs, schema_str)

    df.foreachPartition(write_partition)
