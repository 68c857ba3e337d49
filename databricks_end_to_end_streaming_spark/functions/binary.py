"""Binary scalar helpers: wire-format header slicing and schema-id decode.

These are the Spark-native equivalents of the reference's byte-twiddling
(SURVEY §2.8 X1-X5, §2.9 U1), kept as *built-in expression* compositions —
no UDF — so they run inside whole-stage codegen:

* Confluent framing (ingest_raw.scala:70-74,99-100): value =
  [magic 0x00][4-byte big-endian schema id][avro payload].
* AWS Glue framing (ingest.scala:33-45,62-63): value =
  [header version 3][compression 0|5][16-byte schema-version UUID][payload].

The reference needed a Scala UDF (`binaryToInt`, ingest_raw.scala:70-74)
for the big-endian int; hex() -> conv(16,10) does it declaratively.
"""

from __future__ import annotations

import pyspark.sql.functions as F

GLUE_HEADER_SIZE = 18  # 1 version + 1 compression + 16 uuid (ingest.scala:33-40)
CONFLUENT_HEADER_SIZE = 5  # 1 magic + 4 schema id (ingest_raw.scala:99-100)


def be_int_from_bytes(col: F.Column | str) -> F.Column:
    """Big-endian unsigned int from a 4-byte binary column — the UDF-free
    replacement for the reference's ByteBuffer.wrap(b).getInt
    (ingest_raw.scala:70-74). Cast to long (not int): wire ids are
    unsigned 32-bit, and values >= 2^31 would overflow a 32-bit cast.

    Migration note: raw tables written before this change store
    valueSchemaId as int32; parquet mergeSchema cannot union int32 with
    int64, so re-ingesting into such a table needs a one-time rewrite
    (or an explicit read schema). Fresh tables are unaffected."""
    return F.conv(F.hex(F.col(col) if isinstance(col, str) else col), 16, 10).cast(
        "long"
    )


def confluent_schema_id(value_col: str = "value") -> F.Column:
    """Schema id from Confluent wire format (bytes 2..5, big-endian)."""
    return be_int_from_bytes(F.expr(f"substring({value_col}, 2, 4)"))


def confluent_payload(value_col: str = "value") -> F.Column:
    """Avro payload: everything after the 5-byte Confluent header
    (mirrors `substring(value, 6, length(value)-5)`, ingest_raw.scala:99)."""
    return F.expr(f"substring({value_col}, 6, length({value_col}) - 5)")


def glue_header(value_col: str = "value") -> F.Column:
    """The 18-byte Glue header (version+compression+schema UUID), used as
    the per-schema demux key (mirrors ingest.scala:62)."""
    return F.expr(f"substring({value_col}, 1, {GLUE_HEADER_SIZE})")


def glue_schema_uuid(value_col: str = "value") -> F.Column:
    """Hex string of the 16-byte schema-version UUID (bytes 3..18)."""
    return F.lower(F.hex(F.expr(f"substring({value_col}, 3, 16)")))


def glue_compression(value_col: str = "value") -> F.Column:
    """The Glue compression byte (byte 2): 0 = none, 5 = zlib. The
    reference slices it into the opaque header and never interprets it
    (ingest.scala:33-45), so a compression-enabled Glue producer breaks
    the reference pipeline; our demux inflates when it sees 5."""
    return be_int_from_bytes(F.expr(f"substring({value_col}, 2, 1)"))


GLUE_COMPRESSION_NONE = 0
GLUE_COMPRESSION_ZLIB = 5


def glue_payload(value_col: str = "value") -> F.Column:
    """Avro payload after the Glue header (mirrors
    `value.substr(lit(19), length(value) - 18)`, ingest.scala:63)."""
    return F.expr(
        f"substring({value_col}, {GLUE_HEADER_SIZE + 1},"
        f" length({value_col}) - {GLUE_HEADER_SIZE})"
    )
