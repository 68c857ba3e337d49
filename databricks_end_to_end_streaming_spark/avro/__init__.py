"""Avro support without the spark-avro connector.

The reference decodes Kafka Avro payloads with Spark's `from_avro`
(ingest_raw.scala:144, ingest.scala:162). This environment has no
spark-avro jar, so the engine ships a pure-Python Avro *binary* codec
(avro binary encoding is a simple varint/length-prefix format, spec:
https://avro.apache.org/docs/current/specification/) plus an
Arrow-batched `from_avro_py` that decodes inside `mapInPandas` — rows
cross the JVM/Python boundary once per batch, not per row.

On a cluster with spark-avro available, `functions.from_avro_or_py`
transparently prefers the JVM implementation.
"""

from .codec import decode, encode
from .schema import avro_to_spark_type, parse_schema

__all__ = ["decode", "encode", "parse_schema", "avro_to_spark_type"]
