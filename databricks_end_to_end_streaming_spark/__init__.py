"""PySpark-native analytics engine with the query and data-processing
capabilities of rafaelvp-db/databricks-end-to-end-streaming (a Databricks
streaming medallion pipeline), rebuilt Spark-first on OSS PySpark.

Layout:
  session.py    SparkSession factory (AQE, RocksDB state store, UTC)
  tables.py     driver-testdata loaders + type normalization
  queries/      batch query corpus (driver-oracle-checked)
  avro/         pure-Python Avro binary codec + from_avro-equivalent
  functions/    binary/scalar helpers (header slicing, schema-id decode)
  sources/      Kafka/file/rate stream source builders
  streaming/    medallion pipeline + ingestion demux (foreachBatch)
  operators/    scale-path operators (dedup, similarity, multimodal)
"""

from .session import get_spark
from .tables import load_table, load_tables, register_views

__all__ = ["get_spark", "load_table", "load_tables", "register_views"]
