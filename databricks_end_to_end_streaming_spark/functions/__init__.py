from .binary import be_int_from_bytes, glue_header, glue_payload, confluent_schema_id, confluent_payload

__all__ = [
    "be_int_from_bytes",
    "confluent_schema_id",
    "confluent_payload",
    "glue_header",
    "glue_payload",
]
