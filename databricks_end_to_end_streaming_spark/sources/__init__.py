from .files import file_stream, write_topic_files
from .generator import generate_events, events_to_wire
from .kafka import kafka_stream
from .pyds import append_records, register_all

__all__ = [
    "file_stream",
    "write_topic_files",
    "generate_events",
    "events_to_wire",
    "kafka_stream",
    "register_all",
    "append_records",
]
