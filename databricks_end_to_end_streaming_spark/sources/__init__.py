from .files import file_stream, write_topic_files
from .generator import generate_events, events_to_wire
from .kafka import kafka_stream

__all__ = [
    "file_stream",
    "write_topic_files",
    "generate_events",
    "events_to_wire",
    "kafka_stream",
]
