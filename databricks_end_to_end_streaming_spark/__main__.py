"""Standalone pipeline runner: generate wire events -> ingest (schema
demux) -> bronze -> silver -> gold, printing each layer's row count and
the gold aggregate. The CLI form of the reference's 4-task job DAG
(jobs/confluent.json:18-79).

    python -m databricks_end_to_end_streaming_spark --workdir /tmp/demo \
        --events 500 --duplicate-ratio 0.1 [--framing glue] [--watermark "1 day"]
"""

from __future__ import annotations

import argparse

from . import get_spark
from .registry import InMemorySchemaRegistry
from .schemas import PRODUCT_V1_JSON, PRODUCT_V2_JSON
from .sources import events_to_wire, file_stream, generate_events, write_topic_files
from .sources.generator import GLUE_UUIDS
from .streaming import ParquetTable, ingest_avro_stream, run_pipeline
from .streaming.ingest import confluent_framing, glue_framing


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--events", type=int, default=500)
    ap.add_argument("--duplicate-ratio", type=float, default=0.1)
    ap.add_argument("--v1-ratio", type=float, default=0.3)
    ap.add_argument("--framing", choices=["confluent", "glue"], default="confluent")
    ap.add_argument("--watermark", default=None, help="bound silver dedup state")
    ap.add_argument(
        "--reader-schema-id",
        default=None,
        help="resolve every payload to this schema's shape with Avro "
        "defaults instead of union-widening with NULLs",
    )
    ap.add_argument(
        "--sessions",
        action="store_true",
        help="also run the session-window layer over silver",
    )
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = get_spark("medallion-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    events = generate_events(
        args.events,
        seed=args.seed,
        v1_ratio=args.v1_ratio,
        duplicate_ratio=args.duplicate_ratio,
    )
    recs = events_to_wire(events, framing=args.framing)
    write_topic_files(spark, recs, f"{args.workdir}/topic")
    print(f"produced {len(recs)} wire records ({args.framing} framing)")

    if args.framing == "confluent":
        registry = InMemorySchemaRegistry({1: PRODUCT_V1_JSON, 2: PRODUCT_V2_JSON})
        framing = confluent_framing()
    else:
        registry = InMemorySchemaRegistry(
            {GLUE_UUIDS[1].hex: PRODUCT_V1_JSON, GLUE_UUIDS[2].hex: PRODUCT_V2_JSON}
        )
        framing = glue_framing()

    reader_id = args.reader_schema_id
    if reader_id is not None and args.framing == "confluent":
        reader_id = int(reader_id)
    raw = ParquetTable(f"{args.workdir}/raw")
    ingest_avro_stream(
        file_stream(spark, f"{args.workdir}/topic"),
        registry,
        raw,
        checkpoint=f"{args.workdir}/cp/ingest",
        framing=framing,
        reader_schema_id=reader_id,
    )
    print(f"raw: {raw.read(spark).count()} rows")

    tables = run_pipeline(spark, args.workdir, raw, watermark=args.watermark)
    for name in ("bronze", "silver"):
        print(f"{name}: {tables[name].read(spark).count()} rows")
    print("gold:")
    tables["gold"].read(spark).orderBy("type", "color", "size").show(50, False)

    if args.sessions:
        from .streaming.medallion import session_window_stage

        sessions = ParquetTable(f"{args.workdir}/sessions")
        session_window_stage(
            spark, tables["silver"], sessions, f"{args.workdir}/cp/sessions"
        )
        print(f"sessions (closed): {sessions.read(spark).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
