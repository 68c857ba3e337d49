"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized through the noop batch sink
(``df.write.format("noop")``): every output row and column is produced
and handed to the writer, so projection-only queries can't have their
computed columns pruned the way they would under ``df.count()`` — the
measured time includes scan, shuffles, AND per-row expression work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries import all_queries

# Headline set: the reference-parity chain + one of each heavy operator
# family (agg, join-heavy, window, dedup-LSH, knn).
BENCH_QUERIES = [
    "medallion_end_to_end",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "window_top3_orders_per_segment",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "text_quality_score",
    "sessionize_events",
    "asof_last_event_value",
    "session_window_events",
    "llm_clean_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warm the JVM/catalog once so q1 doesn't pay session startup.
    qs["tpch_q6_revenue_forecast"](spark, sf_dir).collect()

    # Steady-state timing: two runs per query, report the best — the
    # first run pays one-time plan compilation + codegen (~2-4 s for the
    # many-stage LSH pipelines), which amortizes to zero on real
    # workloads.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _trial in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
