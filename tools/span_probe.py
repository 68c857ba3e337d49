"""Phase-level instrumentation of the shared span-profile build (r14):
times the suffix rank loop (per-round, via the operator's own timings
hook), then the post-loop LCP + segment machinery, and reports Spark job
counts per phase. Run on an idle host:

    python tools/span_probe.py [--sf DIR] [--trials N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = "8g"
    spark = get_spark("span_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.operators.suffix import (
        doc_token_arrays,
        suffix_rank_tables,
        union_span_profile,
    )
    from databricks_end_to_end_streaming_spark.pin import pin
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        spread_small_scan,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    # warm
    load_table(spark, args.sf, "documents").count()

    for trial in range(args.trials):
        d = spread_small_scan(
            load_table(spark, args.sf, "documents"), "doc_id"
        )
        train = d.where(F.col("doc_id") % 97 != 0)
        bench = d.where(F.col("doc_id") % 97 == 0)

        # phase 1: rank loop alone (same union input as the shared
        # profile), with the operator's per-round timings hook
        from databricks_end_to_end_streaming_spark.operators.suffix import (
            BENCH_ID_FLAG,
        )

        t = train.select("doc_id", "text")
        b = bench.select(
            (F.col("doc_id") + F.lit(BENCH_ID_FLAG)).alias("doc_id"), "text"
        )
        sc.setJobGroup(f"span:{trial}:loop", "rank loop")
        t0 = time.perf_counter()
        arrays = pin(doc_token_arrays(t.unionByName(b)))
        timings: list = []
        tables, _n = suffix_rank_tables(arrays, timings=timings)
        t_loop = time.perf_counter() - t0
        jobs_loop = len(
            sc.statusTracker().getJobIdsForGroup(f"span:{trial}:loop")
        )
        for ph in timings:
            print(
                f"  round {ph[0]:5s} w={ph[1]:<4d} active={ph[2]:<8d} "
                f"maxclass={ph[3]:<6d} {ph[4]:.3f}s"
            )

        # phase 2: the full union profile from scratch (fresh lineage so
        # phase 1's pins aren't reused), materialized through noop
        sc.setJobGroup(f"span:{trial}:full", "full profile")
        t0 = time.perf_counter()
        prof = union_span_profile(train, bench)
        prof.write.format("noop").mode("overwrite").save()
        t_full = time.perf_counter() - t0
        jobs_full = len(
            sc.statusTracker().getJobIdsForGroup(f"span:{trial}:full")
        )
        print(
            f"trial {trial}: loop {t_loop:.3f}s/{jobs_loop}j  "
            f"full {t_full:.3f}s/{jobs_full}j  "
            f"post-loop ≈ {t_full - t_loop:.3f}s/{jobs_full - jobs_loop}j"
        )
    spark.stop()


if __name__ == "__main__":
    main()
