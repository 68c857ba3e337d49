"""Per-query profiling for the optimization rounds: steady-state
noop-sink wall (min over N trials), DataFrame build+analysis time, and
the number of Spark jobs one evaluation launches (driver actions inside
the query builder — pins, Observation rounds — show up here; a
one-job query is a single Catalyst plan).

    python tools/profile_queries.py [--sf DIR] [--trials N] name...
    python tools/profile_queries.py --top          # default heavy set

Output: one line per query  name  build_s  first_s  steady_s  jobs
(jobs counted on the LAST trial via a per-query job group).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries import all_queries

# the heaviest extras + headline, by BENCH_EXTRAS.json at r13 close-out
TOP = [
    "kcore_decomposition",
    "video_temporal_neardup",
    "containment_bottomk_sketch",
    "dedup_pipeline_lee2022",
    "kmv_join_size_profile",
    "sq8_recall_eval",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "mmr_diverse_topk",
    "sq8_cosine_topk",
    "copurchase_graph_triangles",
    "containment_dedup_removal",
    "cdc_chunk_dedup",
    "kmv_join_size_estimate",
    "neardup_safe_split",
    "jaccard_prefix_filter_join",
    "semdedup_embeddings",
    "classifier_auc_eval",
    "neardup_canonical_selection",
    "rfm_customer_scores",
    "margin_mining_knn",
    "quality_classifier_calibration",
    "rm3_expanded_search",
    "decontaminate_minhash_lsh",
    "ccnet_perplexity_buckets",
    "dedup_minhash_lsh",
    "tpch_q1_pricing_summary",
]


def profile(spark, qs, name: str, sf_dir: str, trials: int) -> dict:
    sc = spark.sparkContext
    best_total = float("inf")
    first = None
    build = None
    for t in range(trials):
        sc.setJobGroup(f"prof:{name}:{t}", name)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        if t == 0:
            first = t2 - t0
        if t2 - t0 < best_total:
            best_total = t2 - t0
            build = t1 - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(f"prof:{name}:{trials-1}"))
    sc.setJobGroup("prof:idle", "idle")
    return {
        "build_s": round(build, 3),
        "first_s": round(first, 3),
        "steady_s": round(best_total, 3),
        "jobs_last_trial": jobs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--top", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = list(args.names)
    if args.top or not names:
        names = TOP + [n for n in names if n not in TOP]

    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        from databricks_end_to_end_streaming_spark.session import _default_driver_mem

        ram_cap_g = int(_default_driver_mem().rstrip("g"))
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{min(8, ram_cap_g)}g"
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warm session once
    qs["tpch_q6_revenue_forecast"](spark, args.sf).collect()
    print(f"{'query':42s} {'build':>7s} {'first':>8s} {'steady':>8s} {'jobs':>5s}")
    for name in names:
        if name not in qs:
            print(f"{name:42s}  -- unknown query --")
            continue
        try:
            r = profile(spark, qs, name, args.sf, args.trials)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s}  ERROR {str(e)[:100]}")
            continue
        print(
            f"{name:42s} {r['build_s']:7.3f} {r['first_s']:8.3f} "
            f"{r['steady_s']:8.3f} {r['jobs_last_trial']:5d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
