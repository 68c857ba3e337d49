"""Dictionary-size-independence probe for dictionary_term_scan (r12):
the operator's core claim is that the Aho-Corasick pass costs ONE
corpus scan regardless of |dictionary|, where the naive per-term
contains() shape multiplies the scan by the dictionary size. This
probe measures both shapes at sf0.1 as the dictionary grows 18 ->
500 -> 5000 terms (synthetic terms drawn deterministically from corpus
substrings, half present / half absent — the realistic blocklist mix),
timing the full report (scan + agg + dim join) through the noop sink.

Expected reading: the AC column stays ~flat (automaton build is
dictionary-sized but executor-local and tiny vs the scan); the naive
column grows ~linearly in |dictionary| and becomes unrunnable well
before production list sizes.

Usage: python tools/dictscan_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.operators.dictscan import (
    dictionary_term_report,
)
from databricks_end_to_end_streaming_spark.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line "
    "sort window spark order data column join small customer query big "
    "stream group vector filter the a"
).split()


def synth_terms(n: int) -> tuple[str, ...]:
    """Deterministic dictionary: alternating present two-word corpus
    phrases and absent tokens (suffix-numbered), like a real blocklist
    where most terms never fire."""
    out = []
    for i in range(n):
        if i % 2 == 0:
            a = VOCAB[i % len(VOCAB)]
            b = VOCAB[(i * 7 + 3) % len(VOCAB)]
            out.append(f"{a} {b}")
        else:
            out.append(f"absent{i:05d}")
    return tuple(dict.fromkeys(out))  # dedup, keep order


def naive_report(docs, terms):
    """The per-term contains() shape: one CASE column pair per term,
    summed — |dictionary| expression trees over the corpus scan."""
    aggs = []
    for i, t in enumerate(terms):
        hit = F.col("text").contains(F.lit(t)).cast("long")
        aggs.append(F.sum(hit).alias(f"d{i}"))
    return docs.agg(*aggs)


def main() -> None:
    spark = get_spark("dictscan_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)  # time the scan, not parquet
    print(f"dictscan probe at {SF_DIR} ({docs.count()} docs)")
    for n in (18, 500, 5000):
        terms = synth_terms(n)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            dictionary_term_report(docs, terms).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        line = f"  |dict|={len(terms):5d}  aho={best:7.3f}s"
        if n <= 500:  # the naive shape is already painful past this
            nbest = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                naive_report(docs, terms).write.format("noop").mode(
                    "overwrite"
                ).save()
                nbest = min(nbest, time.perf_counter() - t0)
            line += f"  naive-contains={nbest:7.3f}s"
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()
