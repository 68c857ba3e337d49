"""Dictionary-scaling probe for jaro_winkler_part_pairs (VERDICT r10
task 1): the round-10 shape blocked on (brand, size) — a FIXED ~1,250
keys — so scoring candidates grew quadratically in the part-dictionary
size. The r11 shape scores once per DISTINCT NAME PAIR (token-blocked +
theorem-recall-free length-ratio filter) and joins back
output-sensitively, so this probe measures the two axes that matter:

1. DICTIONARY growth: grow the distinct-name dictionary ~10x the way a
   real catalog grows (a wider adjective x noun grid — both word axes
   grow ~sqrt(10)x) and count the scoring-candidate relation the query
   actually builds (jw_name_candidates — the exact code path). The old
   shape's candidate count at the same dictionaries is N_parts^2-driven
   and printed for contrast.
2. PART-COUNT growth: scale part ROWS 10x with the dictionary held
   fixed — scoring candidates must not move at all (the r10 trap was
   exactly this axis).

Usage: python tools/jw_dict_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.queries.fuzzy import (
    jw_name_candidates,
)

ADJ = ["small", "large", "red", "blue", "hot", "cold", "new", "old"]
NOUN = ["ring", "bolt", "gear", "plate", "rod", "gizmo", "widget", "anvil"]


def grid_names(n_adj: int, n_noun: int) -> list[str]:
    """Adjective x noun name grid, word axes extended deterministically
    past the base vocabulary (suffix numbering — same morphology as the
    testdata names)."""
    adjs = [ADJ[i] if i < len(ADJ) else f"{ADJ[i % len(ADJ)]}{i}" for i in range(n_adj)]
    nouns = [
        NOUN[i] if i < len(NOUN) else f"{NOUN[i % len(NOUN)]}{i}"
        for i in range(n_noun)
    ]
    return [f"{a} {n}" for a in adjs for n in nouns]


def probe(spark, names: list[str], n_parts: int):
    """Build a synthetic part dictionary table and count the scoring
    candidates the r11 query would fold over (and the pairs the r10
    (brand,size)-blocked shape would have scored, for contrast)."""
    rows = [
        (i, names[i % len(names)], f"Brand#{i % 25}", i % 50)
        for i in range(n_parts)
    ]
    p = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_size int"
    ).repartition(32)
    t0 = time.time()
    cand = jw_name_candidates(p.select("p_name").distinct()).count()
    dt = time.time() - t0
    # the r10 shape: every same-(brand,size) part pair was a scoring
    # candidate — computed arithmetically (counting it in Spark at the
    # large settings is the quadratic blow-up this probe exists to show)
    from collections import Counter

    blocks = Counter((r[2], r[3]) for r in rows)
    old_pairs = sum(c * (c - 1) // 2 for c in blocks.values())
    return cand, old_pairs, dt


def main() -> None:
    spark = get_spark("jw-dict-probe")
    base_names = grid_names(8, 8)  # 64 names — the testdata shape
    big_names = grid_names(25, 26)  # 650 names — ~10.2x dictionary
    d1, old1, t1 = probe(spark, base_names, 20_000)
    d10, old10, t10 = probe(spark, big_names, 20_000)
    dfix, oldfix, tfix = probe(spark, base_names, 200_000)
    nd1, nd10 = len(base_names), len(big_names)
    print("\n== jw dictionary-scaling probe ==")
    print(
        f"dict {nd1:>4} names, 20k parts : r11 candidates {d1:>8}"
        f" (r10 shape would score {old1:>12})  [{t1:.1f}s]"
    )
    print(
        f"dict {nd10:>4} names, 20k parts : r11 candidates {d10:>8}"
        f" (r10 shape would score {old10:>12})  [{t10:.1f}s]"
    )
    print(
        f"dict {nd1:>4} names, 200k parts: r11 candidates {dfix:>8}"
        f" (r10 shape would score {oldfix:>12})  [{tfix:.1f}s]"
    )
    import math

    growth = d10 / d1
    exp = math.log(growth) / math.log(nd10 / nd1)
    print(
        f"\ndictionary x{nd10 / nd1:.1f} -> candidates x{growth:.1f}"
        f" (growth exponent {exp:.2f}; quadratic would be 2.00)"
    )
    print(
        f"part rows x10 (dict fixed) -> candidates x{dfix / d1:.2f}"
        f" (r10 shape: x{oldfix / old1:.1f})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
