"""Diff two BENCH_r{N}.json files and print the per-query regression
table (the round-over-round check VERDICT r2 asked to be routine).

    python tools/compare_bench.py BENCH_r02.json BENCH_r03.json [threshold]

Flags queries slower than ``threshold``x (default 1.3) the prior round.
Exit code 1 if any query regresses past the threshold — usable as a CI
gate once two same-methodology rounds exist.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    # driver-recorded BENCH_r{N}.json wraps the bench line under "parsed"
    old = old.get("parsed", old)
    new = new.get("parsed", new)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old.get("queries", {}), new.get("queries", {})
    bad = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in nq:
        if name not in oq or oq[name] <= 0:
            print(f"{name:40s} {'-':>8s} {nq[name]:8.3f}    new")
            continue
        ratio = nq[name] / oq[name]
        mark = "  <-- REGRESSION" if ratio > threshold else ""
        print(f"{name:40s} {oq[name]:8.3f} {nq[name]:8.3f} {ratio:6.2f}x{mark}")
        if ratio > threshold:
            bad.append(name)
    print(
        f"total: {old.get('value')} -> {new.get('value')} "
        f"({new.get('value', 0) / max(old.get('value', 1), 1e-9):.2f}x)"
    )
    # r12: surface each run's co-measured contention sentinel so a
    # "regression" whose sentinel also drifted reads as host noise, not
    # code — the diagnosis the r5/r10/r11 READMEs had to reconstruct.
    for label, rec in (("old", old), ("new", new)):
        s = rec.get("sentinel")
        if s:
            print(
                f"sentinel[{label}]: passes={s.get('passes')} "
                f"drift={s.get('drift')}"
                + (" <-- CONTENDED RUN" if s.get("drift", 1) > 1.3 else "")
            )
    if bad:
        print(f"{len(bad)} regression(s): {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
