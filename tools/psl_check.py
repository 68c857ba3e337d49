"""PSL source-of-truth check: provenance + parse-coverage + spec vectors.

Prints the provenance record of the Public Suffix List snapshot in
effect (resolve_psl_path order: SPARK_GRAFT_PSL_PATH > OS-packaged
Mozilla list > vendored subset) and verifies the parse actually covers
every rule CLASS the algorithm must handle — exact multi-label,
wildcard, exception, IDN — then runs the published checkPublicSuffix
semantics (publicsuffix.org/list: the algorithm spec's own examples)
through the REAL Spark broadcast-join machinery, not a reimplementation.

Exit 0 = the snapshot is parseable, class-complete, and the match
machinery reproduces the spec vectors. Usage: python tools/psl_check.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark
from databricks_end_to_end_streaming_spark.operators.psl import (
    load_psl_rules,
    psl_registered_domains,
    psl_rules_df,
    psl_snapshot_provenance,
    puny_host,
)

# (host, expected registered domain or None) — the publicsuffix.org
# algorithm examples for each rule class the full Mozilla list carries.
# Hosts are pre-normalized (lowercase, no scheme/port); the IDN vector
# feeds a U-label host through puny_host first, exercising the same
# normalization the corpus path uses.
SPEC_VECTORS = [
    ("example.com", "example.com"),  # exact single-label suffix
    ("www.example.com", "example.com"),
    ("com", None),  # a public suffix itself has no eTLD+1
    ("b.example.co.uk", "example.co.uk"),  # exact multi-label suffix
    ("co.uk", None),
    ("www.ck", "www.ck"),  # exception rule !www.ck beats *.ck
    ("that.ck", None),  # wildcard *.ck: that.ck IS a public suffix
    ("this.that.ck", "this.that.ck"),  # eTLD+1 under a wildcard suffix
    ("a.this.that.ck", "this.that.ck"),
    ("食狮.com.cn", "食狮.com.cn"),  # IDN host under an exact suffix
]


def main() -> int:
    prov = psl_snapshot_provenance()
    print(json.dumps({"provenance": prov}, indent=2))
    problems = []
    if prov["source"] == "file":
        for cls in ("wildcard", "exception", "idn_punycoded"):
            if prov[cls] <= 0:
                problems.append(f"parse found no {cls} rules in {prov['path']}")
    else:
        print("note: no snapshot file; checking the vendored subset "
              "(wildcard/exception classes are vendored, IDN is not)")
        for cls in ("wildcard", "exception"):
            if prov[cls] <= 0:
                problems.append(f"vendored subset lost its {cls} rules")

    rules = load_psl_rules()
    vectors = [(puny_host(h), h, want) for h, want in SPEC_VECTORS]
    # the ck wildcard/exception pair and IDN live only in the full list
    have_ck = any(r in ("*.ck", "!www.ck") for r in rules)
    use = [v for v in vectors if have_ck or ".ck" not in v[0]]
    if not have_ck:
        print("note: *.ck/!www.ck not in rule set; ck vectors skipped")

    spark = get_spark("psl-check")
    doms = spark.createDataFrame(
        [(h,) for h, _, _ in use], "domain string"
    ).distinct()
    got = {
        r["domain"]: r["reg_domain_psl"]
        for r in psl_registered_domains(doms, psl_rules_df(spark, rules)).collect()
    }
    for norm, orig, want in use:
        want_norm = puny_host(want) if want is not None else None
        if got.get(norm) != want_norm:
            problems.append(
                f"spec vector {orig!r}: want {want_norm!r}, got {got.get(norm)!r}"
            )
        else:
            print(f"ok    {orig} -> {got.get(norm)}")
    spark.stop()
    if problems:
        print("\nFAILED:\n  " + "\n  ".join(problems))
        return 1
    print("\npsl check green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
