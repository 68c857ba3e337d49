"""Jaro-Winkler similarity as a pure Spark SQL expression.

The textbook algorithm (Jaro 1989; Winkler 1990 — public literature):
greedy left-to-right character matching within the window
w = floor(max(|s|,|t|)/2) - 1 (each target char consumed at most once),
transpositions = half the positional mismatches between the matched
character sequences read in s-order vs t-order, and the Winkler prefix
boost (p = 0.1, prefix capped at 4) applied only when jaro > 0.7 — the
classic boost-threshold variant.

Everything runs inside whole-stage codegen: the greedy matcher is ONE
F.aggregate left fold over the source positions whose accumulator
carries the target-side consumed mask (array<boolean>, |t| elements)
and the matched (i, j) pair list — no UDF, no driver loop. Per-pair
cost is O(|s| * window) array work, the same as any sequential
implementation; use it on BLOCKED candidate pairs (the fuzzy-join
discipline), never all-pairs.

Cross-engine note: DuckDB's native jaro_winkler_similarity implements a
different (maximum-matching) variant and disagrees with the textbook
greedy on ~20% of random pairs, so the oracle for the registered query
replays THIS algorithm step-by-step as a recursive CTE instead of
calling the native function.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _chars(col: F.Column, n: F.Column) -> F.Column:
    """1-based character array (split('') is version-fragile)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.substring(col, i, 1).cast("string"),
    )


def jaro_winkler_col(s: F.Column, t: F.Column) -> F.Column:
    """Jaro-Winkler similarity of two string columns (see module
    docstring for the exact variant)."""
    ls, lt = F.length(s), F.length(t)
    sa, ta = _chars(s, ls), _chars(t, lt)
    w = F.greatest(
        (F.floor(F.greatest(ls, lt) / F.lit(2.0)) - 1).cast("int"), F.lit(0)
    )

    zero = F.struct(
        F.transform(F.sequence(F.lit(1), F.greatest(lt, F.lit(1))),
                    lambda _: F.lit(False)).alias("mask"),
        F.array().cast("array<struct<i:int,j:int>>").alias("pairs"),
    )

    def step(acc, i):
        lo = F.greatest(i - w, F.lit(1))
        hi = F.least(i + w, lt)
        cand = F.filter(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda j: ~F.element_at(acc["mask"], j)
            & (F.element_at(ta, j) == F.element_at(sa, i)),
        )
        j = F.try_element_at(cand, F.lit(1))  # null when no candidate
        return F.when(j.isNull(), acc).otherwise(
            F.struct(
                F.transform(
                    acc["mask"],
                    lambda mval, idx0: F.when(idx0 + 1 == j, F.lit(True))
                    .otherwise(mval),
                ).alias("mask"),
                F.concat(
                    acc["pairs"],
                    F.array(F.struct(i.alias("i"), j.alias("j"))),
                ).alias("pairs"),
            )
        )

    st = F.aggregate(F.sequence(F.lit(1), F.greatest(ls, F.lit(1))), zero, step)
    pairs = st["pairs"]
    m = F.size(pairs)
    # matched chars in s-order vs t-order; mismatches = 2 * transpositions
    s_ord = F.transform(pairs, lambda p: F.element_at(sa, p["i"]))
    by_j = F.array_sort(
        F.transform(pairs, lambda p: F.struct(p["j"].alias("j")))
    )
    t_ord = F.transform(by_j, lambda q: F.element_at(ta, q["j"]))
    t2 = F.size(
        F.filter(F.zip_with(s_ord, t_ord, lambda a, b: a != b), lambda x: x)
    )
    md = m.cast("double")
    jaro = (
        md / ls + md / lt + (2 * md - t2) / (2 * md)
    ) / F.lit(3.0)
    # consecutive common prefix, capped at 4
    l = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(4), ls, lt)),
        F.lit(0),
        lambda acc, k: F.when(
            (acc == k - 1)
            & (F.element_at(sa, k) == F.element_at(ta, k)),
            k,
        ).otherwise(acc),
    )
    jw = F.when(
        jaro > 0.7, jaro + l.cast("double") * F.lit(0.1) * (F.lit(1.0) - jaro)
    ).otherwise(jaro)
    return (
        F.when((ls == 0) | (lt == 0), F.lit(0.0))
        .when(m == 0, F.lit(0.0))
        .otherwise(jw)
    )
