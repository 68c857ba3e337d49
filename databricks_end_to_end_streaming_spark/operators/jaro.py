"""Jaro-Winkler similarity as a pure Spark SQL expression.

The textbook algorithm (Jaro 1989; Winkler 1990 — public literature):
greedy left-to-right character matching within the window
w = floor(max(|s|,|t|)/2) - 1 (each target char consumed at most once),
transpositions = half the positional mismatches between the matched
character sequences read in s-order vs t-order, and the Winkler prefix
boost (p = 0.1, prefix capped at 4) applied only when jaro > 0.7 — the
classic boost-threshold variant.

No UDF and no driver loop: the greedy matcher is ONE F.aggregate left
fold over the source positions. Two performance lessons are baked into
the shape (both measured — the first cut ground a 150k-pair relation
for 20+ minutes single-threaded):

* the consumed-target state is a BIGINT bitmask, not an array<boolean>
  rebuilt per step (strings are capped at JW_MAX_LEN = 63 chars —
  beyond that the expression returns NULL and the caller routes long
  strings elsewhere; ER name fields sit far below the cap);
* the character arrays MUST be attribute reads, never inline
  transform() expressions — an expression referenced inside the fold's
  lambdas re-evaluates per reference (the CollapseProject hazard
  documented on the minhash operator), turning O(|s|*w) work into
  O(|s|*w*|t|) array constructions per row. ``with_char_arrays``
  materializes them as columns; the single-expression convenience form
  packs them into a struct and scores inside a singleton transform()
  so every reference is a GetStructField.

HOF lambdas evaluate interpreted (they are not whole-stage-codegen'd),
so callers should also repartition blocked candidate relations before
scoring — AQE happily coalesces a small-byte-size pair relation into
one partition and serializes the entire interpreted workload.

Cross-engine note: DuckDB's native jaro_winkler_similarity implements a
different (maximum-matching) variant and disagrees with the textbook
greedy on ~20% of random pairs, so the oracle for the registered query
replays THIS algorithm step-by-step as a recursive CTE instead of
calling the native function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

JW_MAX_LEN = 63  # bitmask capacity; longer strings score NULL


def with_char_arrays(
    df: DataFrame,
    s_col: str,
    t_col: str,
    sa: str = "_sa",
    ta: str = "_ta",
) -> DataFrame:
    """Materialize 1-based char arrays as real columns (see module
    docstring)."""
    return df.withColumn(sa, _chars(F.col(s_col))).withColumn(
        ta, _chars(F.col(t_col))
    )


def _chars(col: F.Column) -> F.Column:
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col), F.lit(1))),
        lambda i: F.substring(col, i, 1).cast("string"),
    )


def jaro_winkler_from_chars(
    s_col: str, t_col: str, sa: str = "_sa", ta: str = "_ta"
) -> F.Column:
    """Jaro-Winkler over a relation prepared by ``with_char_arrays``.
    Returns NULL when either string exceeds JW_MAX_LEN.

    NOTE: this single expression references the greedy-fold subtree
    many times; Catalyst's CollapseProject duplicates it per reference
    (megabyte expression trees, ~23 ms/row interpreted — measured).
    For relations of any size use ``jw_match_state`` + an Exchange
    barrier + ``jw_score_from_state`` instead (see
    jaro_winkler_part_pairs), which evaluates the fold once per row.
    """
    return _jw_core(F.col(s_col), F.col(t_col), F.col(sa), F.col(ta))


def jw_match_state(
    s_col: str, t_col: str, sa: str = "_sa", ta: str = "_ta"
) -> F.Column:
    """The greedy-matcher fold state (mask, matched index lists) as ONE
    struct column. Materialize it, put an Exchange (repartition) behind
    it so CollapseProject cannot inline it into every downstream
    reference, then finish with ``jw_score_from_state``."""
    return _jw_fold(F.col(s_col), F.col(t_col), F.col(sa), F.col(ta))


def jw_score_from_state(
    state_col: str,
    s_col: str,
    t_col: str,
    sa: str = "_sa",
    ta: str = "_ta",
) -> F.Column:
    """Finish Jaro-Winkler from a materialized ``jw_match_state``
    column: every reference to the fold is now an attribute read, and
    the remaining arithmetic is cheap scalar work over <= |s| arrays."""
    return _jw_finish(
        F.col(state_col),
        F.col(s_col),
        F.col(t_col),
        F.col(sa),
        F.col(ta),
    )


def jaro_winkler_col(s: F.Column, t: F.Column) -> F.Column:
    """Single-expression convenience form (tests / ad-hoc): packs the
    char arrays into a struct and scores inside a singleton transform()
    so array references stay attribute-cheap. For relations prefer
    with_char_arrays + jaro_winkler_from_chars."""
    packed = F.struct(
        s.alias("s"), t.alias("t"), _chars(s).alias("sa"), _chars(t).alias("ta")
    )
    return F.element_at(
        F.transform(
            F.array(packed),
            lambda p: _jw_core(p["s"], p["t"], p["sa"], p["ta"]),
        ),
        1,
    )


def _jw_core(
    s: F.Column, t: F.Column, sac: F.Column, tac: F.Column
) -> F.Column:
    return _jw_finish(_jw_fold(s, t, sac, tac), s, t, sac, tac)


def _jw_fold(
    s: F.Column, t: F.Column, sac: F.Column, tac: F.Column
) -> F.Column:
    ls, lt = F.length(s), F.length(t)
    w = F.greatest(
        (F.floor(F.greatest(ls, lt) / F.lit(2.0)) - 1).cast("int"), F.lit(0)
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("mask"),
        F.array().cast("array<int>").alias("mi"),
        F.array().cast("array<int>").alias("mj"),
    )
    # literal 2^(j-1) lookup (constant-folded): shiftleft/shiftright
    # take Python-int amounts, so bit ops go through bitwiseAND/OR with
    # an exact long power instead
    pow2 = F.array(*[F.lit(1 << k).cast("long") for k in range(JW_MAX_LEN)])

    def step(acc, i):
        lo = F.greatest(i - w, F.lit(1))
        hi = F.least(i + w, lt)
        cand = F.filter(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda j: (acc["mask"].bitwiseAND(F.element_at(pow2, j)) == 0)
            & (F.element_at(tac, j) == F.element_at(sac, i)),
        )
        j = F.try_element_at(cand, F.lit(1))
        return F.when(j.isNull(), acc).otherwise(
            F.struct(
                acc["mask"]
                .bitwiseOR(F.element_at(pow2, j))
                .alias("mask"),
                F.concat(acc["mi"], F.array(i)).alias("mi"),
                F.concat(acc["mj"], F.array(j)).alias("mj"),
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(ls, F.lit(1))), zero, step
    )


def _jw_finish(
    st: F.Column, s: F.Column, t: F.Column, sac: F.Column, tac: F.Column
) -> F.Column:
    ls, lt = F.length(s), F.length(t)
    mi, mj = st["mi"], st["mj"]
    m = F.size(mi)
    s_ord = F.transform(mi, lambda i: F.element_at(sac, i))
    t_ord = F.transform(F.array_sort(mj), lambda j: F.element_at(tac, j))
    t2 = F.size(
        F.filter(F.zip_with(s_ord, t_ord, lambda a, b: a != b), lambda x: x)
    )
    md = m.cast("double")
    jaro = (md / ls + md / lt + (2 * md - t2) / (2 * md)) / F.lit(3.0)
    l = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(4), ls, lt)),
        F.lit(0),
        lambda acc, k: F.when(
            (acc == k - 1) & (F.element_at(sac, k) == F.element_at(tac, k)),
            k,
        ).otherwise(acc),
    )
    jw = F.when(
        jaro > 0.7, jaro + l.cast("double") * F.lit(0.1) * (F.lit(1.0) - jaro)
    ).otherwise(jaro)
    return (
        F.when(F.greatest(ls, lt) > JW_MAX_LEN, F.lit(None).cast("double"))
        .when((ls == 0) | (lt == 0), F.lit(0.0))
        .when(m == 0, F.lit(0.0))
        .otherwise(jw)
    )
