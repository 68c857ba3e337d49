"""Distributed suffix array over the token corpus — variable-length
repeated-substring detection (the Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" ExactSubstr machinery,
re-expressed Spark-first).

The fixed-width n-gram scrub (operators/spans.py) finds duplicated
W-token windows; a suffix array finds the MAXIMAL repeated span at
every position — "this 137-token run also appears elsewhere in the
corpus" — which is what substring-level dedup actually cuts on.

Construction is sort/join-bound and therefore Spark-shaped (the
sequential Kasai/DC3 algorithms are not) — the r8 shape is ESCALATING
WINDOW-SORT, a Manber-Myers variant where the extension key is the
suffix's own token window instead of a rank-table lookup:

1. doc_token_arrays: per-document token array, plus one UNIQUE per-doc
   sentinel token appended — suffixes never compare past their own
   document, and all suffixes become globally distinct.
2. initial rank at width W_INIT (16): ONE range shuffle of every
   position's W_INIT-token window STRING (NUL-joined — see _grams for
   why string order equals token-sequence order) gives sorted-position
   ranks; unique ranks are SETTLED forever, tied ranks stay ACTIVE.
3. round w -> 4w: only the ACTIVE suffixes re-sort, each by its own
   w-token window array fetched via a per-doc grouped slice
   (_windows_for) — refinement is LOCAL to the tied class (a class of
   size m owns rank interval [R, R+m-1]); a window reaching the
   suffix's end contains the unique sentinel, so ranks provably
   totalize by w >= max repeated-span length. No corpus-wide join
   anywhere in the loop: per-round shuffle work is
   (surviving duplicate mass) x w tokens.
4. LCP of rank-adjacent suffixes in two passes (_lcp_layout): a fused
   width-W_INIT compare for every pair off the gram string each rank
   row already carries (lead/lag windows on ONE frozen range-by-rank
   layout — no self-join), then width-w_final windows for the
   duplicate-mass-bound DEEP tail only.
5. A repeated span of length >= L starts at position p iff p's LCP
   with one of its suffix-array NEIGHBORS is >= L (the max LCP over
   all other suffixes is always attained at an adjacent rank — the
   classic suffix-array property), so per-position repeat lengths come
   from the neighbor relation alone, never from all pairs.

Scale shape: one corpus-wide range sort at W_INIT, then every round
touches only the surviving active rows (duplicate-mass-bound) with
payload w tokens each — key-bound shuffles, O(log_4 maxlen) rounds,
nothing quadratic anywhere. All iteration states are pinned
(iterative-algorithm lineage hygiene, same as connected_components /
PageRank).

Exactness is pytest-pinned against a sequential Python suffix array on
the same tokens (tests/test_suffix.py) AND, since r10, hash-oracled:
the registered consumers (sa_repeated_span_stats, exact_substr_cut,
decontaminate_exact_substr, dedup_pipeline_lee2022) all carry DuckDB
oracles built on the duplicated-L-window factorization — duplicated
8-window anchors + token-run extensions replay every fixed-threshold
and maximal-length output without building a suffix array, so the
distributed construction is re-validated against an independent method
every round.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..pin import pin

SENTINEL_PREFIX = "\x00"  # reserved: stripped from text by _norm below

# Initial direct-ranking width: rank distinct 16-gram strings instead
# of single tokens, skipping the k = 1, 2, 4, 8 doubling rounds
# entirely. 16 (vs the original 8) settles more ranks in the init sort,
# usually saves a whole escalation round on natural text, and shrinks
# the LCP deep tail to pairs with lcp >= 16 (r9 A/B at sf0.1: ~1 s).
W_INIT = 16

# A tied class above this many positions routes through the skew-safe
# re-rank (_reranked_skew) instead of the per-class window sort: a
# Window.partitionBy("rank") places the WHOLE class in one task, so a
# pathologically repetitive corpus (one document duplicated across most
# of the corpus) would serialize a corpus-sized class carrying w-token
# window arrays on a single executor. Below the threshold the one-task
# sort is cheaper than the skew path's extra exchanges.
SKEW_CLASS_THRESHOLD = 1 << 16


def _norm(col: str = "text") -> F.Column:
    # NUL is the sentinel/separator namespace: strip it from real text
    # first so a pathological token like "\x0042" can't collide with
    # doc 42's sentinel (which would let an LCP extend past a document
    # boundary), and so gram strings decode unambiguously.
    return F.lower(
        F.regexp_replace(F.regexp_replace(col, "\x00", ""), r"\s+", " ")
    )


def doc_token_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, toks): whitespace tokens of every document plus a unique
    per-doc sentinel as the final element. Empty tokens from leading/
    trailing/duplicated whitespace are filtered so the position space
    matches Python ``str.split()`` (the pytest reference). doc_id must
    be unique per row (it is the sentinel's uniqueness source;
    suffix_rank_tables bounds the doubling loop and raises rather than
    spinning if that precondition is violated)."""
    toks = docs.select(
        "doc_id",
        F.filter(F.split(_norm(text_col), " "), lambda x: x != "").alias("t"),
    )
    return toks.select(
        "doc_id",
        F.concat(
            F.col("t"),
            F.array(
                F.concat(F.lit(SENTINEL_PREFIX), F.col("doc_id").cast("string"))
            ),
        ).alias("toks"),
    )


def corpus_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, off, tok): exploded view of doc_token_arrays — every
    token position plus the per-doc sentinel at off == n_tokens."""
    return doc_token_arrays(docs, text_col).select(
        "doc_id", F.posexplode("toks").alias("off", "tok")
    )


def _grams(arrays: DataFrame, w: int) -> DataFrame:
    """(doc_id, off, gram): the width-``w`` token window starting at
    every position, as a NUL-joined string — MAP-ONLY from the pinned
    array relation, no shuffle.

    NUL sorts below every other character and is stripped from real
    tokens (_norm), so string order of these grams equals lexicographic
    token-SEQUENCE order, truncated end-of-document grams sort exactly
    like proper prefixes (shorter tuple first), and equality of gram
    strings is equality of token sequences (unique decoding — only
    sentinels contain NUL and a sentinel is always the final token)."""
    g = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: F.concat_ws(SENTINEL_PREFIX, F.slice("toks", i + 1, w)),
    )
    return arrays.select("doc_id", F.posexplode(g).alias("off", "gram"))


def _ranked_init(
    arrays: DataFrame, n_parts: int
) -> tuple[DataFrame, int, int, int]:
    """Initial suffix ranking at k = W_INIT in ONE range shuffle, no
    distinct + no join-back: range-partition every position's W_INIT-gram
    (equal grams co-locate by construction), then rank =
    min(global row number) over the gram class — the SORTED-POSITION
    rank (count of strictly-smaller suffixes + 1), which is what makes
    the escalation updates class-local. Returns
    ((doc_id, off, rank, tied, gram), n, n_active, max_class) — the
    gram string stays on the row so downstream passes never re-fetch
    their own window, and the active-row statistics ride the pin job's
    Observation (no separate aggregate action).

    r14 (guide §2.4/§1.2): ONE checkpoint instead of two. The ranking
    windows now run BEFORE the frozen pin (partitionBy(_pid) with _pid
    evaluated under the window's exchange — class-LOCAL row numbers and
    class minima need no global offsets), so the pin materializes the
    fully-windowed rows; the global rank is then a pure broadcast-join
    MAP over the checkpoint (rank = partition offset + class-local
    min), which every consumer re-derives for free instead of reading a
    second corpus-sized checkpoint. Freezing one job is as safe as
    before: the range exchange's sampled bounds are materialized inside
    the single checkpoint action, and everything downstream (offsets
    collect included) reads the frozen rows.

    (r9 note, still binding: an explicit-sampled-bounds variant —
    bucket id as a pure fold expression over boundary literals, no
    frozen pin — was built and MEASURED SLOWER at sf0.1: 7.8 s init vs
    2.6 s. The repartitionByRange shape stays.)"""
    from pyspark.sql import Observation

    # pin the gram relation so repartitionByRange's bound-sampling job
    # reads materialized rows instead of re-running the window
    # generation over every position
    g8 = pin(_grams(arrays, W_INIT))
    # no sortWithinPartitions: the ranking windows below sort by gram
    # anyway, so a pre-sort in the exchange would be paid twice
    parted = g8.repartitionByRange(n_parts, "gram")
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    w_rn = Window.partitionBy("_pid").orderBy("gram")
    # equal grams are CO-LOCATED by the range partitioning, so the gram
    # class is exactly the (_pid, gram) class — and [_pid] ⊆ [_pid, gram]
    # means both windows run off the ONE exchange on _pid (partitioning
    # by a subset satisfies clustering on the superset), instead of a
    # second full shuffle on the gram strings.
    w_g = Window.partitionBy("_pid", "gram")
    obs = Observation()
    local = pin(
        with_pid.withColumn("_lrn", F.row_number().over(w_rn))
        # class min is deterministic even though _lrn tie order within a
        # gram class is not: it equals the class's local start position
        .withColumn("_lmin", F.min("_lrn").over(w_g))
        .withColumn("_cnt", F.count("*").over(w_g))
        .observe(
            obs,
            # the r13 _active_stats aggregate, observed on the SAME job:
            # n_active = tied-row count, max_class = largest tied class
            F.coalesce(
                F.sum((F.col("_cnt") > 1).cast("long")), F.lit(0)
            ).alias("n_active"),
            F.coalesce(
                F.max(F.when(F.col("_cnt") > 1, F.col("_cnt"))),
                F.lit(0).cast("long"),
            ).alias("max_class"),
        ),
        require_frozen=True,
        site="suffix.range_partitioned_grams",
    )
    offsets_df, n = _partition_offsets(local)
    ranked = local.join(offsets_df, "_pid").select(
        "doc_id",
        "off",
        (F.col("_offset") + F.col("_lmin")).cast("long").alias("rank"),
        (F.col("_cnt") > 1).alias("tied"),
        # gram rides along: every rank row keeps its own W_INIT window
        # string, so the LCP pass needs NO window join
        "gram",
    )
    return ranked, n, int(obs.get["n_active"]), int(obs.get["max_class"])


def _active_stats(ranked: DataFrame) -> tuple[int, int]:
    """(n_active, max_class): surviving tied-row count and the largest
    tied class's size, in ONE aggregate job over the pinned relation
    (partial aggregation keeps a giant class from concentrating rows
    anywhere — only per-class counts shuffle)."""
    row = (
        ranked.where("tied")
        .groupBy("rank")
        .count()
        .agg(
            F.coalesce(F.sum("count"), F.lit(0)).alias("n"),
            F.coalesce(F.max("count"), F.lit(0)).alias("mx"),
        )
        .first()
    )
    return int(row["n"]), int(row["mx"])


def _partition_offsets(
    with_pid: DataFrame, weight: str | None = None
) -> tuple[DataFrame, int]:
    """Broadcast (_pid, _offset) relation + grand total for a (pinned,
    frozen-pid) partitioned relation: _offset = cumulative size of all
    lower partition ids, size = row count (``weight=None``) or the sum
    of ``weight``. The shared machinery of the init ranking and the
    skew-safe round re-rank."""
    agg = (F.count("*") if weight is None else F.sum(weight)).alias("s")
    sums = {
        r["_pid"]: r["s"]
        for r in with_pid.groupBy("_pid").agg(agg).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    df = F.broadcast(
        with_pid.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "_pid int, _offset long",
        )
    )
    return df, acc


def _reranked_skew(joined: DataFrame, n_parts: int) -> DataFrame:
    """Skew-safe round update: same result as the per-class window sort
    (new rank = class start + count of strictly-smaller windows in the
    class; tied = another position shares the window), with NO per-class
    task. Shape:

    1. collapse positions to DISTINCT (rank, win) rows with counts —
       identical windows (the pathological mass) compress under partial
       aggregation before the shuffle;
    2. ONE range partition over (rank, win) gives the global window
       order; per-partition prefix sums + collected partition offsets
       turn it into ``_pref`` = positions in strictly-smaller (rank, win)
       rows — the _ranked_init machinery, generalized to weighted rows
       (a giant class of DISTINCT windows splits across partitions by
       range instead of landing in one task);
    3. the class base (min ``_pref`` per rank) comes from a partial-agg
       groupBy, so new rank = rank + (_pref - base) without any
       class-sized window;
    4. positions re-join their window's new rank on (rank, win) — AQE
       skew-join splits the giant class's partition at runtime.
    """
    dw = joined.groupBy("rank", "win").agg(F.count("*").alias("cnt"))
    parted = dw.repartitionByRange(n_parts, "rank", "win")
    # frozen: repartitionByRange re-samples bounds per job
    with_pid = pin(
        parted.withColumn("_pid", F.spark_partition_id()),
        require_frozen=True,
        site="suffix.skew_round_pids",
    )
    offsets_df, _total = _partition_offsets(with_pid, weight="cnt")
    w_pid = (
        Window.partitionBy("_pid")
        .orderBy("rank", "win")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pinned: the prefix-sum window feeds both the class-base aggregate
    # and the final rank join — one materialization, not two window runs
    scored = pin(
        with_pid.join(offsets_df, "_pid").withColumn(
            "_pref",
            F.col("_offset") + F.sum("cnt").over(w_pid) - F.col("cnt"),
        )
    )
    base = scored.groupBy("rank").agg(F.min("_pref").alias("_base"))
    dwr = scored.join(base, "rank").select(
        "rank",
        "win",
        (F.col("rank") + F.col("_pref") - F.col("_base")).alias("_new_rank"),
        (F.col("cnt") > 1).alias("_tied"),
    )
    return joined.join(dwr, ["rank", "win"]).select(
        "doc_id",
        "off",
        F.col("_new_rank").alias("rank"),
        F.col("_tied").alias("tied"),
        "gram",
    )


def suffix_rank_tables(
    arrays: DataFrame,
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
    timings: list | None = None,
) -> tuple[dict[int, DataFrame], int]:
    """Suffix-array ranks over ``doc_token_arrays`` output by ESCALATING
    WINDOW-SORT (the r8 shape): {W_INIT: init, w_final: final} where the
    final relation's ranks are the suffix-array permutation. Returns
    (tables, n).

    Ranks are SORTED-POSITION ranks (count of strictly-smaller suffixes
    + 1, ties sharing the value), so a tied class of size m owns the
    rank interval [R, R+m-1] and refinement is LOCAL to the class. Each
    round quadruples the comparison width w and re-sorts ONLY the
    still-tied ACTIVE suffixes by their own w-token windows (arrays
    compare lexicographically element-wise, shorter-is-prefix first —
    exactly w-prefix order): new rank = R + RANK() over the class by
    window, tied = window equals a class neighbor's. No rank-table
    lookups, no corpus-wide joins — a round touches active rows only:
    the windows come from a per-doc grouped slice of the token arrays
    (``_windows_for``), so per-round shuffle work is
    (surviving duplicate mass) x w tokens. Termination: a window that
    reaches the suffix's end contains its unique sentinel, so equal
    windows imply both suffixes extend past w — every real tie breaks
    by w >= max repeated-span length, and ranks totalize.

    The width sequence (W_INIT, 4x per round) trades per-round payload
    against round count; the payload-mass product stays bounded by
    duplicate mass x w_final, the same bound the final LCP windows pay
    (adjacent_lcp pass 2).

    Classes larger than ``skew_threshold`` positions route through the
    skew-safe ``_reranked_skew`` update instead of the per-class window
    sort (class sizes only shrink round-over-round, so the gate is
    checked against each round's measured max class). ``timings``, if
    given, collects (phase, width, n_active, max_class, seconds) tuples
    per round — the measured basis for the README's per-round wall
    breakdown."""
    import time

    n_parts = arrays.sparkSession.sparkContext.defaultParallelism
    t0 = time.monotonic()
    init, n, n_active, max_class = _ranked_init(arrays, n_parts)
    if timings is not None:
        timings.append(
            ("init", W_INIT, n_active, max_class, time.monotonic() - t0)
        )
    cols = ["doc_id", "off", "rank", "gram"]
    tables: dict[int, DataFrame] = {W_INIT: init.select(*cols)}
    settled_pieces = [init.where(~F.col("tied")).select(*cols)]
    active = init.where("tied").select(*cols)
    w = W_INIT
    while n_active > 0:
        if w >= n:
            # the previous round's width already covered the longest
            # possible suffix (max length <= n), so surviving ties mean
            # two suffixes are literally identical — possible only when
            # the per-doc sentinel is not unique (duplicate doc_id rows;
            # _norm strips NUL so token collisions cannot happen). Fail
            # loudly instead of escalating forever.
            raise ValueError(
                "suffix ranks did not totalize: duplicate doc_id rows "
                "make suffixes indistinguishable — doc_id must be "
                "unique per document"
            )
        t0 = time.monotonic()
        w *= 4
        # r14 (guide §2.4): the round's window fetch used to go through
        # _windows_for (a distinct + per-doc regroup) and then JOIN BACK
        # to the active rows on (doc_id, off) — two more exchanges per
        # round. Active rows are already unique per (doc_id, off), so
        # grouping them per doc WITH their rank/gram payload and slicing
        # the doc's array inside the same explode delivers the joined
        # relation in ONE exchange (the per-doc regroup); payload bounds
        # are unchanged (one token array per active doc + w tokens per
        # active position, plus the W_INIT gram strings that already
        # rode the join).
        per_doc = active.groupBy("doc_id").agg(
            F.collect_list(F.struct("off", "rank", "gram")).alias("xs")
        )
        joined = (
            per_doc.join(arrays, "doc_id")
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        "xs",
                        lambda x: F.struct(
                            x["off"].alias("off"),
                            x["rank"].alias("rank"),
                            x["gram"].alias("gram"),
                            F.slice("toks", x["off"] + 1, F.lit(w)).alias(
                                "win"
                            ),
                        ),
                    )
                ).alias("x"),
            )
            .select("doc_id", "x.off", "x.rank", "x.gram", "x.win")
        )
        obs = None
        if max_class > skew_threshold:
            # pin: the joined relation feeds both the distinct-window
            # aggregate and the final rank join-back; its size is
            # duplicate-mass x w, the same bound the window path pays
            upd = pin(_reranked_skew(pin(joined), n_parts))
        else:
            from pyspark.sql import Observation

            wcl = Window.partitionBy("rank").orderBy("win")
            neighbor_tie = F.coalesce(
                F.col("win") == F.lag("win").over(wcl), F.lit(False)
            ) | F.coalesce(
                F.col("win") == F.lead("win").over(wcl), F.lit(False)
            )
            # the surviving-tie count rides the SAME job that
            # materializes the round's pin (the kcore r11 Observation
            # pattern, r12 here) — no separate count action over the
            # checkpointed blocks; coalesce because an empty round
            # observes NULL, which must read as converged
            obs = Observation()
            upd = pin(
                joined.select(
                    "doc_id",
                    "off",
                    (F.col("rank") + F.rank().over(wcl) - F.lit(1)).alias(
                        "new_rank"
                    ),
                    neighbor_tie.alias("tied"),
                    "gram",
                )
                .withColumnRenamed("new_rank", "rank")
                .observe(
                    obs,
                    F.coalesce(
                        F.sum(F.col("tied").cast("long")), F.lit(0)
                    ).alias("n_active"),
                )
            )
        settled_pieces.append(upd.where(~F.col("tied")).select(*cols))
        active = upd.where("tied").select(*cols)
        prev_max = max_class
        if prev_max > skew_threshold:
            n_active, max_class = _active_stats(upd)
        else:
            # class sizes only shrink round-over-round, so once below
            # the threshold the skew gate can never re-trigger —
            # max_class stays a valid (stale) upper bound and the tied
            # count was already observed during the pin job
            n_active = int(obs.get["n_active"])
        if timings is not None:
            timings.append(
                (
                    "skew" if prev_max > skew_threshold else "sort",
                    w,
                    n_active,
                    max_class,
                    time.monotonic() - t0,
                )
            )
    tables[w] = _union_all(settled_pieces) if w > W_INIT else tables[W_INIT]
    return tables, n


def _windows_for(needs: DataFrame, arrays: DataFrame, w: int) -> DataFrame:
    """(doc_id, off, win): the width-``w`` token window at exactly the
    requested (doc_id, off) positions — offsets grouped per document so
    each needed document's array is joined ONCE and sliced per offset.
    Payload: one token array per distinct needed doc + w tokens per
    needed position (both duplicate-mass-bounded for the suffix loop's
    active sets and the LCP deep pairs)."""
    per_doc = (
        needs.distinct()
        .groupBy("doc_id")
        .agg(F.collect_list("off").alias("offs"))
    )
    return (
        per_doc.join(arrays, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    "offs",
                    lambda o: F.struct(
                        o.alias("off"),
                        F.slice("toks", o + 1, F.lit(w)).alias("win"),
                    ),
                )
            ).alias("x"),
        )
        .select("doc_id", "x.off", "x.win")
    )


def _union_all(pieces: list[DataFrame]) -> DataFrame:
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _common_prefix_len(ga, gb) -> F.Column:
    """Length of the common prefix of two token-array columns (names or
    Columns) — one JVM higher-order fold (stop flag at the first
    mismatch); zip_with pads the shorter array with nulls and eqNullSafe
    treats them as a value, but a real mismatch (the sentinel, unique
    per doc) always stops the fold before padding can be reached."""
    eq = F.zip_with(ga, gb, lambda x, y: x.eqNullSafe(y))
    return F.coalesce(
        F.aggregate(
            eq,
            F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
            lambda acc, m: F.struct(
                F.when(acc.getField("stop") | ~m, acc.getField("n"))
                .otherwise(acc.getField("n") + 1)
                .alias("n"),
                (acc.getField("stop") | ~m).alias("stop"),
            ),
        ).getField("n"),
        F.lit(0),
    )


def _gram_cap(col) -> F.Column:
    """Real-token count of a split W_INIT gram: the NUL-joined string
    splits back into elements where real tokens are whole elements and
    a sentinel ("\\x00" + doc_id) becomes ["", doc_id] — the "" marks
    how many REAL tokens precede the sentinel (W_INIT when absent)."""
    pos = F.array_position(col, "")
    return F.when(pos == 0, F.lit(W_INIT)).otherwise(pos - 1)


def _lcp16(ga: F.Column, gb: F.Column) -> F.Column:
    """Shallow adjacent LCP off the rows' own W_INIT gram strings:
    least(elementwise match count, real-token count of either side) —
    a mismatch before either sentinel is the true lcp; equal sentinel
    positions cap the count; unequal ones mismatch on "" vs a
    (never-empty) real token."""
    return F.least(_common_prefix_len(ga, gb), _gram_cap(ga), _gram_cap(gb))


def _deep_lcp(deep: DataFrame, arrays: DataFrame, k_max: int) -> DataFrame:
    """(rank, lcp) for DEEP adjacent pairs (W_INIT prefixes fully match
    — exactly the positions inside long repeats): fetch width-k_max
    windows, where k_max = the loop's final width: no two suffixes
    share a k_max-window (that is the exit condition), so every
    adjacent lcp is <= k_max - 1 and one fold finishes it. The windows
    are built ONLY for the needed offsets by grouping them per document
    and slicing that document's array once per offset — the join
    payload is one token array per deep DOC plus k_max tokens per deep
    position, both bounded by the surviving duplicate mass, never by
    the corpus. The pair's a-side rank is unique per deep pair, so a
    LONG view keyed on it needs just ONE window join + ONE regroup to
    deliver both sides' windows."""
    long = deep.select(
        "rank",
        F.lit("a").alias("_side"),
        F.col("a_doc").alias("doc_id"),
        F.col("a_off").alias("off"),
    ).unionByName(
        deep.select(
            "rank",
            F.lit("b").alias("_side"),
            F.col("b_doc").alias("doc_id"),
            F.col("b_off").alias("off"),
        )
    )
    wins = _windows_for(long.select("doc_id", "off"), arrays, k_max)
    return (
        long.join(wins, ["doc_id", "off"])
        .groupBy("rank")
        .agg(
            F.first(
                F.when(F.col("_side") == "a", F.col("win")), ignorenulls=True
            ).alias("_ga"),
            F.first(
                F.when(F.col("_side") == "b", F.col("win")), ignorenulls=True
            ).alias("_gb"),
        )
        .select("rank", _common_prefix_len("_ga", "_gb").alias("lcp"))
    )


def _lcp_layout(
    tables: dict[int, DataFrame],
    arrays: DataFrame,
    with_bench_flag: bool = False,
) -> tuple[DataFrame, list]:
    """ONE frozen range-by-rank layout carrying each suffix's adjacent
    LCPs in suffix-array order — r14 (VERDICT r13 task 2, guide §2.4):
    the adjacent-LCP machinery used to be a rank SELF-JOIN (two
    corpus-sized rank exchanges + a pinned pair relation) whose lcp
    values were then joined BACK onto the rank rows twice more
    (lcp_prev/lcp_next) before the segmented-min machinery
    range-partitioned everything by rank yet again. But successor and
    predecessor in rank order are WITHIN-PARTITION neighbors of that
    range layout, so building the layout FIRST collapses all of it:

    1. ``narrow``: the ONE corpus-sized materialization — range
       exchange by rank, then a single (_pid, rank) window stage
       (shared by every window function) computing the shallow capped
       LCP to the in-partition successor (lead), the predecessor's via
       lag of that SAME column, the sentinel flag, the in-partition
       running benchmark count (bench mode), and the gram string kept
       ONLY on partition-edge rows — all checkpointed as narrow integer
       rows (guide §2.3: project the grams away before anything else
       reads them). Frozen: repartitionByRange samples bounds inside
       this single action; everything downstream reads the checkpoint.
    2. One small per-partition aggregate over the CHECKPOINT
       (min_by/max_by on the edge rows + counts) — boundary rows and
       segment offsets in one driver-collected O(#partitions) relation;
       the <= n_parts boundary pairs the windows could not see are
       patched in via broadcast (their shallow LCP is the same fold,
       computed distributedly on the tiny relation).
    3. DEEP pairs (shallow cap == W_INIT — the pairs inside long
       repeats) are a cheap filter on the checkpoint (the first cut of
       this layout recomputed the whole window pass to find them —
       measured 2x the post-loop cost); their true LCPs (``_deep_lcp``)
       re-enter as a duplicate-mass-bounded broadcast correction keyed
       by the pair's a-side rank, applied to both the successor column
       (at rank) and the predecessor column (at rank + 1).

    Returns (layout, per_pid): layout = (doc_id, off, rank, _pid,
    [_b, _cb,] _sent, _ndoc, _noff, _lp, _ln) with _lp/_ln the
    corrected LCPs to the rank predecessor/successor (NULL at the
    global extremes), _sent the sentinel-position flag (gram IS the
    sentinel — the only grams starting with NUL), _ndoc/_noff the
    successor's identity, and _cb (bench mode) the inclusive running
    benchmark count (offset-adjusted); per_pid = the collected
    per-partition stats rows, ascending by _pid. Nothing
    corpus-proportional touches the driver.

    (r9 note, superseded: a bucketed lead()-window pairing over a UNION
    was measured 2x slower than the rank self-join — that variant paid
    its own union + fresh exchange; this one rides the range layout the
    downstream machinery builds anyway, so the self-join's two rank
    exchanges and two join-backs are strictly removed.)"""
    k_max = max(tables)
    final = tables[k_max]
    spark = final.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    base = final.select("doc_id", "off", "rank", "gram")
    if with_bench_flag:
        base = base.withColumn(
            "_b", F.col("doc_id") >= F.lit(BENCH_ID_FLAG)
        )
    parted = (
        base.repartitionByRange(n_parts, "rank")
        .sortWithinPartitions("rank")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy("rank")
    is_first = F.lag("rank").over(w).isNull()
    is_last = F.lead("rank").over(w).isNull()
    ln_cap_in = F.when(
        ~is_last,
        _lcp16(
            F.split("gram", SENTINEL_PREFIX),
            F.split(F.lead("gram").over(w), SENTINEL_PREFIX),
        ),
    )  # NULL at partition-last rows (boundary-patched below)
    s1_cols = [
        "doc_id",
        "off",
        "rank",
        "_pid",
        F.col("gram").startswith(SENTINEL_PREFIX).alias("_sent"),
        # gram survives ONLY on the partition-edge rows the boundary
        # stitches need — everything downstream is integers
        F.when(is_first | is_last, F.col("gram")).alias("_egram"),
        ln_cap_in.alias("_ln_cap"),
        F.lead("doc_id").over(w).alias("_ndoc0"),
        F.lead("off").over(w).alias("_noff0"),
    ]
    if with_bench_flag:
        # in-partition inclusive running benchmark count (the
        # distributed searchsorted) rides the SAME exchange+sort; the
        # cross-partition offset is broadcast-patched after the pin
        w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        s1_cols.insert(4, F.col("_b"))
        s1_cols.append(
            F.sum(F.col("_b").cast("long")).over(w_cum).alias("_cb0")
        )
    s1 = parted.select(*s1_cols)
    # the predecessor's capped LCP is the lag of the successor column —
    # a second Window op over the SAME spec (no new exchange or sort);
    # NULL at partition-first rows (boundary-patched below)
    narrow = pin(
        s1.select("*", F.lag("_ln_cap").over(w).alias("_lp_cap")),
        require_frozen=True,
        site="suffix.lcp_layout",
    )
    # per-partition stats + boundary rows in ONE small aggregate job
    # over the checkpoint: row/bench counts for the segment offsets,
    # the edge rows for the boundary stitches
    aggs = [
        F.count("*").alias("cnt"),
        F.min_by(F.struct("rank", "_egram", "doc_id", "off"), "rank").alias(
            "f"
        ),
        F.max_by(F.struct("rank", "_egram", "doc_id", "off"), "rank").alias(
            "l"
        ),
    ]
    if with_bench_flag:
        aggs.append(F.sum(F.col("_b").cast("long")).alias("bcnt"))
    per_pid = sorted(
        narrow.groupBy("_pid").agg(*aggs).collect(), key=lambda x: x["_pid"]
    )
    # boundary relation: one row per consecutive non-empty partition
    # pair (the (last row of p, first row of q) pair the
    # within-partition lead/lag cannot see); its shallow LCP is
    # computed by the SAME fold expression, distributed (grams never
    # folded on the driver)
    from pyspark.sql import types as T

    ftypes = {x.name: x.dataType for x in narrow.schema}
    bschema = T.StructType(
        [
            T.StructField("a_pid", T.IntegerType()),
            T.StructField("b_pid", T.IntegerType()),
            T.StructField("a_gram", T.StringType()),
            T.StructField("b_gram", T.StringType()),
            T.StructField("b_doc", ftypes["doc_id"]),
            T.StructField("b_off", ftypes["off"]),
        ]
    )
    brows = [
        (
            a["_pid"],
            b["_pid"],
            a["l"]["_egram"],
            b["f"]["_egram"],
            b["f"]["doc_id"],
            b["f"]["off"],
        )
        for a, b in zip(per_pid, per_pid[1:])
    ]
    bl = spark.createDataFrame(brows, bschema).select(
        "a_pid",
        "b_pid",
        "b_doc",
        "b_off",
        _lcp16(
            F.split("a_gram", SENTINEL_PREFIX),
            F.split("b_gram", SENTINEL_PREFIX),
        ).alias("blcp"),
    )
    patch_cols = [
        narrow["doc_id"],
        "off",
        "rank",
        "_pid",
        "_sent",
        # partition-last rows take the boundary pair's LCP/successor;
        # the global last rank keeps NULL (no bl row for its _pid)
        F.coalesce("_ln_cap", "_blcp_n").alias("_ln_cap"),
        F.coalesce("_lp_cap", "_blcp_p").alias("_lp_cap"),
        F.coalesce("_ndoc0", "_bdoc").alias("_ndoc"),
        F.coalesce("_noff0", "_boff").alias("_noff"),
    ]
    if with_bench_flag:
        offsets, acc = {}, 0
        for row in per_pid:
            offsets[row["_pid"]] = acc
            acc += row["bcnt"]
        off_map = F.create_map(
            *[
                x
                for pid, off in offsets.items()
                for x in (F.lit(pid), F.lit(off))
            ]
        )
        patch_cols.insert(4, F.col("_b"))
        patch_cols.append(
            (F.coalesce(off_map[F.col("_pid")], F.lit(0)) + F.col("_cb0"))
            .alias("_cb")
        )
    patched = (
        narrow.join(
            F.broadcast(
                bl.select(
                    F.col("a_pid").alias("_pid"),
                    F.col("b_doc").alias("_bdoc"),
                    F.col("b_off").alias("_boff"),
                    F.col("blcp").alias("_blcp_n"),
                )
            ),
            "_pid",
            "left",
        )
        .join(
            F.broadcast(
                bl.select(
                    F.col("b_pid").alias("_pid"),
                    F.col("blcp").alias("_blcp_p"),
                )
            ),
            "_pid",
            "left",
        )
        .select(*patch_cols)
    )
    deep = patched.where(F.col("_ln_cap") >= W_INIT).select(
        "rank",
        F.col("doc_id").alias("a_doc"),
        F.col("off").alias("a_off"),
        F.col("_ndoc").alias("b_doc"),
        F.col("_noff").alias("b_off"),
    )
    # pinned: the duplicate-mass-bounded correction is broadcast-joined
    # twice (successor of rank r, predecessor of rank r + 1) — pin
    # keeps the k_max-window fetch to one evaluation, and it reads the
    # narrow CHECKPOINT, never the corpus-sized window pass
    corr = pin(_deep_lcp(deep, arrays, k_max))
    lay = (
        patched.join(
            F.broadcast(corr.select("rank", F.col("lcp").alias("_cn"))),
            "rank",
            "left",
        )
        .join(
            F.broadcast(
                corr.select(
                    (F.col("rank") + 1).alias("rank"),
                    F.col("lcp").alias("_cp"),
                )
            ),
            "rank",
            "left",
        )
        .select(
            "doc_id",
            "off",
            "rank",
            "_pid",
            *(["_b", "_cb"] if with_bench_flag else []),
            "_sent",
            "_ndoc",
            "_noff",
            F.when(F.col("_lp_cap") >= W_INIT, F.col("_cp"))
            .otherwise(F.col("_lp_cap"))
            .alias("_lp"),
            F.when(F.col("_ln_cap") >= W_INIT, F.col("_cn"))
            .otherwise(F.col("_ln_cap"))
            .alias("_ln"),
        )
    )
    return lay, per_pid


def adjacent_lcp(tables: dict[int, DataFrame], arrays: DataFrame) -> DataFrame:
    """(a_doc, a_off, b_doc, b_off, lcp, rank): LCP between every
    suffix and its successor in suffix-array order — the pair
    projection of ``_lcp_layout`` (one row per rank with a successor).
    Sentinels compare as whole tokens, so LCPs stop exactly at document
    boundaries."""
    lay, _per_pid = _lcp_layout(tables, arrays)
    return lay.where(F.col("_ln").isNotNull()).select(
        F.col("doc_id").alias("a_doc"),
        F.col("off").alias("a_off"),
        F.col("_ndoc").alias("b_doc"),
        F.col("_noff").alias("b_off"),
        F.col("_ln").alias("lcp"),
        "rank",
    )


def _position_repeats(
    arrays: DataFrame,
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
    timings: list | None = None,
) -> DataFrame:
    """(doc_id, off, max_repeat) over a pinned ``doc_token_arrays``
    relation — the shared core of ``position_repeat_lengths`` and
    ``exact_substr_removal`` (which also needs ``arrays`` for the token
    reconstruction).

    r14: each position appears EXACTLY ONCE in the rank layout and its
    max LCP against any other suffix is attained at an adjacent rank,
    so per-position max_repeat = greatest(_lp, _ln) row-wise — the old
    both-sides union + groupBy(doc_id, off) exchange is gone. Sentinel
    positions are the rows whose gram IS the sentinel (the only grams
    starting with NUL — _norm strips NUL from real text), so the old
    doc-length join exists purely to drop them and a prefix test
    replaces it."""
    tables, _n = suffix_rank_tables(
        arrays, skew_threshold=skew_threshold, timings=timings
    )
    lay, _per_pid = _lcp_layout(tables, arrays)
    return lay.where(~F.col("_sent")).select(
        "doc_id",
        "off",
        F.greatest(
            F.coalesce(F.col("_lp"), F.lit(0)),
            F.coalesce(F.col("_ln"), F.lit(0)),
        ).alias("max_repeat"),
    )


def position_repeat_lengths(
    docs: DataFrame,
    text_col: str = "text",
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
    timings: list | None = None,
) -> DataFrame:
    """(doc_id, off, max_repeat): for every REAL token position, the
    length of the longest span starting there that also occurs somewhere
    else in the corpus (same or another document). Sentinel positions are
    excluded; the sentinel guarantee means max_repeat never counts past
    a document's end."""
    arrays = pin(doc_token_arrays(docs, text_col))
    return _position_repeats(arrays, skew_threshold, timings)


# Reserved namespace for benchmark doc ids inside the union suffix
# array (bit 41 — disjoint from the re-ingestion namespace at bit 40).
BENCH_ID_FLAG = 1 << 41


def union_span_profile(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
) -> DataFrame:
    """(doc_id, is_bench, off, max_repeat, cross_repeat) for every REAL
    token position of train ∪ benchmark, from ONE union suffix array —
    the SHARED profile the whole suffix family consumes (r9 verdict
    Missing #4, the PPJoin tokenize-once move): ``max_repeat`` is the
    corpus-internal repeat length (what ``position_repeat_lengths``
    computes — identical values, because pairwise LCPs depend only on
    token content up to the never-matching sentinels, so the benchmark
    id re-namespacing cannot change any adjacent-LCP maximum), and
    ``cross_repeat`` is the longest span shared with the OTHER set
    (train rows only; NULL on bench rows). One SA build therefore
    serves repeat statistics, the ExactSubstr cut, AND substring
    decontamination.

    cross_repeat semantics (per TRAIN position): the length of the
    longest span starting there that ALSO OCCURS in the
    BENCHMARK set — variable-length, substring-level decontamination
    (the ExactSubstr test-set scrub of Lee et al. 2022 §6.1: a train
    example is contaminated when it shares a >= L-token verbatim span
    with an eval example; fixed-k shingle overlap — the sibling
    ``decontaminate_ngram_overlap`` — cannot report span LENGTHS or
    catch spans that straddle shingle boundaries at lower k).

    Method: build ONE suffix array over train ∪ benchmark (benchmark
    ids move to the reserved bit-41 namespace; per-doc sentinels keep
    LCPs inside documents). For a train suffix s, its max LCP against
    ANY benchmark suffix is attained at the NEAREST benchmark suffix
    above or below in suffix-array order, and equals the min of
    adjacent LCPs between them (the classic range-min property). The
    nearest-benchmark range-mins come from SEGMENTED running minima:
    segment id = count of benchmark suffixes at-or-before this rank,
    derived DISTRIBUTIVELY with the operators/ranking.py pattern
    (range-partition by rank, one benchmark-count long per partition to
    the driver, offsets broadcast back, in-partition running count) —
    nothing benchmark- or corpus-proportional is ever collected or
    closure-shipped, so the shape holds even when the "benchmark" is a
    corpus-scale fraction (e.g. the registered query's doc_id % 97
    slice). Then one running-min window per direction partitioned by
    segment. Work: the suffix array's usual bounds + two window passes
    over n rows; nothing quadratic. Caveat (documented, same
    acceptance as the per-doc coverage window): one SEGMENT sorts in
    one task — segments are benchmark-interval-sized, so a corpus whose
    benchmark suffixes are extremely sparse concentrates rows; split
    ranks arithmetically per segment if that ever binds."""
    # namespace guard (the phash composite-id discipline): a train id at
    # or above the benchmark flag — or a bench id outside [0, flag) —
    # would silently misclassify documents across sets; raise instead.
    # The raise_error lives INSIDE the id expression so Catalyst cannot
    # prune it.
    def _guarded(col: F.Column, what: str) -> F.Column:
        ok = (col >= 0) & (col < F.lit(BENCH_ID_FLAG))
        return F.when(ok, col).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"{what} doc_id outside [0, 2^41): "),
                    col.cast("string"),
                )
            ).cast("long")
        )

    t = train.select(
        _guarded(F.col("doc_id"), "train").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    b = bench.select(
        (_guarded(F.col("doc_id"), "bench") + F.lit(BENCH_ID_FLAG)).alias(
            "doc_id"
        ),
        F.col(text_col).alias("text"),
    )
    arrays = pin(doc_token_arrays(t.unionByName(b)))
    tables, _n = suffix_rank_tables(arrays, skew_threshold=skew_threshold)
    # Distributed searchsorted (the operators/ranking.py pattern) over
    # the SHARED rank layout (r14): the layout already carries each
    # row's adjacent LCPs (_lp/_ln) and its per-partition stats — the
    # old pair relation + two lcp join-backs + a separate frozen
    # re-partition for the segments are all gone; the running counts
    # and the lead/lag LCPs ride ONE (_pid, rank) window exchange. The
    # only data leaving the cluster is O(#partitions). An earlier
    # version collected the full benchmark rank list and shipped it in
    # every pandas-UDF closure — corpus-proportional when the benchmark
    # is a fixed corpus fraction, so it was replaced by this derivation.
    lay, per_pid = _lcp_layout(tables, arrays, with_bench_flag=True)
    n_bench = sum(row["bcnt"] for row in per_pid)
    max_rep = (
        F.greatest(
            F.coalesce(F.col("_lp"), F.lit(0)),
            F.coalesce(F.col("_ln"), F.lit(0)),
        )
        .cast("int")
        .alias("max_repeat")
    )
    if n_bench == 0:
        # no benchmark suffixes: every cross_repeat is 0 — fall through
        # to the SAME sentinel filtering as the normal path
        out = lay.select(
            "doc_id",
            "_b",
            "off",
            "_sent",
            max_rep,
            F.when(~F.col("_b"), F.lit(0)).cast("int").alias("cross_repeat"),
        )
    else:
        # inclusive running benchmark count == searchsorted semantics:
        # _su (side=right) counts bench ranks <= rank (a bench row
        # counts itself); _sd (n_bench - side=left) counts bench ranks
        # >= rank (a bench row counts itself, so add its flag back).
        # _cb (the offset-adjusted running count) already rides the
        # layout's one window stage — no extra exchange here.
        seg = lay.withColumn("_su", F.col("_cb")).withColumn(
            "_sd",
            F.lit(n_bench)
            - F.col("_cb")
            + F.when(F.col("_b"), F.lit(1)).otherwise(F.lit(0)),
        )
        w_up = (
            Window.partitionBy("_su")
            .orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_dn = (
            Window.partitionBy("_sd")
            .orderBy(F.col("rank").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # the benchmark anchor's own lcp_prev/lcp_next point OUTSIDE its
        # segment's wanted range — mask it so the running min starts at
        # the first adjacency with the benchmark suffix itself
        m_up = F.min(F.when(~F.col("_b"), F.col("_lp"))).over(w_up)
        m_dn = F.min(F.when(~F.col("_b"), F.col("_ln"))).over(w_dn)
        out = (
            seg.withColumn("_mu", F.when(F.col("_su") >= 1, m_up))
            .withColumn("_md", F.when(F.col("_sd") >= 1, m_dn))
            .select(
                "doc_id",
                "_b",
                "off",
                "_sent",
                max_rep,
                F.when(
                    ~F.col("_b"),
                    F.greatest(
                        F.coalesce(F.col("_mu"), F.lit(0)),
                        F.coalesce(F.col("_md"), F.lit(0)),
                    ),
                )
                .cast("int")
                .alias("cross_repeat"),
            )
        )
    # sentinel positions are not real tokens; they are exactly the rows
    # whose gram IS the sentinel (the only grams starting with NUL —
    # _norm strips NUL from real text), so the layout's flag replaces
    # the old corpus-sized doc-length join
    return out.where(~F.col("_sent")).select(
        F.when(F.col("_b"), F.col("doc_id") - F.lit(BENCH_ID_FLAG))
        .otherwise(F.col("doc_id"))
        .alias("doc_id"),
        F.col("_b").alias("is_bench"),
        "off",
        "max_repeat",
        "cross_repeat",
    )


def cross_set_max_spans(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
) -> DataFrame:
    """(doc_id, off, cross_repeat) for every TRAIN token position — the
    decontamination projection of ``union_span_profile`` (see there for
    the method and scale argument)."""
    return (
        union_span_profile(train, bench, text_col, skew_threshold)
        .where(~F.col("is_bench"))
        .select("doc_id", "off", "cross_repeat")
    )


def exact_substr_removal(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 8,
    skew_threshold: int = SKEW_CLASS_THRESHOLD,
    timings: list | None = None,
) -> DataFrame:
    """ExactSubstr CUT, end-to-end (Lee et al. 2022 §4.1, the operation
    their released dedup tool performs): remove from every document each
    token that sits inside ANY repeated span of >= ``min_len`` tokens —
    variable-length maximal repeats from the distributed suffix array,
    not fixed-W windows (operators/spans.py is the fixed-W cousin).
    Returns (doc_id, n_tokens, n_removed, cleaned_text), one row per
    document, in the suffix machinery's normalized token space
    (lowercased, whitespace-collapsed — the space the repeat profile is
    defined over).

    Coverage semantics: position p is removed iff some q <= p has
    max_repeat(q) >= min_len and q + max_repeat(q) > p. Because
    max_repeat(q) is the MAXIMAL repeat starting at q, this is exactly
    "p lies inside some repeated span of length >= min_len" (any
    sub-span of a repeated span is repeated, so maximality loses
    nothing). All copies of a duplicated span are cut — the released
    ExactSubstr policy.

    Scale shape: coverage is ONE running-max window per document over
    the repeat profile (a doc's positions sort within one task — bounded
    by the longest document, not the corpus); covered positions collapse
    to MERGED intervals (lag + running interval count), so the per-doc
    span list the reconstruction probes is #gaps-sized, never
    position-sized; the token filter is a per-row higher-order function
    — map-only, whole-stage codegen, no UDF. Everything upstream
    inherits the suffix loop's duplicate-mass bounds."""
    arrays = pin(doc_token_arrays(docs, text_col))
    rep = _position_repeats(arrays, skew_threshold, timings)
    spans = rep.where(F.col("max_repeat") >= min_len).select(
        "doc_id",
        "off",
        (F.col("off") + F.col("max_repeat")).alias("span_end"),
    )
    return apply_cut_spans(arrays, spans)


def window_expr(off: F.Column | str, w: int) -> F.Column:
    """NUL-joined width-``w`` token window starting at 0-based ``off``
    of the ``toks`` array — the _grams encoding (injective: _norm strips
    NUL from real text), full width only (callers bound ``off`` so the
    window never reaches the sentinel)."""
    o = F.col(off) if isinstance(off, str) else off
    return F.concat_ws(SENTINEL_PREFIX, F.slice("toks", o + 1, w))


def gram_occurrences(arrays: DataFrame, min_len: int) -> DataFrame:
    """(doc_id, off, gram, h): every full-width ``min_len``-token window
    of every document. Docs shorter than ``min_len`` real tokens emit
    nothing (the sequence() guard — ``sequence(0, -1)`` would DESCEND).
    Map-only from the pinned array relation. Shared by the incremental
    stage (streaming/exact_substr_stage.py) and the gram-based batch
    cut below."""
    offs = F.expr(
        f"if(size(toks) - 1 >= {min_len},"
        f" sequence(0, size(toks) - 1 - {min_len}), array())"
    )
    return (
        arrays.select("doc_id", "toks", F.explode(offs).alias("off"))
        .withColumn("gram", window_expr("off", min_len))
        .select("doc_id", "off", "gram", F.xxhash64("gram").alias("h"))
    )


def exact_substr_removal_grams(
    docs: DataFrame, text_col: str = "text", min_len: int = 8
) -> DataFrame:
    """The SAME cut as ``exact_substr_removal`` via the duplicated-
    L-window factorization (equivalence proof in
    streaming/exact_substr_stage.py's module docstring: a position is
    inside a repeated span of length >= L iff it is covered by some
    width-EXACTLY-L window occurring at >= 2 distinct (doc, off) sites)
    — ONE gram-keyed aggregation + one join instead of suffix-array
    construction. This is the right Spark plan when only the CUT at a
    fixed threshold is needed (the Lee-2022 pipeline's stage 2); the
    suffix array remains the tool for variable-length span PROFILING
    (``sa_repeated_span_stats``' length statistics, the cross-set
    decontamination lengths), which fixed-width windows cannot report.
    Exactness is string-level (grouping on the gram itself, never the
    hash); pytest-pinned equal to the SA path on planted and randomized
    corpora."""
    arrays = pin(doc_token_arrays(docs, text_col))
    occ = gram_occurrences(arrays, min_len).drop("h")
    dup = (
        occ.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select("gram")
    )
    spans = occ.join(dup, "gram").select(
        "doc_id", "off", (F.col("off") + F.lit(min_len)).alias("span_end")
    )
    return apply_cut_spans(arrays, spans)


def apply_cut_spans(arrays: DataFrame, spans: DataFrame) -> DataFrame:
    """Reconstruction shared by ``exact_substr_removal`` and the
    incremental stage (streaming/exact_substr_stage.py): given the
    pinned token-array relation and a set of cut spans
    (doc_id, off, span_end) — [off, span_end) duplicated, at most one
    row per (doc_id, off) — drop every covered token position and
    rebuild (doc_id, n_tokens, n_removed, cleaned_text). Identical code
    path for both callers is what makes the streaming twin's
    drained == batch assertion bit-for-bit.

    Scale shape (unchanged from the original inline version): coverage
    is ONE running-max window per document (a doc's positions sort
    within one task); covered positions collapse to MERGED intervals,
    so the per-doc span list the reconstruction probes is #gaps-sized;
    the token filter is a per-row higher-order function."""
    toks_all = arrays.select(
        "doc_id", F.expr("slice(toks, 1, size(toks) - 1)").alias("ws")
    )
    pos = toks_all.select(
        "doc_id", F.posexplode("ws").alias("off", "_w")
    ).drop("_w")
    marked = pos.join(spans, ["doc_id", "off"], "left")
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reach = F.max("span_end").over(w_run)
    covered = marked.withColumn(
        "_covered", F.coalesce(reach > F.col("off"), F.lit(False))
    ).where("_covered")
    # covered positions are contiguous runs by construction (running
    # max); a run starts where the previous covered off is not off - 1
    w_doc = Window.partitionBy("doc_id").orderBy("off")
    w_doc_run = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ivls = (
        covered.withColumn(
            "_new",
            (
                F.coalesce(F.lag("off").over(w_doc), F.lit(-2))
                != F.col("off") - 1
            ).cast("int"),
        )
        .withColumn("_ivl", F.sum("_new").over(w_doc_run))
        .groupBy("doc_id", "_ivl")
        .agg(F.min("off").alias("s"), (F.max("off") + 1).alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("ivls"))
    )
    out = toks_all.join(ivls, "doc_id", "left").select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.expr(
            "filter(ws, (w, i) -> NOT exists(coalesce(ivls, array()), "
            "v -> v.s <= i AND i < v.e))"
        ).alias("kept"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("kept")).cast("long").alias("n_removed"),
        F.concat_ws(" ", "kept").alias("cleaned_text"),
    )
