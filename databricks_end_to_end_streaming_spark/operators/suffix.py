"""Distributed suffix array over the token corpus — variable-length
repeated-substring detection (the Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" ExactSubstr machinery,
re-expressed Spark-first).

The fixed-width n-gram scrub (operators/spans.py) finds duplicated
W-token windows; a suffix array finds the MAXIMAL repeated span at
every position — "this 137-token run also appears elsewhere in the
corpus" — which is what substring-level dedup actually cuts on.

Construction is Manber-Myers PREFIX DOUBLING, which is join/sort-bound
and therefore Spark-shaped (the sequential Kasai/DC3 algorithms are
not):

1. doc_token_arrays: per-document token array, plus one UNIQUE per-doc
   sentinel token appended — suffixes never compare past their own
   document, and all suffixes become globally distinct.
2. initial rank at k = W_INIT (8): dense rank of the DISTINCT 8-token
   window STRINGS (NUL-joined — see _grams for why string order equals
   token-sequence order). Ranking 8-grams directly skips the first
   log2(8) = 3 doubling rounds, the dominant cost of the r5 shape
   (each round is a fixed number of Spark jobs, and the operator is
   round-overhead-bound, not data-bound).
3. round k -> 2k: new key = (rank_k[p], rank_k[p + k] or 0); dense-rank
   the DISTINCT key pairs and join back. After O(log maxlen) rounds
   every rank is unique: that rank IS the suffix-array order. The
   in-loop ranking uses DETERMINISTIC arithmetic bucketing (prev-round
   ranks are dense in [1, max], so floor((rank-1)*P/max) is a balanced
   range split) — no repartitionByRange sampling job, no frozen pin,
   and the distinct-pair count doubles as a free convergence check.
4. LCP of rank-adjacent suffixes by descending the SAME rank tables:
   lcp += k whenever rank_k matches at offset lcp. Below k = W_INIT no
   rank tables exist; equality of length-k prefixes is tested against
   the map-only gram-string relation instead (descent needs EQUALITY,
   not order, so no ranking work for the small powers).
5. A repeated span of length >= L starts at position p iff p's LCP
   with one of its suffix-array NEIGHBORS is >= L (the max LCP over
   all other suffixes is always attained at an adjacent rank — the
   classic suffix-array property), so per-position repeat lengths come
   from the neighbor relation alone, never from all pairs.

Scale shape: every round is one equi-join on (doc_id, off) plus one
distinct + arithmetically-bucketed rank — key-bound shuffles,
O(log maxlen) rounds, nothing quadratic anywhere. Rank tables are
pinned per round (iterative-algorithm lineage hygiene, same as
connected_components / PageRank); the LCP descent pins every second
round only (bounded lineage at half the materialization jobs).

Exactness is pytest-pinned against a sequential Python suffix array on
the same tokens (tests/test_suffix.py); there is no tractable SQL
oracle (the quadratic replay is O(n^2 L)), so the registered query is
rows-only — the IVF/PQ/HLL discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..pin import pin

SENTINEL_PREFIX = "\x00"  # reserved: stripped from text by _norm below

# Initial direct-ranking width: rank distinct 8-gram strings instead of
# single tokens, skipping the k = 1, 2, 4 doubling rounds entirely.
W_INIT = 8


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


def _gram_arrays(arrays: DataFrame, w: int) -> DataFrame:
    """(doc_id, off, garr): the width-``w`` token window starting at
    every position as a token ARRAY — map-only. Used by the LCP
    descent's fused residual round, where sentinels must compare as
    whole tokens (the string form would split a sentinel's own NUL)."""
    g = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: F.slice("toks", i + 1, w),
    )
    return arrays.select("doc_id", F.posexplode(g).alias("off", "garr"))


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
) -> tuple[DataFrame, int]:
    """Initial suffix ranking at k = W_INIT in ONE range shuffle, no
    distinct + no join-back: range-partition every position's W_INIT-gram
    (equal grams co-locate by construction), then rank =
    min(global row number) over the gram class — the SORTED-POSITION
    rank (count of strictly-smaller suffixes + 1), which is what makes
    the doubling updates class-local. Returns
    ((doc_id, off, rank, tied), n)."""
    spark = arrays.sparkSession
    g8 = _grams(arrays, W_INIT)
    parted = g8.repartitionByRange(n_parts, "gram").sortWithinPartitions("gram")
    # frozen: repartitionByRange re-samples bounds per job (ranking.py
    # has the full rationale)
    with_pid = pin(
        parted.withColumn("_pid", F.spark_partition_id()),
        require_frozen=True,
        site="suffix.range_partitioned_grams",
    )
    counts = with_pid.groupBy("_pid").count().collect()
    sizes = {row["_pid"]: row["count"] for row in counts}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    n = acc
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "_pid int, _offset long",
        )
    )
    w_rn = Window.partitionBy("_pid").orderBy("gram")
    # equal grams are CO-LOCATED by the range partitioning, so the gram
    # class is exactly the (_pid, gram) class — and [_pid] ⊆ [_pid, gram]
    # means both windows run off the ONE exchange on _pid (partitioning
    # by a subset satisfies clustering on the superset), instead of a
    # second full shuffle on the gram strings.
    w_g = Window.partitionBy("_pid", "gram")
    ranked = (
        with_pid.join(offsets_df, "_pid")
        .withColumn("_rn", F.col("_offset") + F.row_number().over(w_rn))
        # class min is deterministic even though _rn tie order within a
        # gram class is not: it equals the class's global start position
        .withColumn("rank", F.min("_rn").over(w_g).cast("long"))
        .withColumn("tied", F.count("*").over(w_g) > F.lit(1))
        .select("doc_id", "off", "rank", "tied")
    )
    return pin(ranked), n


def suffix_rank_tables(
    arrays: DataFrame,
) -> tuple[dict[int, DataFrame], int]:
    """Prefix-doubling rank tables over ``doc_token_arrays`` output:
    {k: (doc_id, off, rank)} where equal rank at k means equal length-k
    prefixes, for k = W_INIT, 2*W_INIT, ... until every suffix's rank is
    unique. Returns (tables, n).

    Ranks are SORTED-POSITION ranks (count of strictly-smaller suffixes
    + 1, ties sharing the value), not dense ranks — equality semantics
    are identical, and a tied class of size m owns the rank interval
    [R, R+m-1], so re-ranking after a doubling step is LOCAL to the
    class: new rank = R + RANK() by the extension key within the class.
    That makes the classic settled/active split work in Spark terms:

    * settled suffixes (unique rank) never change — they accumulate in
      a lazy union of pinned pieces, no per-round merge shuffle;
    * only the still-tied ACTIVE rows (typically a tiny, duplicate-mass
      -bound fraction) are re-windowed each round; the rank2 lookup
      streams the full table map-side against the (AQE-broadcast when
      small) active relation.

    A round is therefore ~2 light jobs instead of the r5 shape's 5
    full-relation jobs, while the 100 TB story strengthens: per-round
    shuffle work tracks the surviving duplicate mass, not the corpus."""
    n_parts = arrays.sparkSession.sparkContext.defaultParallelism
    init, n = _ranked_init(arrays, n_parts)
    tables: dict[int, DataFrame] = {
        W_INIT: init.select("doc_id", "off", "rank")
    }
    settled_pieces = [
        init.where(~F.col("tied")).select("doc_id", "off", "rank")
    ]
    active = init.where("tied").select("doc_id", "off", "rank")
    n_active = active.count()  # cheap: init is pinned
    k = W_INIT
    while n_active > 0:
        if k > n:
            # prefix doubling must totalize by k >= max suffix length;
            # k > n without convergence means two suffixes are literally
            # identical — possible only when the per-doc sentinel is not
            # unique (duplicate doc_id rows; _norm strips NUL so token
            # collisions cannot happen). Fail loudly instead of
            # doubling forever.
            raise ValueError(
                "suffix ranks did not totalize: duplicate doc_id rows "
                "make suffixes indistinguishable — doc_id must be "
                "unique per document"
            )
        # rank2 = current rank of the suffix k positions ahead. Every
        # ACTIVE suffix has length > k (a shorter one ends in its unique
        # sentinel inside the k-prefix and would already be settled), so
        # the lookup always hits: inner join is safe.
        nxt = tables[k].select(
            "doc_id",
            (F.col("off") - k).alias("off"),
            F.col("rank").alias("rank2"),
        )
        looked = active.join(nxt, ["doc_id", "off"])
        w1 = Window.partitionBy("rank").orderBy("rank2")
        wm = Window.partitionBy("rank", "rank2")
        upd = pin(
            looked.select(
                "doc_id",
                "off",
                (F.col("rank") + F.rank().over(w1) - F.lit(1)).alias(
                    "rank"
                ),
                (F.count("*").over(wm) > F.lit(1)).alias("tied"),
            )
        )
        k *= 2
        tables[k] = _union_all(
            settled_pieces + [upd.select("doc_id", "off", "rank")]
        )
        settled_pieces.append(
            upd.where(~F.col("tied")).select("doc_id", "off", "rank")
        )
        active = upd.where("tied").select("doc_id", "off", "rank")
        n_active = active.count()  # cheap: upd is pinned
    return tables, n


def _union_all(pieces: list[DataFrame]) -> DataFrame:
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def adjacent_lcp(tables: dict[int, DataFrame], arrays: DataFrame) -> DataFrame:
    """(a_doc, a_off, b_doc, b_off, lcp): LCP between every suffix and
    its successor in suffix-array order, via descending rank-table
    comparison (lcp grows by k whenever the length-k prefixes at offset
    lcp still match). Powers below W_INIT have no rank table; their
    equality tests run against the map-only gram-string relation
    instead (same join shape, string payload)."""
    final = tables[max(tables)]
    a = final.select(
        F.col("doc_id").alias("a_doc"), F.col("off").alias("a_off"), "rank"
    )
    b = final.select(
        F.col("doc_id").alias("b_doc"),
        F.col("off").alias("b_off"),
        (F.col("rank") - 1).alias("rank"),
    )
    pairs = a.join(b, "rank").select(
        "a_doc", "a_off", "b_doc", "b_off", F.lit(0).alias("lcp")
    )
    # skip the FINAL rank table: its ranks are a permutation (that is
    # the doubling loop's exit condition), so no two distinct suffixes
    # can match at its k — the comparison would be a guaranteed no-op
    # costing the largest join round.
    rounds = [(k, tables[k]) for k in sorted(tables, reverse=True)[1:]]
    for i, (k, rel) in enumerate(rounds):
        ra = rel.select(
            F.col("doc_id").alias("a_doc"),
            F.col("off").alias("_ao"),
            F.col("rank").alias("_ra"),
        )
        rb = rel.select(
            F.col("doc_id").alias("b_doc"),
            F.col("off").alias("_bo"),
            F.col("rank").alias("_rb"),
        )
        pairs = (
            pairs.withColumn("_ao", F.col("a_off") + F.col("lcp"))
            .withColumn("_bo", F.col("b_off") + F.col("lcp"))
            .join(ra, ["a_doc", "_ao"], "left")
            .join(rb, ["b_doc", "_bo"], "left")
            .withColumn(
                "lcp",
                F.when(
                    F.col("_ra").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("lcp") + F.lit(k),
                ).otherwise(F.col("lcp")),
            )
            .drop("_ao", "_bo", "_ra", "_rb")
        )
        # pin every SECOND descent round: lineage stays bounded at <=4
        # joins while half the materialization jobs disappear — the
        # descent is round-overhead-bound like the doubling loop.
        if i % 2 == 1:
            pairs = pin(pairs)
    # FUSED residual round: after descending every rank-table power down
    # to W_INIT, the remaining lcp residue is < W_INIT. Instead of
    # log2(W_INIT) more join rounds at k = 4, 2, 1, fetch the W_INIT
    # token-array windows at offset lcp for both sides (two joins — the
    # cost of ONE descent round) and count their common token prefix
    # with a JVM higher-order expression. Sentinels compare as whole
    # tokens, so LCPs still stop exactly at document boundaries.
    g = _gram_arrays(arrays, W_INIT)
    ga = g.select(
        F.col("doc_id").alias("a_doc"),
        F.col("off").alias("_ao"),
        F.col("garr").alias("_ga"),
    )
    gb = g.select(
        F.col("doc_id").alias("b_doc"),
        F.col("off").alias("_bo"),
        F.col("garr").alias("_gb"),
    )
    eq = F.zip_with("_ga", "_gb", lambda x, y: x.eqNullSafe(y))
    residual = F.coalesce(
        F.aggregate(
            eq,
            F.struct(
                F.lit(0).alias("n"), F.lit(False).alias("stop")
            ),
            lambda acc, m: F.struct(
                F.when(
                    acc.getField("stop") | ~m, acc.getField("n")
                )
                .otherwise(acc.getField("n") + 1)
                .alias("n"),
                (acc.getField("stop") | ~m).alias("stop"),
            ),
        ).getField("n"),
        F.lit(0),
    )
    pairs = (
        pairs.withColumn("_ao", F.col("a_off") + F.col("lcp"))
        .withColumn("_bo", F.col("b_off") + F.col("lcp"))
        .join(ga, ["a_doc", "_ao"], "left")
        .join(gb, ["b_doc", "_bo"], "left")
        .withColumn("lcp", F.col("lcp") + residual)
        .drop("_ao", "_bo", "_ga", "_gb")
    )
    return pin(pairs)


def position_repeat_lengths(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, off, max_repeat): for every REAL token position, the
    length of the longest span starting there that also occurs somewhere
    else in the corpus (same or another document). Sentinel positions are
    excluded; the sentinel guarantee means max_repeat never counts past
    a document's end."""
    arrays = pin(doc_token_arrays(docs, text_col))
    tables, _n = suffix_rank_tables(arrays)
    pairs = adjacent_lcp(tables, arrays)
    up = pairs.select(
        F.col("a_doc").alias("doc_id"), F.col("a_off").alias("off"), "lcp"
    )
    dn = pairs.select(
        F.col("b_doc").alias("doc_id"), F.col("b_off").alias("off"), "lcp"
    )
    per_pos = (
        up.union(dn)
        .groupBy("doc_id", "off")
        .agg(F.max("lcp").alias("max_repeat"))
    )
    doc_len = arrays.select(
        "doc_id", (F.size("toks") - 1).alias("n_tokens")
    )
    # sentinel sits at off == n_tokens; keep real positions only
    return (
        per_pos.join(doc_len, "doc_id")
        .where(F.col("off") < F.col("n_tokens"))
        .select("doc_id", "off", "max_repeat")
    )
