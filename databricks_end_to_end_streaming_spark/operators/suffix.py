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

1. positions: every (doc_id, off) token, plus one UNIQUE per-doc
   sentinel token appended — suffixes never compare past their own
   document, and all suffixes become globally distinct.
2. rank_1 = dense rank of the single token (distinct tokens ranked by
   the range-partitioned global_row_number — no 1-partition window).
3. round k -> 2k: new key = (rank_k[p], rank_k[p + k] or 0); dense-rank
   the DISTINCT key pairs and join back. After ceil(log2(maxlen))
   rounds every rank is unique: that rank IS the suffix-array order.
4. LCP of rank-adjacent suffixes by descending the SAME rank tables:
   lcp += k whenever rank_k matches at offset lcp — O(log maxlen)
   joins over the n-row neighbor relation, the standard
   rank-table LCP query.
5. A repeated span of length >= L starts at position p iff p's LCP
   with one of its suffix-array NEIGHBORS is >= L (the max LCP over
   all other suffixes is always attained at an adjacent rank — the
   classic suffix-array property), so per-position repeat lengths come
   from the neighbor relation alone, never from all pairs.

Scale shape: every round is one equi-join on (doc_id, off) plus one
distinct + range-partitioned rank (a TeraSort-style sort) — key-bound
shuffles, O(log maxlen) rounds, nothing quadratic anywhere. Rank
tables are pinned per round (iterative-algorithm lineage hygiene, same
as connected_components / PageRank).

Exactness is pytest-pinned against a sequential Python suffix array on
the same tokens (tests/test_suffix.py); there is no tractable SQL
oracle (the quadratic replay is O(n^2 L)), so the registered query is
rows-only — the IVF/PQ/HLL discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..pin import pin
from .ranking import global_row_number

SENTINEL_PREFIX = "\x00"  # cannot occur in whitespace-normalized text


def _norm(col: str = "text") -> F.Column:
    return F.lower(F.regexp_replace(col, r"\s+", " "))


def corpus_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, off, tok): whitespace tokens of every document plus a
    unique per-doc sentinel at off == n_tokens. Empty tokens from
    leading/trailing/duplicated whitespace are filtered so the position
    space matches Python ``str.split()`` (the pytest reference) — a
    phantom "" token would otherwise create repeats at offsets that
    don't exist. doc_id must be unique per row (it is the sentinel's
    uniqueness source; suffix_rank_tables bounds the doubling loop and
    raises rather than spinning if that precondition is violated)."""
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(_norm(text_col), " "), lambda x: x != ""
        ).alias("toks"),
    )
    with_sentinel = F.concat(
        F.col("toks"),
        F.array(F.concat(F.lit(SENTINEL_PREFIX), F.col("doc_id").cast("string"))),
    )
    return toks.select(
        "doc_id", F.posexplode(with_sentinel).alias("off", "tok")
    )


def suffix_rank_tables(
    pos: DataFrame,
) -> tuple[dict[int, DataFrame], int]:
    """Prefix-doubling rank tables: {k: (doc_id, off, rank)} where equal
    rank at k means equal length-k prefixes (dense ranks), for k = 1, 2,
    4, ... until every suffix's rank is unique. Returns (tables, n)."""
    n = pos.count()
    tok_rank = global_row_number(
        pos.select("tok").distinct(), ["tok"], "rank"
    ).select("tok", "rank")
    r = (
        pos.join(tok_rank, "tok")
        .select("doc_id", "off", "rank")
        .transform(pin)
    )
    tables: dict[int, DataFrame] = {1: r}
    k = 1
    while n > 0:  # empty corpus: zero suffixes are trivially distinct
        # ranks are dense (row numbers over distinct keys), so max == n
        # iff all suffixes are distinguished — one cheap partial-agg job
        if r.agg(F.max("rank")).first()[0] == n:
            break
        if k > n:
            # prefix doubling must totalize by k >= max suffix length;
            # k > n without convergence means two suffixes are literally
            # identical — possible only when the per-doc sentinel is not
            # unique (duplicate doc_id rows, or a real token colliding
            # with a "\x00"-prefixed sentinel). Fail loudly instead of
            # doubling forever.
            raise ValueError(
                "suffix ranks did not totalize: duplicate doc_id rows "
                "(or sentinel-colliding tokens) make suffixes "
                "indistinguishable — doc_id must be unique per document"
            )
        nxt = r.select(
            "doc_id",
            (F.col("off") - k).alias("off"),
            F.col("rank").alias("rank2"),
        )
        paired = r.join(nxt, ["doc_id", "off"], "left").na.fill({"rank2": 0})
        pair_rank = global_row_number(
            paired.select("rank", "rank2").distinct(),
            ["rank", "rank2"],
            "nrank",
        ).select("rank", "rank2", "nrank")
        r = (
            paired.join(pair_rank, ["rank", "rank2"])
            .select("doc_id", "off", F.col("nrank").alias("rank"))
            .transform(pin)
        )
        k *= 2
        tables[k] = r
    return tables, n


def adjacent_lcp(tables: dict[int, DataFrame]) -> DataFrame:
    """(a_doc, a_off, b_doc, b_off, lcp): LCP between every suffix and
    its successor in suffix-array order, via descending rank-table
    comparison (lcp grows by k whenever the length-k prefixes at offset
    lcp still match)."""
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
    # costing the largest join round. Every lcp < K is representable by
    # the remaining powers (K/2 + ... + 1 = K-1).
    for k in sorted(tables, reverse=True)[1:]:
        rk = tables[k]
        ra = rk.select(
            F.col("doc_id").alias("a_doc"),
            F.col("off").alias("_ao"),
            F.col("rank").alias("_ra"),
        )
        rb = rk.select(
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
            .transform(pin)
        )
    return pairs


def position_repeat_lengths(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, off, max_repeat): for every REAL token position, the
    length of the longest span starting there that also occurs somewhere
    else in the corpus (same or another document). Sentinel positions are
    excluded; the sentinel guarantee means max_repeat never counts past
    a document's end."""
    pos = corpus_positions(docs, text_col).transform(pin)
    tables, _n = suffix_rank_tables(pos)
    pairs = adjacent_lcp(tables)
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
    doc_len = pos.groupBy("doc_id").agg((F.max("off")).alias("n_tokens"))
    # sentinel sits at off == n_tokens; keep real positions only
    return (
        per_pos.join(doc_len, "doc_id")
        .where(F.col("off") < F.col("n_tokens"))
        .select("doc_id", "off", "max_repeat")
    )
