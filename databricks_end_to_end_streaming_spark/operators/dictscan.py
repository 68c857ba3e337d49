"""Multi-pattern dictionary scanning via Aho-Corasick — the 100 TB
shape for blocklist / flagged-term / PII-dictionary matching over a
corpus: ONE automaton pass per document regardless of dictionary size,
where the naive shape is O(|dictionary|) contains()/LIKE scans per
document (every production badword list is 10k+ terms, so the naive
plan multiplies the corpus scan by four orders of magnitude).

Semantics contract (what makes it hash-oracle-able): per (doc, term),
the count of NON-OVERLAPPING left-to-right occurrences — exactly
Python ``str.count`` and exactly DuckDB's
``(length(t) - length(replace(t, term, ''))) // length(term)`` — so the
oracle replays the whole scan relationally on the sf-small corpus. The
automaton emits ALL match positions (including overlapping ones);
the per-term greedy filter (keep a match iff it starts at or after the
previous kept match's end) converts to the non-overlapping count,
because matches of one term arrive in increasing end order == the
left-to-right order str.count consumes them in.

The automaton is a plain-dict trie with BFS-built failure links and
output links, built ONCE on the driver (dictionary-sized) and shipped
to executors inside the Arrow-batched closure — the standard broadcast
dimension pattern, except the "join" is an automaton walk.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Deterministic vendored dictionary: corpus-vocabulary phrases (hits),
# absent terms (zero rows must still report), and overlap-prone shapes
# ("table table" self-overlaps across a shared " table " border) that
# pin the non-overlapping semantics in the hash compare every round.
DICT_TERMS = (
    "agg",
    "batch batch",
    "customer",
    "fast table",
    "gdpr",
    "hash",
    "key agg",
    "line sort",
    "password",
    "query line",
    "row scan",
    "scan scan",
    "slow",
    "spark",
    "ssn",
    "stream",
    "table table",
    "value part",
)

# The oracle SQL splices these terms into a VALUES list by f-string;
# a quote would break the SQL, an empty term divides by zero in the
# replace()-count, and duplicates would double dim rows on the Spark
# right-join but collapse in DuckDB's GROUP BY. Guard at import so a
# future edit fails loudly (``raise``, not ``assert`` — survives -O).
for _t in DICT_TERMS:
    if not _t or "'" in _t:
        raise ValueError(f"DICT_TERMS entry must be non-empty and quote-free: {_t!r}")
if len(set(DICT_TERMS)) != len(DICT_TERMS):
    raise ValueError("DICT_TERMS must be unique")


def build_aho(terms: tuple[str, ...]) -> tuple[list[dict], list[int], list[list[int]]]:
    """(goto, fail, out): goto[s] maps char -> state, fail[s] the
    failure state, out[s] the term indexes ending at state s (own +
    output-linked)."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for ti, term in enumerate(terms):
        s = 0
        for ch in term:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(ti)
    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out


def count_nonoverlapping(text: str, auto, terms: tuple[str, ...]) -> dict[int, int]:
    """{term_index: non-overlapping count} over one text — one
    automaton walk; per-term greedy keep (start >= previous kept end)
    reproduces str.count exactly."""
    goto, fail, out = auto
    counts: dict[int, int] = {}
    next_ok: dict[int, int] = {}
    s = 0
    for i, ch in enumerate(text):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for ti in out[s]:
            start = i - len(terms[ti]) + 1
            if start >= next_ok.get(ti, 0):
                counts[ti] = counts.get(ti, 0) + 1
                next_ok[ti] = i + 1
    return counts


def dictionary_hits(
    docs: DataFrame, terms: tuple[str, ...] = DICT_TERMS, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, hits) for hits > 0: the Arrow-batched one-pass
    scan. Callers aggregate; the relation is output-sized (docs x
    matched terms), never docs x dictionary."""
    tlist = tuple(terms)

    def scan(batches):
        auto = build_aho(tlist)  # dictionary-sized, built per worker
        for b in batches:
            rows = []
            for doc_id, text in zip(b["doc_id"], b[text_col]):
                for ti, c in count_nonoverlapping(
                    text or "", auto, tlist
                ).items():
                    rows.append((int(doc_id), tlist[ti], c))
            yield pd.DataFrame(
                rows, columns=["doc_id", "term", "hits"]
            )

    return docs.select("doc_id", text_col).mapInPandas(
        scan, schema="doc_id long, term string, hits long"
    )


def dictionary_term_report(
    docs: DataFrame, terms: tuple[str, ...] = DICT_TERMS, text_col: str = "text"
) -> DataFrame:
    """Per dictionary term: documents containing it and total
    non-overlapping occurrences — zero-hit terms REPORT (a blocklist
    audit must show silence as 0, not absence). One corpus pass, one
    term-sized partial agg, one broadcast join against the term dim."""
    spark = docs.sparkSession
    hits = dictionary_hits(docs, terms, text_col)
    agg = hits.groupBy("term").agg(
        F.count("*").alias("n_docs"), F.sum("hits").alias("n_hits")
    )
    dim = spark.createDataFrame([(t,) for t in terms], "term string")
    # right-outer keeps every dim row; the BROADCAST side must be the
    # preserved-side's opposite, and the aggregated relation (<= one
    # row per dictionary term) is the naturally tiny one anyway
    return (
        F.broadcast(agg)
        .join(dim, "term", "right")
        .select(
            "term",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .orderBy("term")
    )
