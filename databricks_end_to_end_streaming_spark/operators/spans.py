"""Exact duplicated-n-gram-span removal (boilerplate scrubbing).

The corpus-level cousin of document dedup: instead of dropping whole
near-duplicate documents, remove the REPEATED SPANS themselves — header/
footer boilerplate, license blurbs, navigation chrome — that exact
substring deduplication identifies ("Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022, public method; here at word
k-gram granularity rather than BPE-token granularity so the semantics
stay string-exact and SQL-replayable).

Semantics (deterministic, engine-portable):

* tokenize each document on whitespace;
* every word k-gram whose DOCUMENT frequency (number of distinct docs
  containing it) reaches ``min_df`` is boilerplate;
* a token position is covered if any boilerplate k-gram occurrence
  overlaps it; covered tokens are dropped, the survivors re-join in
  their original order.

Scale shape (the 100 TB lens): the only corpus-sized shuffle is the
k-gram document-frequency aggregation (partial countDistinct on the
gram key — the same shape as any n-gram counting job). The hot-gram set
is small BY CONSTRUCTION (a gram must recur across >= min_df documents,
and natural-language boilerplate vocabularies are tiny next to the
corpus), so membership is a broadcast semi-join. Start positions
collapse to one short array per affected document, and the removal
itself is a per-row higher-order-function expression — whole-stage
codegen, no UDF, nothing quadratic anywhere. The reference engine has
no counterpart operator (its surface is the streaming medallion
pipeline); this extends the LLM-pipeline family in queries/dedup.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ngram_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, pos, gram) for every word ``k``-gram occurrence; ``pos`` is
    the 1-based token index of the gram's first word. Documents shorter
    than ``k`` tokens contribute nothing (the sequence() guard — Spark's
    ``sequence(1, 0)`` would otherwise DESCEND)."""
    toks = docs.select(
        id_col, F.split(F.trim(text_col), " +").alias("ws")
    )
    return toks.select(
        id_col,
        F.explode(
            F.expr(f"if(size(ws) >= {k}, sequence(1, size(ws) - {k} + 1), array())")
        ).alias("pos"),
        "ws",
    ).select(
        id_col,
        "pos",
        F.expr(f"concat_ws(' ', slice(ws, pos, {k}))").alias("gram"),
    )


def remove_duplicate_ngram_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 5,
    min_df_pct: int = 1,
) -> DataFrame:
    """Scrub every word ``k``-gram span whose document frequency reaches
    ``max(min_df, ceil(min_df_pct% of corpus size))`` distinct documents.
    Returns one row per input document:
    (id, n_tokens, n_removed, cleaned_text) — exact ints + strings, so
    the result is value-hash comparable across engines.

    The threshold SCALES WITH THE CORPUS: boilerplate means "recurs
    across a meaningful fraction of documents", not "recurs 5 times" —
    a fixed absolute cutoff flags ordinary collocations once the corpus
    is large enough (at 10x the dev corpus it scrubbed entire documents)
    while ``min_df`` alone keeps tiny corpora from flagging nothing.
    The percentage term uses exact integer ceil-division
    ``(n_docs * pct + 99) div 100`` — no float ceil, so Spark and SQL
    engines agree bit-for-bit at every corpus size.

    Convention: an empty/whitespace-only text splits to ONE empty token
    (Spark and DuckDB agree: ``split(trim(''), ' +') = ['']``), so such
    a doc reports n_tokens=1, n_removed=0, cleaned_text='' — it can
    never collide with real grams because non-empty docs produce no
    empty tokens."""
    grams = ngram_spans(docs, text_col, id_col, k)

    # 1-row corpus size, broadcast into the threshold expression.
    n_docs = docs.select(F.count("*").alias("n_total"))

    # Corpus-sized shuffle #1 (the only one): gram -> document frequency.
    hot = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df")
            >= F.greatest(
                F.lit(min_df).cast("long"),
                F.expr(f"(n_total * {min_df_pct} + 99) div 100"),
            )
        )
        .select("gram")
    )

    # Hot set is small by construction -> broadcast membership probe.
    starts = (
        grams.join(F.broadcast(hot), "gram")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("starts"))
    )

    toks = docs.select(id_col, F.split(F.trim(text_col), " +").alias("ws"))
    out = toks.join(starts, id_col, "left").select(
        id_col,
        F.size("ws").cast("long").alias("n_tokens"),
        F.expr(
            "filter(ws, (w, i) -> NOT exists(coalesce(starts, array()), "
            f"s -> s <= i + 1 AND i + 1 <= s + {k} - 1))"
        ).alias("kept"),
    )
    return out.select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") - F.size("kept")).cast("long").alias("n_removed"),
        F.concat_ws(" ", "kept").alias("cleaned_text"),
    )
