"""Content-defined chunking (CDC) — sub-document storage dedup.

The mechanism behind blob-store dedup (LBFS, Muthitacharoen et al.
SOSP 2001; rsync's rolling checksum — public literature): chunk
boundaries are placed where a rolling hash of the trailing W bytes hits
a fixed pattern, so boundaries are a function of CONTENT, not offsets —
insert one byte near the front of a document and every fixed-size block
shifts, but content-defined cut points downstream of the edit stay put,
so all following chunks still dedup. For an LLM-corpus store this is
the accounting layer that answers "how much of these 100 TB is
byte-identical sub-document content" (mirrors, boilerplate frames,
quoted replies) at a granularity exact full-document dedup can't see.

Determinism discipline: the rolling hash is a polynomial over BYTE
values mod a fixed prime (h(pos) = sum_j byte[pos-j] * 257^j mod 1e9+7,
j < 16) — exact int64 arithmetic (terms < 2.6e11), cut where
h % 2^CDC_MASK_BITS == CDC_MASK (expected chunk = 2^mask_bits bytes).
Pure hash-cut CDC: production variants add min/max chunk bounds, which
is a filter on the same cut relation; kept unbounded here so the DuckDB
oracle replays the exact construction. Callers scope the corpus to
ASCII documents (chars == bytes) so character addressing IS byte
addressing on both engines.

100 TB shape: cut detection and chunk fingerprinting are map-only JVM
HOFs inside whole-stage codegen (nested transform/aggregate — no UDF,
no shuffle); the only corpus shuffle is the chunk-fingerprint groupBy
(chunk-count-sized rows of (fp, len), text dropped at the md5), and the
occurrence rollup downstream is histogram-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CDC_WINDOW = 16
CDC_PRIME = 257
CDC_MOD = 1_000_000_007
CDC_MASK_BITS = 8  # cut where h % 256 == 255: ~256-byte expected chunks
CDC_MASK = (1 << CDC_MASK_BITS) - 1

# 257^j mod (1e9+7) for j < 16 — inlined on both engines so a drifted
# constant is a hash mismatch, not a silent re-derivation
CDC_POW = tuple(pow(CDC_PRIME, j, CDC_MOD) for j in range(CDC_WINDOW))


def cdc_cut_positions() -> F.Column:
    """array<bigint> of 0-based cut positions for an ASCII ``text``
    column: position p is a cut iff the rolling hash of bytes
    (p-15 .. p) matches the mask. Documents shorter than the window
    have no interior cuts (one whole-document chunk).

    The byte array binds ONCE per row as a higher-order-function lambda
    variable (``transform(array(<bytes>), bs -> ...)``), so the inner
    per-position reads are O(1) ``element_at`` lookups. The naive form
    (``ascii(substring(text, pos, 1))`` inside the position loop) is
    QUADRATIC — UTF8String.substring walks from the start of the
    string, and measured 31 s at sf0.1 vs ~2 s for this shape — and a
    plain projected bytes column doesn't fix it because Catalyst's
    project-collapse would inline the split per position (the
    queries/dedup.py minhash lesson)."""
    # The 16-term polynomial is UNROLLED as one flat sum per position
    # (max sum ~4.1e12 — fits int64; one mod at the end is the same
    # residue the per-step-mod fold and the oracle's sum-then-mod
    # compute): an inner aggregate() HOF costs 16 interpreted lambda
    # invocations per position and measured ~2x slower than this form.
    terms = " + ".join(
        f"element_at(bs, CAST(pos - {j} + 1 AS INT)) * {w}L"
        for j, w in enumerate(CDC_POW)
    )
    return F.expr(
        f"""
        CASE WHEN octet_length(text) > {CDC_WINDOW - 1} THEN
          element_at(
            transform(
              array(transform(split(text, ''), c -> ascii(c))),
              bs -> filter(
                transform(
                  sequence({CDC_WINDOW - 1}L, octet_length(text) - 1L),
                  pos -> IF(
                    ({terms}) % {CDC_MOD}L
                      % {1 << CDC_MASK_BITS} = {CDC_MASK},
                    pos, -1L)),
                x -> x >= 0)),
            1)
        ELSE array()
        END
        """
    )


def cdc_chunks(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, chunk_start, chunk_len, fp): the content-defined chunks of
    every document — chunk k spans (prev_cut + 1 .. cut), plus the final
    partial chunk unless a cut lands exactly on the last byte. ``fp`` is
    md5 of the chunk bytes; text drops here, so downstream carries
    (fp, len) rows only."""
    n = F.octet_length("text")
    cuts = cdc_cut_positions()
    with_bounds = docs.select(
        F.col(id_col), "text", cuts.alias("cuts"), n.alias("n")
    ).select(
        id_col,
        "text",
        F.when(
            (F.size("cuts") > 0)
            & (F.element_at("cuts", -1) == F.col("n") - 1),
            F.col("cuts"),
        )
        .otherwise(
            F.concat("cuts", F.array((F.col("n") - 1).cast("long")))
        )
        .alias("ends"),
        "cuts",
    )
    starts = F.slice(
        F.concat(
            F.array(F.lit(0).cast("long")),
            F.transform("cuts", lambda c: c + 1),
        ),
        1,
        F.size("ends"),
    )
    spans = with_bounds.select(
        id_col,
        "text",
        F.explode(F.arrays_zip(starts.alias("s"), F.col("ends").alias("e"))).alias(
            "sp"
        ),
    )
    return spans.select(
        id_col,
        F.col("sp.s").alias("chunk_start"),
        (F.col("sp.e") - F.col("sp.s") + 1).alias("chunk_len"),
        F.md5(
            F.expr(
                "substring(text, CAST(sp.s + 1 AS INT),"
                " CAST(sp.e - sp.s + 1 AS INT))"
            )
        ).alias("fp"),
    )
