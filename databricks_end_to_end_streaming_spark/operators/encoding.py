"""Encoding-damage (mojibake) detection and repair.

Web corpora are full of text whose UTF-8 bytes were at some point
misdecoded as Windows-1252/Latin-1 — "café" becomes "cafÃ©", a curly
apostrophe becomes "â€™". The repair is public knowledge (the ftfy
library's core idea, R. Speer, "fixes text for you"): re-encode the
damaged string through *sloppy* cp1252 (cp1252 with its five undefined
bytes 0x81/0x8D/0x8F/0x90/0x9D passed through as Latin-1 control
characters) and strictly re-decode as UTF-8. The round-trip is
self-guarding: genuine text containing, say, "bâtiment" re-encodes to
bytes that are NOT valid UTF-8, so the strict decode fails and the
original is kept — false repairs require the damaged form to be valid
UTF-8 by coincidence, which real language essentially never is.

Spark shapes:

* detection is pure expression code (``substr_count`` replace-length
  arithmetic over a fixed marker list — exact integer math, whole-stage
  codegen, SQL-portable via ``substr_count_sql``);
* repair is an Arrow-batched pandas UDF (``fix_mojibake_col``) with a
  marker-scan fast path, applied per row with NO state and NO shuffle —
  map-only at any corpus size, and trivially incremental (a per-batch
  run of the same column expression is the streaming twin; there is no
  cross-batch state to carry).

No counterpart exists in the 825-LoC reference; this is a north-star
extension operator for the 100 TB training-data pipeline.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

# Marker sequences that essentially only occur in mojibake: 'Ã' starts
# every misdecoded 2-byte UTF-8 sequence (C3 xx), 'â€' starts the
# misdecoded General Punctuation block (E2 80 xx), 'Â' the misdecoded
# C2 xx block (NBSP, «, », §, ...). Exported for detection queries;
# repair itself gates on the wider lead-byte range below — correctness
# always comes from the strict-UTF-8 round-trip.
MOJIBAKE_HINTS = ("Ã", "â€", "Â")


def _has_mojibake_lead(s: str) -> bool:
    """Fast-path gate: a cp1252-misdecoded UTF-8 sequence must contain
    the misdecode of a UTF-8 lead byte 0xC2-0xF4, and every such byte
    maps (via cp1252 or the sloppy Latin-1 fallback) to a codepoint in
    0x81-0x2122 whose ORD source byte is recoverable — conservatively,
    any char in U+00C2..U+00F4 (the Latin-1 identity span of the lead
    range) or the cp1252 remaps of 0xC2.. (none exist: 0xC2-0xF4 are
    identity in cp1252). False positives (real accented text) are fine:
    the strict decode rejects them; false negatives are impossible."""
    return any(0xC2 <= ord(c) <= 0xF4 for c in s)

# cp1252's five undefined bytes; sloppy-cp1252 maps the corresponding
# Latin-1 control characters straight through (ftfy's published table).
_SLOPPY_PASSTHROUGH = frozenset({0x81, 0x8D, 0x8F, 0x90, 0x9D})

_MAX_PASSES = 3  # bounded fixpoint: handles doubly-encoded mojibake


def substr_count(col: str | Column, needle: str) -> Column:
    """Exact count of (non-overlapping) raw-substring occurrences via
    replace-length arithmetic — integer math, engine-portable. Unlike
    queries/text.py::_occurrences this does NOT pad with spaces: markers
    are sub-token byte sequences, not whitespace-delimited tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def substr_count_sql(col: str, needle: str) -> str:
    """DuckDB twin of ``substr_count`` (single-quote needles only)."""
    assert "'" not in needle
    return (
        f"CAST((len({col}) - len(replace({col}, '{needle}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """Encode through sloppy cp1252; None when any character has no
    byte (true non-Latin text — cannot be a cp1252 misdecode)."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp in _SLOPPY_PASSTHROUGH:
                    out.append(cp)
                else:
                    return None
        return bytes(out)


def sloppy_cp1252_decode(b: bytes) -> str:
    """The forward DAMAGE model: decode bytes as cp1252 with the five
    undefined bytes passed through as Latin-1 controls — exactly what a
    lenient cp1252 reader does to UTF-8 bytes. Inverse of
    ``_sloppy_cp1252_encode``; used by tests to synthesize realistic
    mojibake and by callers that want to simulate damage."""
    out = []
    for byte in b:
        if byte in _SLOPPY_PASSTHROUGH:
            out.append(chr(byte))
        else:
            out.append(bytes([byte]).decode("cp1252"))
    return "".join(out)


def fix_mojibake_text(s: str) -> str:
    """Repair one string: bounded fixpoint of sloppy-cp1252-encode →
    strict-UTF-8-decode, keeping a pass only when the decode succeeds.
    Returns the input unchanged when no char in the misdecoded-lead
    range U+00C2-U+00F4 is present (the fast path — free for ASCII
    corpora; genuinely accented Latin text passes this gate and pays
    one cp1252-encode + strict-UTF-8-decode, which then rejects it) or
    when the round-trip fails (not mojibake)."""
    for _ in range(_MAX_PASSES):
        if not _has_mojibake_lead(s):
            return s
        b = _sloppy_cp1252_encode(s)
        if b is None:
            return s
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if t == s:
            return s
        s = t
    return s


def fix_mojibake_col(col: str | Column) -> Column:
    """Arrow-batched column repair — the only non-expression step, and
    it is map-only (no shuffle, no state). ASCII-clean corpora are
    essentially free (lead-range fast path); corpora rich in genuine
    accented text pay the per-row codec round-trip — budget the UDF
    accordingly. Built lazily: ``pandas_udf``
    requires an active session, so the decorator cannot run at module
    import."""

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else fix_mojibake_text(x))

    return _fix(F.col(col) if isinstance(col, str) else col)


def mojibake_marker_count(col: str | Column, markers: tuple[str, ...]) -> Column:
    """Total occurrences of the given marker substrings — the exact
    detection signal shared by the batch query and its SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    total = None
    for m in markers:
        cnt = substr_count(c, m)
        total = cnt if total is None else total + cnt
    assert total is not None
    return total


def mojibake_marker_count_sql(col: str, markers: tuple[str, ...]) -> str:
    return " + ".join(substr_count_sql(col, m) for m in markers)
