"""Public-Suffix-List eTLD+1 derivation as a broadcast dimension join
— the real registrable-domain algorithm (publicsuffix.org/list, the
Mozilla-maintained list; algorithm per its published spec) behind the
slot queries/web.py::registered_domain documents.

Rules come from the FULL public list by default: ``load_psl_rules``
parses a ``public_suffix_list.dat`` snapshot (``SPARK_GRAFT_PSL_PATH``,
else the OS-packaged copy at /usr/share/publicsuffix/ — the ~9.5k-rule
Mozilla list), normalizes its IDN U-label rules to punycode A-labels
(the `idna` library, UTS #46 mapping), and prepends the list's implicit
'*' default rule. ``PSL_SNAPSHOT`` remains as the no-snapshot fallback
SUBSET (the canonical multi-label, wildcard and exception shapes). The
algorithm is rule-count-independent — the broadcast dim size is the
only thing that changes between the two (measured: bench extras
``psl_match_full_rules_sec`` / ``psl_match_subset_rules_sec``).

Hosts with non-ASCII labels normalize through ``punycode_hosts``
(Arrow-batched pandas UDF over the DISTINCT-domain relation — domain-
count-bounded, never per-doc) so U-label and A-label spellings of the
same host derive the same registered domain. Wiring: the IDN-aware
production path is ``queries/web.py::url_registered_domain_idn``
(rows-only — DuckDB cannot replay the IDNA codec); the hash-oracled
domain queries run on the ASCII synthetic corpus and skip the UDF so
their plans stay fully SQL-replayable.

Matching algorithm (the spec, re-expressed relationally):

1. explode the normalized host into its label-suffix candidates
   (a.b.co.uk -> a.b.co.uk, b.co.uk, co.uk, uk), each emitted twice —
   as itself (exact rules) and with its first label replaced by '*'
   (wildcard rules, so the single-label candidate's form '*' matches
   the list's implicit default rule);
2. equi-join the candidate keys against the broadcast rules relation;
3. per host, the prevailing rule is the exception rule if any matched,
   else the matched rule with the most labels (never empty: '*'
   always matches);
4. the public suffix is the host's last ``labels`` labels (one fewer
   for an exception rule); eTLD+1 is one label more, NULL when the
   host IS a public suffix.

100 TB shape: candidates explode the DISTINCT-domain relation (domain-
count-, not doc-count-, bounded) by <= label-depth x 2 rows; the rules
side is a broadcast dim; the per-domain argmax is one agg on the
already-domain-keyed rows. Everything else is map-side string work in
whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Vendored FALLBACK subset of the Public Suffix List, used only when no
# full snapshot file is available (see load_psl_rules): '!' marks
# exception rules, '*' a wildcard label; '*' alone is the list's
# implicit default rule ("the prevailing rule is '*' when no rule
# matches").
PSL_SNAPSHOT: list[str] = [
    "*",
    "com", "org", "net", "edu", "gov", "io", "co",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "jp", "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp",
    "br", "com.br", "net.br", "org.br",
    "in", "co.in", "net.in", "org.in",
    "nz", "co.nz", "org.nz",
    "za", "co.za", "org.za",
    "cn", "com.cn", "net.cn", "org.cn",
    "mx", "com.mx", "org.mx",
    "kr", "co.kr", "or.kr",
    "tr", "com.tr", "org.tr",
    "ar", "com.ar", "org.ar",
]


PSL_SYSTEM_PATHS = (
    "/usr/share/publicsuffix/effective_tld_names.dat",
    "/usr/share/publicsuffix/public_suffix_list.dat",
)

_rules_cache: dict[str, list[str]] = {}


try:  # optional dependency, probed once: without it IDN labels cannot
    # normalize — degrade LOUDLY (one-time warning), never silently
    import idna as _idna
except ImportError:  # pragma: no cover - environment-dependent
    _idna = None

_warned_no_idna = False


def _punycode_label(label: str) -> str:
    """One host/rule label to its A-label: ASCII labels lowercase
    unchanged ('*' included); U-labels encode via IDNA UTS #46. Labels
    the CODEC rejects (malformed real-world hosts) degrade to bare
    lowercase so normalization never throws mid-pipeline — but a
    MISSING `idna` package is not a malformed label: it warns once
    (per process) that IDN rules/hosts are passing through
    un-normalized, so a wrong-registered-domain corpus can't happen
    silently."""
    if label == "*" or label.isascii():
        return label.lower()
    if _idna is None:
        global _warned_no_idna
        if not _warned_no_idna:
            _warned_no_idna = True
            import warnings

            warnings.warn(
                "the 'idna' package is not installed: non-ASCII PSL "
                "rules/hosts keep their U-label form, so A-label "
                "spellings of IDN hosts will NOT match them",
                stacklevel=3,
            )
        return label.lower()
    try:
        return _idna.encode(label, uts46=True).decode("ascii")
    except (UnicodeError, _idna.IDNAError):  # malformed labels keep bytes
        return label.lower()


def puny_host(host: str) -> str:
    """Full-host punycode normalization: lowercase, strip one trailing
    dot, per-label A-label encoding. ASCII hosts take the fast path."""
    h = host.strip().rstrip(".").lower()
    if h.isascii():
        return h
    return ".".join(_punycode_label(l) for l in h.split("."))


def resolve_psl_path(path: str | None = None) -> str | None:
    """THE source-of-truth resolution, used by every PSL entry point
    (load_psl_rules, psl_snapshot_provenance, tools/psl_check.py) so no
    two callers can disagree about which rule set is in effect:
    explicit ``path`` arg > ``SPARK_GRAFT_PSL_PATH`` > the OS-packaged
    Mozilla list (PSL_SYSTEM_PATHS) > ``None`` (vendored
    ``PSL_SNAPSHOT`` subset)."""
    import os

    if path is not None:
        # an EXPLICIT snapshot must exist: falling back to a different
        # rule set than the caller pinned would silently change results
        if not os.path.isfile(path):
            raise FileNotFoundError(f"PSL snapshot not found: {path}")
        return path
    cand = [os.environ.get("SPARK_GRAFT_PSL_PATH")] + list(PSL_SYSTEM_PATHS)
    return next((p for p in cand if p and os.path.isfile(p)), None)


def psl_snapshot_provenance(path: str | None = None) -> dict:
    """Provenance of the rule set in effect: source kind + path,
    sha256/size/mtime for file sources, and parsed rule-class counts
    (wildcard / exception / IDN-normalized / total) — the record a
    derived-corpus artifact cites so "which PSL" is never ambiguous.
    The upstream list carries no version header; the hash IS the
    version."""
    import datetime
    import hashlib
    import os

    chosen = resolve_psl_path(path)
    rules = load_psl_rules(path)
    classes = {
        "rules_total": len(rules),
        "wildcard": sum(1 for r in rules if "*" in r and r != "*"),
        "exception": sum(1 for r in rules if r.startswith("!")),
        "idn_punycoded": sum(1 for r in rules if "xn--" in r),
    }
    if chosen is None:
        return {"source": "vendored-subset", "path": None, **classes}
    with open(chosen, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    st = os.stat(chosen)
    return {
        "source": "file",
        "path": chosen,
        "sha256": digest,
        "bytes": st.st_size,
        "mtime_utc": datetime.datetime.fromtimestamp(
            st.st_mtime, tz=datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        **classes,
    }


def load_psl_rules(path: str | None = None) -> list[str]:
    """The rules list: a ``public_suffix_list.dat`` snapshot parsed from
    the ``resolve_psl_path`` source of truth, else the vendored
    ``PSL_SNAPSHOT`` subset. Comment/blank lines drop, U-label rules
    normalize to punycode, the implicit '*' default rule is prepended,
    duplicates (a U-label rule whose A-label twin is also listed)
    collapse. Cached per path."""
    chosen = resolve_psl_path(path)
    if chosen is None:
        return list(PSL_SNAPSHOT)
    if chosen in _rules_cache:
        return _rules_cache[chosen]
    rules: list[str] = ["*"]
    seen = {"*"}
    with open(chosen, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            raw = line.split()[0]
            is_exc = raw.startswith("!")
            key = raw[1:] if is_exc else raw
            norm = ".".join(_punycode_label(l) for l in key.split("."))
            rule = ("!" + norm) if is_exc else norm
            if rule not in seen:
                seen.add(rule)
                rules.append(rule)
    _rules_cache[chosen] = rules
    return rules


def _parsed_rules(raw: list[str] | None = None) -> list[tuple[str, int, int]]:
    """(key, labels, is_exc) triples: exception '!' stripped (the key is
    what a candidate string equals), labels counted WITH the wildcard
    label per the spec. Defaults to the FULL loaded list."""
    out = []
    for r in raw if raw is not None else load_psl_rules():
        is_exc = 1 if r.startswith("!") else 0
        key = r[1:] if is_exc else r
        out.append((key, key.count(".") + 1, is_exc))
    return out


def psl_rules_df(
    spark: SparkSession, raw: list[str] | None = None
) -> DataFrame:
    """The broadcast rules dimension: (rule, labels, is_exc)."""
    return spark.createDataFrame(
        _parsed_rules(raw), "rule string, labels int, is_exc int"
    )


def psl_rules_values_sql(raw: list[str] | None = None) -> str:
    """The SAME rules as an inline SQL VALUES list, so the DuckDB oracle
    joins the identical relation (punycode normalization keeps every
    rule ASCII, so the literal list needs no escaping)."""
    rows = ", ".join(
        f"('{k}', {n}, {e})" for k, n, e in _parsed_rules(raw)
    )
    return f"(VALUES {rows})"


def punycode_hosts(domains: DataFrame, col: str = "domain") -> DataFrame:
    """Replace ``col`` with its punycode-normalized form — Arrow-batched
    pandas UDF, meant for the DISTINCT-domain relation (domain-count-
    bounded; ASCII rows short-circuit inside the batch loop)."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _puny(s: pd.Series) -> pd.Series:
        return s.map(lambda h: puny_host(h) if h is not None else None)

    return domains.withColumn(col, _puny(F.col(col)))


def psl_registered_domains(domains: DataFrame, rules: DataFrame) -> DataFrame:
    """(domain, ps_labels, public_suffix, reg_domain_psl) for a relation
    with a normalized ``domain`` column (lowercase host, no port).
    reg_domain_psl is NULL when the host is itself a public suffix."""
    parts = domains.select(
        "domain", F.split("domain", r"\.").alias("ls")
    )
    cand = parts.select(
        "domain",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(ls) - 1), i ->"
                " array_join(slice(ls, i + 1, size(ls) - i), '.'))"
            )
        ).alias("i", "c"),
    )
    keys = cand.select("domain", F.col("c").alias("key")).union(
        cand.select(
            "domain", F.regexp_replace("c", r"^[^.]+", "*").alias("key")
        )
    )
    hits = keys.join(
        F.broadcast(rules), keys["key"] == rules["rule"]
    ).groupBy("domain").agg(
        F.max("is_exc").alias("has_exc"),
        F.max(F.when(F.col("is_exc") == 1, F.col("labels"))).alias(
            "exc_labels"
        ),
        F.max(F.when(F.col("is_exc") == 0, F.col("labels"))).alias(
            "best_labels"
        ),
    )
    scored = hits.withColumn(
        "ps_labels",
        F.when(F.col("has_exc") == 1, F.col("exc_labels") - 1).otherwise(
            F.col("best_labels")
        ),
    ).withColumn("ls", F.split("domain", r"\."))
    return scored.select(
        "domain",
        "ps_labels",
        F.expr(
            "array_join(slice(ls, size(ls) - ps_labels + 1, ps_labels), '.')"
        ).alias("public_suffix"),
        F.when(
            F.size("ls") > F.col("ps_labels"),
            F.expr(
                "array_join(slice(ls, size(ls) - ps_labels, ps_labels + 1),"
                " '.')"
            ),
        ).alias("reg_domain_psl"),
    )


def psl_match_sql(domains_cte: str) -> str:
    """DuckDB CTE chain mirroring ``psl_registered_domains`` over a CTE
    named ``domains_cte`` exposing a ``domain`` column. Exposes ``psl``:
    (domain, ps_labels, public_suffix, reg_domain_psl)."""
    return f"""
    parts AS (
      SELECT domain, string_split(domain, '.') AS ls FROM {domains_cte}
    ),
    cand AS (
      SELECT domain,
             array_to_string(list_slice(ls, i, len(ls)), '.') AS c
      FROM parts, unnest(range(1, len(ls) + 1)) AS t(i)
    ),
    keys AS (
      SELECT domain, c AS key FROM cand
      UNION ALL
      SELECT domain, regexp_replace(c, '^[^.]+', '*') FROM cand
    ),
    hits AS (
      SELECT k.domain,
             max(r.is_exc) AS has_exc,
             max(CASE WHEN r.is_exc = 1 THEN r.labels END) AS exc_labels,
             max(CASE WHEN r.is_exc = 0 THEN r.labels END) AS best_labels
      FROM keys k
      JOIN {psl_rules_values_sql()} AS r(rule, labels, is_exc)
        ON k.key = r.rule
      GROUP BY k.domain
    ),
    psl AS (
      SELECT domain,
             CASE WHEN has_exc = 1 THEN exc_labels - 1
                  ELSE best_labels END AS ps_labels,
             array_to_string(
               list_slice(string_split(domain, '.'),
                          len(string_split(domain, '.'))
                            - (CASE WHEN has_exc = 1 THEN exc_labels - 1
                                    ELSE best_labels END) + 1,
                          len(string_split(domain, '.'))), '.')
               AS public_suffix,
             CASE WHEN len(string_split(domain, '.')) >
                    (CASE WHEN has_exc = 1 THEN exc_labels - 1
                          ELSE best_labels END)
               THEN array_to_string(
                 list_slice(string_split(domain, '.'),
                            len(string_split(domain, '.'))
                              - (CASE WHEN has_exc = 1 THEN exc_labels - 1
                                      ELSE best_labels END),
                            len(string_split(domain, '.'))), '.')
             END AS reg_domain_psl
      FROM hits
    )"""
