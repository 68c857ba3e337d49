"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
scale factor, compares row count, column names/dtypes, and
order-insensitive values, and prints one line per query. Use this before
every commit — if it's green here, CORRECTNESS_r{N} should be green.

Usage: python tools/oracle_check.py [--json OUT.json] [sf_dir] [query_name ...]

With ``--json`` the run also writes a CORRECTNESS_r{N}-shaped artifact
(one row per query: rows_match/schema_match/hash_match/spark_rows/
oracle_rows/err) plus a ``fingerprint`` per row — sha256 of the query's
implementation source and oracle SQL — so later rounds can tell whether
a green row still describes the shipped code. Check the artifact in as
``CORRECTNESS_LOCAL_r{N}.json``; ``__spark_entry__._evidence_rounds``
folds those files in as secondary evidence.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_end_to_end_streaming_spark import get_spark, tables


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — mirrors an
    order-insensitive value comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    # Raw (pre-normalization) dtype drift: the driver may hash raw widths,
    # so int32-vs-int64 etc. is a failure here too. datetime64 resolution
    # is exempt: Spark's pandas conversion always reports [ns] while its
    # Arrow schema (what the driver sees) is [us] like DuckDB — values are
    # µs-exact on both sides.
    for c in spark_pdf.columns:
        a, b = spark_pdf[c].dtype, duck_pdf[c].dtype
        if pd.api.types.is_datetime64_any_dtype(a) and pd.api.types.is_datetime64_any_dtype(b):
            continue
        if str(a) != str(b):
            problems.append(f"raw-dtype[{c}] spark={a} duck={b}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(f"dtype[{c}] spark={a[c].dtype} duck={b[c].dtype}")
    if problems:
        return problems
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.array_equal(a[c].values, b[c].values, equal_nan=True)
                if not ok:
                    diff = np.nanmax(
                        np.abs(a[c].values - b[c].values)
                        / np.maximum(np.abs(b[c].values), 1e-12)
                    )
                    problems.append(f"values[{c}] max rel diff {diff:.3e}")
            else:
                if not a[c].equals(b[c]):
                    n_bad = int((a[c] != b[c]).sum())
                    problems.append(f"values[{c}] {n_bad} mismatched rows")
    return problems


def fingerprint(fn, oracle: str | None) -> str:
    """sha256 over the implementation source + oracle SQL: a green row
    whose fingerprint still matches the shipped code proves the exact
    code pair was cross-engine verified, not an ancestor of it."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    failed = []
    results: dict[str, dict] = {}

    def record(name, *, rows_match, schema_match, hash_match, spark_rows,
               oracle_rows, err):
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
            "fingerprint": fingerprint(qs[name], oracles.get(name)),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            failed.append(name)
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=None, oracle_rows=None,
                   err="spark: " + traceback.format_exc(limit=1).strip())
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            record(name, rows_match=None, schema_match=None, hash_match=None,
                   spark_rows=len(spark_pdf), oracle_rows=None,
                   err="no_oracle")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            failed.append(name)
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=len(spark_pdf),
                   oracle_rows=None,
                   err="duckdb: " + traceback.format_exc(limit=1).strip())
            continue
        problems = compare(spark_pdf, duck_pdf)
        rows_ok = len(spark_pdf) == len(duck_pdf)
        schema_ok = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        record(name, rows_match=rows_ok, schema_match=schema_ok,
               hash_match=not problems, spark_rows=len(spark_pdf),
               oracle_rows=len(duck_pdf),
               err="; ".join(problems) if problems else None)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} rows)")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
