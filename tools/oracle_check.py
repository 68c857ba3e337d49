"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
scale factor, compares row count, column names/dtypes, and
order-insensitive values, and prints one line per query. Use this before
every commit — if it's green here, CORRECTNESS_r{N} should be green.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            failed.append(name)
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
