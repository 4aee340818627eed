#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given scale factor,
runs the matching ``oracle_sql()`` through DuckDB on the same parquet
tables, and compares: row count, sorted column names, dtypes, and
order-insensitive values (rows sorted by all columns, exact equality —
stricter than any plausible value-hash, so passing here should pass the
driver).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for col in a.columns:
        x, y = a[col], b[col]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xa = x.astype("float64").to_numpy()
            ya = y.astype("float64").to_numpy()
            both_nan = np.isnan(xa) & np.isnan(ya)
            same = (xa == ya) | both_nan
            if not same.all():
                i = int(np.argmin(same))
                return False, f"col {col} row {i}: {xa[i]!r} vs {ya[i]!r}"
        else:
            same = (x.astype("object").where(x.notna(), None)
                    == y.astype("object").where(y.notna(), None)) | (
                x.isna() & y.isna()
            )
            if not same.all():
                i = int(np.argmin(same.to_numpy()))
                return False, f"col {col} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
    return True, ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from pandabase_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(spark_pd)} rows "
                f"(rows-only, {time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(ex).__name__}: {ex}")
            continue
        a, b = canon(spark_pd), canon(duck_pd)
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            failures.append(name)
            print(
                f"FAIL  {name}: columns {sorted(spark_pd.columns)} "
                f"vs {sorted(duck_pd.columns)}"
            )
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        ok, why = values_equal(a, b)
        dt_note = ""
        for col in a.columns:
            if str(a[col].dtype) != str(b[col].dtype):
                dt_note += f" [dtype {col}: {a[col].dtype} vs {b[col].dtype}]"
        if ok:
            print(f"OK    {name}: {len(a)} rows ({time.time()-t0:.1f}s){dt_note}")
            if dt_note:
                failures.append(name + " (dtype only)")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {why}{dt_note}")

    print(
        f"\n{n_run - len(failures)}/{n_run} clean; "
        f"failures: {failures if failures else 'none'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
