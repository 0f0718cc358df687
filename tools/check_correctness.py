"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over the
same sf dir, compare row count + (name-sorted) schema + order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [query ...]

``--out-of-window`` selects exactly the registry keys past the driver's
50-key grading window (the keys CORRECTNESS_r*.json never sees) — the
per-round re-check the verify recipe prescribes, immune to list drift as
keys are added.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import TABLES

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--out-of-window"]
    out_of_window = "--out-of-window" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if out_of_window:
        only |= set(list(entrymod.queries())[DRIVER_WINDOW:])
    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: row count {len(a)} vs {len(b)}")
            continue
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(bad.sum())}/{len(a)} differing rows")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  oracle:", b[bad].head(3).to_dict("records"))
            continue
        print(f"OK    {name}: {len(a)} rows ({dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
