"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf, then compares row count,
column names, and exact values (columns sorted by name, rows sorted by all
columns) — a strict superset of the driver's value-hash check.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} duck={sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"row count differ: spark={len(got)} duck={len(exp)}")
        return errs
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            gv = gv.astype(np.float64)
            ev = ev.astype(np.float64)
            bad = ~(np.isclose(gv, ev, rtol=0, atol=0) | (np.isnan(gv) & np.isnan(ev)))
        else:
            bad = gv != ev
        if bad.any():
            i = int(np.argmax(bad))
            errs.append(f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"spark={gv[i]!r} duck={ev[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from mbrngq_spark.config import session

    spark = session(app="gate-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:24s} rows={len(got):7d}  spark={t1-t0:5.1f}s  (no oracle — rows-only)")
            continue
        exp = con.sql(oracles[name]).df()
        errs = compare(name, got, exp)
        status = "OK " if not errs else "FAIL"
        print(f"  {name:24s} rows={len(got):7d}  spark={t1-t0:5.1f}s  duck={time.time()-t1:5.1f}s  {status}")
        for e in errs:
            failures += 1
            print(f"      {e}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
