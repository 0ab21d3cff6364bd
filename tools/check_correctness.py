"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count / schema / values (order-insensitive).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if len(a) != len(b):
        errs.append(f"row count {len(a)} vs {len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        errs.append(f"columns {sorted(a.columns)} vs {sorted(b.columns)}")
        return errs
    if errs:
        return errs
    ca, cb = canon(a), canon(b)
    for col in ca.columns:
        va, vb = ca[col], cb[col]
        if va.dtype.kind == "f" or vb.dtype.kind == "f":
            import numpy as np

            if not np.allclose(
                va.astype(float), vb.astype(float), atol=1e-12, rtol=0, equal_nan=True
            ):
                bad = (va.astype(float) - vb.astype(float)).abs().max()
                errs.append(f"float col {col}: max abs diff {bad}")
        else:
            neq = (va.astype(str) != vb.astype(str))
            if neq.any():
                i = neq.idxmax()
                errs.append(f"col {col}: first diff at row {i}: {va[i]!r} vs {vb[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from webgraph_big_spark.session import get_spark

    spark = get_spark("check", cpus=8, shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        errs = compare(got, want)
        if errs:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
