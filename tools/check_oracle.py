#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB runs of SparkEntry.oracleSql.

Usage: tools/check_oracle.py [sfDir] [verifyOut]
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails, okays = [], []
for name, sql in sorted(oracles.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"SQL ERROR: {e}"))
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"COLUMNS got={gc} want={wc}"))
        continue
    got, want = got[gc], want[wc]
    gt = [str(t) for t in got.dtypes]
    wt = [str(t) for t in want.dtypes]
    if len(got) != len(want):
        fails.append((name, f"ROWS got={len(got)} want={len(want)}"))
        continue
    # sort rows for order-insensitive compare; tuple-ize array cells so
    # list columns are hashable/sortable
    import numpy as np
    def tuplize(df):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        return df
    g = tuplize(got.copy()).sort_values(by=gc, ignore_index=True)
    w = tuplize(want.copy()).sort_values(by=wc, ignore_index=True)
    mismatch = None
    for c in gc:
        import pandas as pd
        a, b = g[c], w[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            import numpy as np
            an, bn = a.isna(), b.isna()
            if not (an == bn).all():
                mismatch = f"col {c}: null mask differs"; break
            diff = (a.fillna(0) - b.fillna(0)).abs().max()
            if diff > 0:
                mismatch = f"col {c}: max float diff {diff}"
                if diff > 1e-9: break
                print(f"  note {name}.{c}: sub-threshold float diff {diff}")
                mismatch = None  # tolerate tiny
        else:
            eq = (a.fillna("__null__") == b.fillna("__null__")) if a.dtype == object else (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = f"col {c} ({a.dtype} vs {b.dtype}): row {i}: got={a[i]!r} want={b[i]!r}"
                break
    if mismatch:
        fails.append((name, mismatch + f" [types got={gt} want={wt}]"))
    else:
        note = "" if gt == wt else f" (dtype diff: got={gt} want={wt})"
        okays.append((name, f"OK {len(got)} rows{note}"))

for n, m in okays: print(f"  PASS {n}: {m}")
for n, m in fails: print(f"  FAIL {n}: {m}")
print(f"\n{len(okays)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
