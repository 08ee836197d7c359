#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB runs of SparkEntry.oracleSql.

Usage: tools/check_oracle.py [sfDir] [verifyOut] [jsonArtifact]

With a third argument, also writes a CORRECTNESS-style per-query JSON
artifact (rows_match / schema_match / value_match / row counts / err) so
scale-replica sweeps land in the repo in the same shape the driver's
gate emits.
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
artifact = sys.argv[3] if len(sys.argv) > 3 else None
# When rerunning a subset (e.g. after an oracle-side OOM at a scale
# replica), merge into the existing artifact instead of clobbering it.
report = {}
if artifact and os.path.exists(artifact):
    report = json.load(open(artifact)).get("queries", {})

# ORACLE_ONLY=q1,q2 restricts the compare; ORACLE_PRAGMAS are DuckDB
# statements run at connect (memory tuning for 60M-row replays, e.g.
# "SET preserve_insertion_order=false; SET threads=8").
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
pragmas = [p for p in os.environ.get("ORACLE_PRAGMAS", "").split(";") if p.strip()]

# ORACLE_DB=/path/file.db backs the session with an on-disk database so
# large intermediates can evict (DuckDB 1.0 spills more operators when
# the catalog is disk-backed); default stays in-memory.
db = os.environ.get("ORACLE_DB", ":memory:")
con = duckdb.connect(db)
for p in pragmas:
    con.execute(p)
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # ScaleGen replicas are Spark-style DIRECTORIES of part files; the
    # driver testdata is single-file parquet — handle both
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))

# ORACLE_MATERIALIZE=1: mechanically rewrite a non-recursive WITH chain
# into CREATE TABLE stages (same SQL text per stage, bodies unchanged —
# earlier CTE names resolve to the materialized tables). With ORACLE_DB
# pointing at a disk file this bounds peak memory to one stage instead
# of the whole pipeline: DuckDB 1.0's window operator cannot spill, so
# the 60M-row full-lineage GL replays OOM as a single query but pass
# staged. Purely an execution strategy — results are identical.
materialize = os.environ.get("ORACLE_MATERIALIZE") == "1"

def split_ctes(sql):
    """Parse 'WITH a AS (...), b AS (...) SELECT ...' into
    ([(name, body), ...], final_select); None if not applicable."""
    s = sql.strip()
    if not s[:5].upper().startswith("WITH ") or "RECURSIVE" in s[:16].upper():
        return None
    i, n, ctes = 4, len(s), []
    while True:
        while i < n and s[i] in " \t\r\n,":
            i += 1
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        name = s[i:j]
        k = j
        while k < n and s[k] in " \t\r\n":
            k += 1
        if s[k:k+2].upper() != "AS":
            return None
        k += 2
        while k < n and s[k] in " \t\r\n":
            k += 1
        if s[k] != "(":
            return None
        depth, p, quoted = 0, k, False
        while p < n:
            ch = s[p]
            if quoted:
                if ch == "'":
                    quoted = False
            elif ch == "'":
                quoted = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        if depth != 0:
            return None
        ctes.append((name, s[k+1:p]))
        i = p + 1
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i < n and s[i] == ",":
            continue
        return ctes, s[i:]

def run_staged(con, sql):
    parts = split_ctes(sql)
    if parts is None:
        return con.execute(sql).fetchdf()
    ctes, final = parts
    for name, body in ctes:
        con.execute(f'DROP TABLE IF EXISTS "{name}"')
        con.execute(f'CREATE TABLE "{name}" AS {body}')
    try:
        return con.execute(final).fetchdf()
    finally:
        for name, _ in reversed(ctes):
            con.execute(f'DROP TABLE IF EXISTS "{name}"')
fails, okays = [], []
def rec(name, rows_match=None, schema_match=None, value_match=None,
        spark_rows=None, oracle_rows=None, err=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "value_match": value_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}

for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "NO SPARK OUTPUT"))
        rec(name, err="NO SPARK OUTPUT")
        continue
    try:
        got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        want = run_staged(con, sql) if materialize else con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"SQL ERROR: {e}"))
        rec(name, err=f"SQL ERROR: {e}")
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"COLUMNS got={gc} want={wc}"))
        rec(name, schema_match=False, spark_rows=len(got), oracle_rows=len(want),
            err=f"columns got={gc} want={wc}")
        continue
    got, want = got[gc], want[wc]
    gt = [str(t) for t in got.dtypes]
    wt = [str(t) for t in want.dtypes]
    if len(got) != len(want):
        fails.append((name, f"ROWS got={len(got)} want={len(want)}"))
        rec(name, rows_match=False, schema_match=True,
            spark_rows=len(got), oracle_rows=len(want))
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
        rec(name, rows_match=True, schema_match=True, value_match=False,
            spark_rows=len(got), oracle_rows=len(want), err=mismatch)
    else:
        note = "" if gt == wt else f" (dtype diff: got={gt} want={wt})"
        okays.append((name, f"OK {len(got)} rows{note}"))
        rec(name, rows_match=True, schema_match=True, value_match=True,
            spark_rows=len(got), oracle_rows=len(want))

for n, m in okays: print(f"  PASS {n}: {m}")
for n, m in fails: print(f"  FAIL {n}: {m}")
if artifact:
    ok_n = sum(1 for r in report.values()
               if r.get("rows_match") and r.get("schema_match")
               and r.get("value_match") and not r.get("err"))
    with open(artifact, "w") as f:
        json.dump({"sf_dir": sf, "n_pass": ok_n,
                   "n_fail": len(report) - ok_n,
                   "queries": report}, f, indent=1, sort_keys=True)
    print(f"wrote {artifact}")
print(f"\n{len(okays)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
