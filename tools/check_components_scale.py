#!/usr/bin/env python3
"""Feasible-at-scale oracle for d_components.

The driver-gate oracle for d_components is a recursive reachability CTE
whose working set is sum(|C|^2) over component sizes — at the 100x
replica (200K vectors, 14K-node components) that is ~2.5B rows and
DuckDB OOMs at 100 GB. The component LABELING itself is not the hard
part: this checker derives the IDENTICAL candidate-pair list in DuckDB
(same cell assignment + cosine threshold as the gate oracle's `prs`
CTE), then computes connected components with union-find in
O(E * alpha(N)) and compares (node, component, is_canonical)
value-by-value against the Spark parquet dump.

Usage: tools/check_components_scale.py <sfDir> <verifyOut> [jsonArtifact]

Merges a d_components entry into the artifact (same row shape as
tools/check_oracle.py), with "oracle" noting the union-find replay.
"""
import sys, json, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
artifact = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
emb = f"{sf}/embeddings.parquet"
src = f"{emb}/*.parquet" if os.path.isdir(emb) else emb

# Pair derivation, two phases for 60M-row feasibility:
#  1. cell assignment — byte-for-byte the gate oracle's e/cent/asg CTEs
#     (SparkEntry d_components), evaluated in DuckDB;
#  2. within-cell pairs — a NumPy/BLAS cosine PREFILTER with a margin
#     三 orders wider than any double-rounding drift (DuckDB's
#     list_cosine_similarity and the BLAS dot differ only in summation
#     order, ~1e-12 relative; the margin is 1e-3), then the exact
#     DuckDB predicate round(list_cosine_similarity, 6) >= t re-applied
#     to the surviving candidates only. The accepted pair set is
#     therefore IDENTICAL to the gate oracle's `prs` CTE — BLAS only
#     prunes pairs that are provably below threshold.
THRESHOLD, MARGIN = 0.35, 1e-3
con.execute(f"""
CREATE TEMP TABLE asg AS
WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM '{src}'),
     cent AS (SELECT m.cell, e.v AS centroid
              FROM (SELECT vid % 16 AS cell, min(vid) AS mvid
                    FROM e GROUP BY 1) m
              JOIN e ON e.vid = m.mvid)
SELECT vid, v, cell FROM (
  SELECT e.vid, e.v, c.cell,
         row_number() OVER (PARTITION BY e.vid
           ORDER BY round(list_cosine_similarity(e.v, c.centroid), 6) DESC,
                    c.cell) AS rn
  FROM e CROSS JOIN cent c) WHERE rn = 1
""")
import numpy as np
cand_a, cand_b = [], []
cells = [r[0] for r in con.execute("SELECT DISTINCT cell FROM asg ORDER BY 1").fetchall()]
for cell in cells:
    rows = con.execute(
        "SELECT vid, v FROM asg WHERE cell = ? ORDER BY vid", [cell]).fetchall()
    vids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mn = M / norms[:, None]
    # blockwise Mn @ Mn.T to bound memory at ~2k x n doubles
    B = 2048
    for s0 in range(0, len(vids), B):
        sim = Mn[s0:s0 + B] @ Mn.T
        ii, jj = np.nonzero(sim >= THRESHOLD - MARGIN)
        keep = (ii + s0) < jj  # upper triangle: vid_a < vid_b (vid-sorted)
        cand_a.append(vids[ii[keep] + s0])
        cand_b.append(vids[jj[keep]])
ca = np.concatenate(cand_a) if cand_a else np.array([], dtype=np.int64)
cb = np.concatenate(cand_b) if cand_b else np.array([], dtype=np.int64)
print(f"BLAS prefilter: {len(ca)} candidates")
import pandas as pd
cand_df = pd.DataFrame({"id_a": ca, "id_b": cb})
con.register("cand", cand_df)
pairs = con.execute(f"""
SELECT c.id_a, c.id_b
FROM cand c JOIN asg a ON a.vid = c.id_a JOIN asg b ON b.vid = c.id_b
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {THRESHOLD}
""").fetchnumpy()
ia, ib = pairs["id_a"], pairs["id_b"]
print(f"derived {len(ia)} exact pairs")

parent = {}
def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != r:  # path compression
        parent[x], x = r, parent[x]
    return r

for a, b in zip(ia.tolist(), ib.tolist()):
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min id keeps roots = smallest member, matching the
        # output contract directly
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

nodes = sorted(set(ia.tolist()) | set(ib.tolist()))
want = {n: find(n) for n in nodes}

got = con.execute(f"SELECT node, component, is_canonical "
                  f"FROM '{out}/d_components/*.parquet'").fetchall()
err = None
if len(got) != len(want):
    err = f"ROWS got={len(got)} want={len(want)}"
else:
    for node, comp, canon in got:
        w = want.get(node)
        if w is None:
            err = f"unexpected node {node}"; break
        if comp != w or canon != (node == w):
            err = f"node {node}: got ({comp},{canon}) want ({w},{node==w})"
            break
ok = err is None
print(f"d_components: {'PASS' if ok else 'FAIL ' + err} "
      f"({len(got)} rows, {len(set(want.values()))} components)")

if artifact:
    report = json.load(open(artifact)) if os.path.exists(artifact) else \
        {"sf_dir": sf, "queries": {}}
    report["queries"]["d_components"] = {
        "rows_match": ok or None, "schema_match": ok or None,
        "value_match": ok or None, "spark_rows": len(got),
        "oracle_rows": len(want), "err": err,
        "oracle": "duckdb pair derivation (gate-oracle CTEs) + union-find replay"}
    qs = report["queries"]
    report["n_pass"] = sum(1 for r in qs.values()
                           if r.get("value_match") and not r.get("err"))
    report["n_fail"] = len(qs) - report["n_pass"]
    with open(artifact, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {artifact}")
sys.exit(0 if ok else 1)
