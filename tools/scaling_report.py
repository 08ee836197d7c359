#!/usr/bin/env python3
"""Assemble the per-decade scaling table (SCALING.md + SCALING_r{N}.json)
from graft.Bench JSON lines captured at 1x/10x/100x replicas.

Usage: tools/scaling_report.py <round> <bench_1x.json> <bench_10x.json> <bench_100x.json>

Each input file holds one graft.Bench JSON line. The output table makes
scaling regressions diffable round-over-round: for each query, seconds at
each decade plus the 10x->100x growth factor (a near-linear operator shows
~10x; sublinear postures — enforced sampling, corpus-size-independent
training — show < 10x).
"""
import json, sys

rnd = sys.argv[1]
runs = []
for path in sys.argv[2:5]:
    # Prefer the full per-query "#bench <name> <sec>" comment lines when a
    # sibling .raw capture exists: the compact JSON line drops sub-0.5s
    # queries into an aggregate, which would hole the table at 1x.
    qs = {}
    try:
        with open(path + ".raw") as f:
            for line in f:
                if line.startswith("#bench "):
                    _, name, sec = line.split()
                    qs[name] = float(sec)
    except FileNotFoundError:
        pass
    with open(path) as f:
        parsed = json.loads(f.read().strip().splitlines()[-1])
    if qs:
        parsed = dict(parsed, queries=qs)
    runs.append(parsed)

scales = ["1x", "10x", "100x"]
queries = sorted(runs[0]["queries"].keys())
rows = []
for q in queries:
    secs = [r["queries"].get(q) for r in runs]
    g10 = (secs[1] / secs[0]) if secs[0] and secs[1] else None
    g100 = (secs[2] / secs[1]) if secs[1] and secs[2] else None
    rows.append((q, secs, g10, g100))

out = {
    "round": int(rnd),
    "scales": scales,
    "base_rows": {"lineitem": 600000, "orders": 150000, "documents": 5000,
                  "embeddings": 2000},
    "queries": {q: {"sec": dict(zip(scales, secs)),
                    "growth_1x_to_10x": round(g10, 2) if g10 else None,
                    "growth_10x_to_100x": round(g100, 2) if g100 else None}
                for (q, secs, g10, g100) in rows},
}
with open(f"SCALING_r{rnd}.json", "w") as f:
    json.dump(out, f, indent=1)

lines = [
    "# Per-decade scaling table (round %s)" % rnd,
    "",
    "graft.Bench wall seconds on ScaleGen replicas of sf0.1 (1x = 600K",
    "lineitem rows / 5K docs; each decade multiplies every table's rows and",
    "key cardinality by 10 — per-key densities constant, disjoint shards).",
    "Growth columns are the wall-clock ratios between adjacent decades:",
    "~10 = linear in corpus size, < 10 = sublinear posture (enforced",
    "sampling, corpus-size-independent training, blocking that caps pair",
    "fan-out), > 10 = superlinear — a scaling regression to investigate.",
    "",
    "| query | 1x s | 10x s | 100x s | 1x->10x | 10x->100x |",
    "|---|---|---|---|---|---|",
]
for (q, secs, g10, g100) in rows:
    fmt = lambda v: ("%.2f" % v) if v is not None else "—"
    lines.append("| %s | %s | %s | %s | %s | %s |" % (
        q, fmt(secs[0]), fmt(secs[1]), fmt(secs[2]), fmt(g10), fmt(g100)))
lines.append("")
with open("SCALING.md", "w") as f:
    f.write("\n".join(lines))
print(f"wrote SCALING.md + SCALING_r{rnd}.json ({len(rows)} queries)")
