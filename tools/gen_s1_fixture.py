#!/usr/bin/env python3
"""Deterministic dirty-CSV fixture for the s1_csv_ingest query, plus its
raw parquet twin.

Committed to the repo so the Spark query and the DuckDB oracle read the
exact same bytes with no runtime write (a /tmp file written at verify
time is invisible if the oracle runs in another container, and racy if
bench/verify runs at another SF rewrite it).

The parquet twin (fixtures/s1_cert_raw.parquet) is the all-string
tokenization of the CSV, written HERE with python's csv module +
pyarrow — deliberately NOT with Spark — so it is an independent
tokenization: IngestSpec asserts Spark's CSV parse equals the twin
cell-for-cell, and the DuckDB oracle reads the twin instead of
re-sniffing the CSV (oracle-engine CSV dialects proved
version-sensitive across driver rounds; parquet decoding is not).

Empty fields are stored as NULL to match Spark's CSV semantics
(default nullValue="" turns empty/quoted-empty fields into null).

Regenerate both files with:  python3 tools/gen_s1_fixture.py
"""
import csv, io, os

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
STATES = ["TX", "CA", "NY", "FL"]

rows = []
for i in range(1, 1501):
    plan = "" if i % 10 == 0 else "PL%d" % (i % 4 + 1)
    cert_status = "T" if i % 7 == 0 else "A"
    rec_status = "X" if i % 11 == 0 else "A"
    if i % 13 == 0:
        eff = "not-a-date"
    else:
        eff = "2020-0%d-15" % (i % 9 + 1)
    if i % 19 == 0:
        eff = "  %s  " % eff
    product = "DENTAL, PLUS" if i % 23 == 0 else SEGS[i % 5]
    state = "  " if i % 29 == 0 else STATES[i % 4]
    premium = "%.2f" % (((i * 7919) % 900000 + 100) / 100.0)
    if i % 19 == 0:
        premium = " %s " % premium
    rows.append([
        str(i),                       # CertificateId
        "G%d" % (i % 20),             # GroupId
        product,                      # Product
        plan,                         # PlanCode
        eff,                          # CertEffectiveDate
        state,                        # CertIssuedState
        cert_status,                  # CertStatus
        rec_status,                   # RecStatus
        premium,                      # CertPremium
        str(i % 2 + 1),               # CertSplitSeq
        "50.00" if i % 3 == 0 else "100.00",  # CertSplitPercent
        "1",                          # SplitBrokerSeq
        "P%d" % (i % 50),             # SplitBrokerId
        "P%d" % (i % 40),             # PaidBrokerId
        "SCHED%d" % (i % 5 + 1),      # CommissionsSchedule
    ])

HEADER = ["CertificateId", "GroupId", "Product", "PlanCode",
          "CertEffectiveDate", "CertIssuedState", "CertStatus",
          "RecStatus", "CertPremium", "CertSplitSeq", "CertSplitPercent",
          "SplitBrokerSeq", "SplitBrokerId", "PaidBrokerId",
          "CommissionsSchedule"]

buf = io.StringIO()
w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
w.writerow(HEADER)
w.writerows(rows)
fixdir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
out = os.path.join(fixdir, "s1_cert.csv")
with open(out, "w", newline="") as f:
    f.write(buf.getvalue())
active = sum(1 for r in rows if r[6] == "A" and r[7] == "A")
print("wrote", out, len(rows), "rows,", active, "active")

# ---- raw parquet twin: independent (non-Spark) tokenization ----
# Round-trip through python's csv reader so the twin reflects an
# actual re-tokenization of the written bytes, not the in-memory rows.
import pyarrow as pa
import pyarrow.parquet as pq

with open(out, newline="") as f:
    rdr = csv.reader(f)
    header = next(rdr)
    assert header == HEADER
    parsed = [[None if cell == "" else cell for cell in r] for r in rdr]

cols = list(zip(*parsed))
table = pa.table(
    {name: pa.array(col, type=pa.string()) for name, col in zip(HEADER, cols)})
twin = os.path.join(fixdir, "s1_cert_raw.parquet")
pq.write_table(table, twin)
print("wrote", twin, table.num_rows, "rows (pyarrow, independent of Spark)")

# ---- typed twin: independent implementation of the whole s1 pipeline ----
# trim -> empty-as-null -> try_cast -> active-only filter, in pure python.
# The s1_csv_ingest oracle is a plain read_parquet of this file, so the
# driver's gate compares Spark's CSV->typed pipeline against a THIRD,
# engine-free implementation — no DuckDB cast/sniffer semantics involved
# (recomputing the typed pass in oracle SQL failed hash-only for three
# driver rounds on bytes that pass locally; whatever the divergence was,
# it lived in the oracle engine's recomputation, which this removes).
import datetime

def clean(s):
    if s is None:
        return None
    t = s.strip(" ")          # Spark trim(): ASCII space only
    return t if t != "" else None

def try_long(s):
    s = clean(s)
    try:
        return None if s is None else int(s)
    except ValueError:
        return None

def try_date(s):
    s = clean(s)
    try:
        return None if s is None else datetime.date.fromisoformat(s)
    except ValueError:
        return None

def try_money(s):
    # decimal(18,2) -> double: float() of the 2-decimal string is the
    # same correctly-rounded IEEE double as scaled-int/100.0
    s = clean(s)
    try:
        return None if s is None else float(s)
    except ValueError:
        return None

typed_rows = []
for r in parsed:
    (cert_id, group_id, product, plan, eff, state, cert_status, rec_status,
     prem, split_seq, split_pct, tier, broker, paid, sched) = r
    if clean(cert_status) != "A" or clean(rec_status) != "A":
        continue
    typed_rows.append((
        try_long(cert_id), clean(group_id), clean(product), clean(plan),
        try_date(eff), clean(state), clean(cert_status), clean(rec_status),
        try_money(prem), try_long(split_seq), try_money(split_pct),
        try_long(tier), clean(broker), clean(paid), clean(sched)))

tcols = list(zip(*typed_rows))
schema = [
    ("cert_id", pa.int64()), ("group_id", pa.string()),
    ("product_code", pa.string()), ("plan_code", pa.string()),
    ("eff_date", pa.date32()), ("state", pa.string()),
    ("cert_status", pa.string()), ("rec_status", pa.string()),
    ("premium", pa.float64()), ("split_seq", pa.int32()),
    ("split_pct", pa.float64()), ("tier_level", pa.int32()),
    ("broker_id", pa.string()), ("paid_broker_id", pa.string()),
    ("schedule_code", pa.string()),
]
ttable = pa.table({n: pa.array(c, type=t) for (n, t), c in zip(schema, tcols)})
typed = os.path.join(fixdir, "s1_cert_typed.parquet")
pq.write_table(ttable, typed)
print("wrote", typed, ttable.num_rows, "active typed rows (pure python)")
