#!/usr/bin/env python3
"""Deterministic dirty-CSV fixture for the s1_csv_ingest query.

Committed to the repo so the Spark query and the DuckDB oracle read the
exact same bytes with no runtime write (a /tmp file written at verify
time is invisible if the oracle runs in another container, and racy if
bench/verify runs at another SF rewrite it). Regenerate with:
    python3 tools/gen_s1_fixture.py
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

buf = io.StringIO()
w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
w.writerow(["CertificateId", "GroupId", "Product", "PlanCode",
            "CertEffectiveDate", "CertIssuedState", "CertStatus",
            "RecStatus", "CertPremium", "CertSplitSeq", "CertSplitPercent",
            "SplitBrokerSeq", "SplitBrokerId", "PaidBrokerId",
            "CommissionsSchedule"])
w.writerows(rows)
out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "s1_cert.csv")
with open(out, "w", newline="") as f:
    f.write(buf.getvalue())
active = sum(1 for r in rows if r[6] == "A" and r[7] == "A")
print("wrote", out, len(rows), "rows,", active, "active")
