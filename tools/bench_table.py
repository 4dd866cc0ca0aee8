#!/usr/bin/env python3
"""Render the >=1s slice of bench_times.json against a prior round's
sidecar as a markdown table (the VERDICT r12 #7 record)."""
import json
import sys

cur = json.load(open(sys.argv[1]))
prev = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {}
cq = cur.get("queries", {})
pq = prev.get("queries", {})
rows = sorted(((v, k) for k, v in cq.items() if v >= 1.0), reverse=True)
print("| query | r13 sec | prior sec | delta |")
print("|---|---|---|---|")
for v, k in rows:
    p = pq.get(k)
    if p is not None and p > 0:
        print(f"| {k} | {v:.2f} | {p:.2f} | {v - p:+.2f} |")
    else:
        print(f"| {k} | {v:.2f} | new | — |")
shared = [(k, cq[k], pq[k]) for k in cq if k in pq and cq[k] > 0 and pq[k] > 0]
if shared:
    st = sum(c for _, c, _ in shared)
    sp = sum(p for _, _, p in shared)
    print(f"\nShared-query subtotal: {sp:.1f}s -> {st:.1f}s "
          f"({(st - sp) / sp * 100:+.1f}%) over {len(shared)} queries; "
          f"total {cur.get('value', 0):.1f}s over {len(cq)} queries.")
