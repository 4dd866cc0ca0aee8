#!/usr/bin/env python3
"""Lint the graft.Explain dump of all query plans for scale red flags.

Usage:
    java -cp "target/scala-2.13/<jar>:/opt/spark/jars/*" graft.Explain \
        /root/testdata/sf0.001 > /tmp/plans_all.txt
    python3 tools/plan_lint.py /tmp/plans_all.txt

Hard failures (exit 1):
- CartesianProduct anywhere: a non-broadcast cross join scheduling
  left-partitions x right-partitions tasks. Every cross in this
  codebase is against a bounded frame and must carry an explicit
  broadcast() (found+fixed in q254 round 15: 7 of them over a
  few-dozen-row pair/lag grid).

Informational (printed, no exit code): high FileScan / Exchange /
SortMergeJoin counts. These over-count for persisted plans — formatted
explain reprints an InMemoryRelation's child subtree at every reuse —
so they are triage pointers, not gates.
"""
import re
import sys

text = open(sys.argv[1]).read()
blocks = re.split(r'=+ (q\S+) =+', text)[1:]
plans = dict(zip(blocks[0::2], blocks[1::2]))
print(f"{len(plans)} plans linted")

# Vacuous-green guard (ADVICE r15 #1): if the Explain dump format ever
# drifts and the header regex stops matching, plans={} and the lint
# would exit 0 having checked nothing. The graded surface is 270
# queries; fail loudly below a floor well under it but far above zero.
MIN_PLANS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
if len(plans) < MIN_PLANS:
    print(f"HARD FAIL: only {len(plans)} plans parsed (< {MIN_PLANS}) — "
          "the Explain dump format drifted or the dump is truncated; "
          "the lint checked (almost) nothing.")
    sys.exit(1)

hard = {}
for name, p in plans.items():
    n_cart = p.count('CartesianProduct')
    if n_cart:
        hard[name] = f'CartesianProduct x{n_cart}'

info = []
for name, p in plans.items():
    n_scan = p.count('Scan parquet') + p.count('FileScan parquet')
    n_ex = p.count('Exchange')
    n_smj = p.count('SortMergeJoin')
    if n_scan >= 30 or n_ex >= 80 or n_smj >= 8:
        info.append((name, n_scan, n_ex, n_smj))

if info:
    print("\nHigh-count plans (InMemoryRelation reprints inflate these; "
          "triage pointers only):")
    for name, s, e, j in sorted(info, key=lambda t: -t[2]):
        print(f"  {name}: scans={s} exchanges={e} smj={j}")

if hard:
    print(f"\nHARD FAIL: CartesianProduct in {len(hard)} plan(s):")
    for k, v in sorted(hard.items()):
        print(f"  {k}: {v} — add an explicit broadcast() to the small side")
    sys.exit(1)
print("\nNo CartesianProduct anywhere: clean.")
