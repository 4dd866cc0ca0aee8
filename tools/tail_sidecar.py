#!/usr/bin/env python3
"""Reconstruct a guard-usable sidecar from a driver BENCH_r{N}.json.

The driver archives only the LAST ~1.9KB of Bench stdout (the `tail`
field), and since round 16 its own full sidecar goes to /tmp and is not
archived — so the driver run's per-query times survive only as the
short-keyed (`qNN`) `query_times` dict inside the tail. This script
expands those short keys back to the full graded names (the qNN prefix
is unique per query by construction) and emits a sidecar-shaped JSON
(`queries`, plus `sentinel_pre`/`sentinel_post` when the total_tail
line made it into the window), so the close's regression guard can take
the driver run as a second prior:

  python3 tools/tail_sidecar.py BENCH_r16.json /tmp/driver_r16.json
  python3 tools/bench_table.py bench_times.json PRIOR_CLOSE.json /tmp/driver_r16.json

Truncation is expected (the window eats the front): queries missing
from the tail are simply absent, and the guard's per-query MIN over
priors handles partial coverage.
"""
import json
import re
import sys

bench = json.load(open(sys.argv[1]))
tail = bench.get("tail", "")
# full names from the committed close sidecar (same query surface)
full = json.load(open("bench_times.json"))["queries"]
# qNN prefixes are unique per query by construction TODAY — enforce it
# (ADVICE r17 #4): a future colliding prefix would otherwise silently
# map both tail entries onto the alphabetically-first full name and
# corrupt reconstructed prior floors. Ambiguous prefixes are dropped
# with a warning; the guard's per-run MIN handles the missing entries.
by_short = {}
colliding = {}  # short -> every full name that claimed it (ADVICE r18 #4)
for name in full:
    short = name.split("_")[0]
    if short in by_short or short in colliding:
        names = colliding.setdefault(
            short, [by_short.get(short)] if by_short.get(short) else [])
        names.append(name)
        by_short.pop(short, None)
    else:
        by_short[short] = name
for short, names in sorted(colliding.items()):
    print(f"WARNING: ambiguous short key {short} "
          f"({' vs '.join(names)}) — dropping it from the "
          f"reconstruction", file=sys.stderr)

queries = {}
for short, val in re.findall(r'"(q\d+)":(-?\d+(?:\.\d+)?)', tail):
    name = by_short.get(short)
    if name:
        queries[name] = float(val)

out = {"metric": "total", "sf": bench.get("sf"),
       "source": f"driver tail of {sys.argv[1]} ({len(queries)} queries)",
       "queries": queries}
m = re.search(r'"sent_pre":(-?\d+(?:\.\d+)?),"sent_post":(-?\d+(?:\.\d+)?)',
              tail)
if m:
    out["sentinel_pre"] = float(m.group(1))
    out["sentinel_post"] = float(m.group(2))
m = re.search(r'"cpu_pre":(-?\d+(?:\.\d+)?),"cpu_post":(-?\d+(?:\.\d+)?)',
              tail)
if m:  # round-19 CPU-kernel sentinel, absent on older driver tails
    out["cpu_sentinel_pre"] = float(m.group(1))
    out["cpu_sentinel_post"] = float(m.group(2))
m = re.search(r'"metric":"total_tail","value":(-?\d+(?:\.\d+)?)', tail)
if m:
    out["value"] = float(m.group(1))
json.dump(out, open(sys.argv[2], "w"), indent=1)
print(f"{len(queries)} queries reconstructed -> {sys.argv[2]}"
      + (", sentinels included" if "sentinel_pre" in out else ""))
