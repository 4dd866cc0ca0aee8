#!/usr/bin/env python3
"""Self-check for the close-time guard tooling (bench_table.py +
guard_triage.py verdict rule). No Spark, no bench run — synthetic
sidecars only, so it runs in ~1s at any point in a round:

    python3 tools/test_guard_tools.py     # prints PASS/FAIL per case

Cases cover every behavior the round-17 close relied on:
  1. ratio trigger (the classic q239 shape)
  2. absolute-delta trigger on a shipping query (VERDICT r16 #3's
     commissioned synthetic: 7s -> 9s at 1.29x must flag)
  3. absolute-delta trigger does NOT fire on the diagnostic tier
     (q233-class band noise; ratio still guards it)
  4. degraded current sentinel -> warning + exit 1
  5. failed prior sentinel -> warning, exit stays 0
  6. no-priors misuse -> exit 2
  7. PIN-CANDIDATE at 2 clean ledger events; suppressed when pinned
     or already sampling min-of-3
  8. guard_triage.still_regressed: ratio, absolute+margin, and the
     q233 calibration case (+2.75s at 1.16x of floor = clean)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
BT = os.path.join(HERE, "bench_table.py")
failures = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}" + (f"  [{detail}]" if detail and not ok else ""))
    if not ok:
        failures.append(name)


def sidecar(queries, samples=None, sent=(0.25, 0.25), pins=None, mid=None,
            cpu=None):
    d = {"metric": "total", "value": sum(v for v in queries.values() if v > 0),
         "sf": "synthetic", "queries": queries,
         "samples": samples or {k: 2 for k in queries},
         "sentinel_pre": sent[0], "sentinel_post": sent[1]}
    if pins is not None:
        d["always_min_of_3"] = pins
    if mid is not None:
        d["sentinel_mid"] = mid
    if cpu is not None:
        d["cpu_sentinel_pre"], d["cpu_sentinel_post"] = cpu
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(d, f)
    f.close()
    return f.name


def run_bt(*paths, env=None):
    e = dict(os.environ)
    e["GRAFT_GUARD_FLAGS_OUT"] = "/tmp/test_guard_flags.json"
    if env:
        e.update(env)
    r = subprocess.run([sys.executable, BT, *paths],
                       capture_output=True, text=True, env=e)
    return r.returncode, r.stdout


base = {"q01_a": 1.0, "q50_big": 7.0, "q233_link_prediction": 17.3,
        "q99_swing": 0.9}

# 1. ratio trigger
rc, out = run_bt(sidecar({**base, "q01_a": 2.6}), sidecar(base))
check("ratio trigger flags 1.0->2.6 (2.6x)", rc == 1 and "q01_a" in out)

# 2. absolute trigger, shipping query (the commissioned synthetic)
rc, out = run_bt(sidecar({**base, "q50_big": 9.0}), sidecar(base))
check("absolute trigger flags 7s->9s (1.29x)",
      rc == 1 and "q50_big" in out and "absolute-delta trigger" in out,
      out[-300:])

# 3. absolute trigger skips the diagnostic tier (ratio still guards)
rc, out = run_bt(sidecar({**base, "q233_link_prediction": 24.6}),
                 sidecar(base))
check("diagnostic +7.3s at 1.42x does NOT flag", rc == 0, out[-300:])
rc, out = run_bt(sidecar({**base, "q233_link_prediction": 40.0}),
                 sidecar(base))
check("diagnostic 2.3x STILL ratio-flags", rc == 1 and "q233" in out)

# 4. degraded current sentinel
rc, out = run_bt(sidecar(base, sent=(0.25, 2.4)), sidecar(base))
check("degraded current sentinel warns + exit 1",
      rc == 1 and "DEGRADED-BOX WINDOW" in out)

# 5. failed prior sentinel: warning only
rc, out = run_bt(sidecar(base), sidecar(base, sent=(-1.0, 0.25)))
check("failed prior sentinel warns, exit 0",
      rc == 0 and "sentinel FAILED" in out)

# 6. no priors
rc, out = run_bt(sidecar(base))
check("zero priors hard-fails (exit 2)", rc == 2)

# 7. PIN-CANDIDATE: uses the REAL ledger (read-only), so synthesize via
# a temp HOME-relative copy is not possible — instead verify against
# the committed ledger's invariants: every >=2-clean query is either
# pinned (suppressed via always_min_of_3) or proposed.
hist = json.load(open(os.path.join(HERE, "triage_history.json")))
clean = {}
for ev in hist["events"]:
    if ev.get("verdict") == "clean":
        clean[ev["query"]] = clean.get(ev["query"], 0) + 1
two_plus = {q for q, n in clean.items() if n >= 2}
# the live pin set, read from the committed close sidecar's
# always_min_of_3 field (written by Bench since round 17) — NOT a
# hardcoded copy that drifts when Bench.alwaysMinOf3 gains a member
# (ADVICE r17 #2)
pinned_now = set(json.load(open(os.path.join(
    os.path.dirname(HERE), "bench_times.json"))).get("always_min_of_3", []))
assert pinned_now, "committed bench_times.json carries no always_min_of_3"
cur = sidecar({**base, **{q: 1.0 for q in two_plus}},
              samples={**{k: 2 for k in base},
                       **{q: (3 if q == "q233_link_prediction" else 2)
                          for q in two_plus}},
              pins=sorted(pinned_now))
rc, out = run_bt(cur, sidecar(base))
expected_props = two_plus - pinned_now - {"q233_link_prediction"}
check("PIN-CANDIDATE proposes exactly the unpinned non-min-of-3 set",
      all(f"PIN-CANDIDATE: {q}" in out for q in expected_props)
      and "PIN-CANDIDATE: q236_source_divergence" not in out
      and "PIN-CANDIDATE: q233_link_prediction" not in out,
      out[-400:])

# 9. degraded-segment discount (VERDICT r17 #2): a mid-run sentinel
# above the ceiling discounts flags inside its segment — no exit 1, no
# fresh-JVM re-time — while healthy endpoints stay green. Sorted order
# of `base` is q01_a, q233_link_prediction, q50_big, q99_swing; a
# degraded probe after query 2 bounds the segment holding q50_big and
# q99_swing.
rc, out = run_bt(sidecar({**base, "q50_big": 21.0},
                         mid=[{"pos": 2, "sec": 2.5}]), sidecar(base))
check("mid-degraded segment: 3x flag discounted, exit 0",
      rc == 0 and "DISCOUNTED" in out and "q50_big" in out
      and "degraded segment" in out, out[-500:])

# 10. a flag OUTSIDE the degraded segment still fires: the window was
# probed degraded after query 1 and healthy again after query 2, so
# q50_big (position 3, bounded by healthy probes) is a real regression
rc, out = run_bt(sidecar({**base, "q50_big": 21.0},
                         mid=[{"pos": 1, "sec": 2.5}, {"pos": 2, "sec": 0.3}]),
                 sidecar(base))
check("flag in a healthy segment still fires despite a degraded earlier one",
      rc == 1 and "REGRESSION GUARD" in out and "q50_big" in out, out[-500:])

# 11. a healthy mid probe changes nothing: real flag still exits 1
rc, out = run_bt(sidecar({**base, "q50_big": 21.0},
                         mid=[{"pos": 2, "sec": 0.3}]), sidecar(base))
check("healthy mid probe: real flag still fires",
      rc == 1 and "q50_big" in out and "DISCOUNTED" not in out)

# 12. CPU-kernel sentinel (round-19): a degraded current cpu probe
# fails the close even when every shuffle probe is healthy — exactly
# the r18 uniform ~20% mode.
rc, out = run_bt(sidecar(base, cpu=(0.45, 1.3)), sidecar(base))
check("degraded current CPU sentinel warns + exit 1",
      rc == 1 and "CPU-STEAL WINDOW" in out, out[-400:])
rc, out = run_bt(sidecar(base, cpu=(0.45, 0.62)), sidecar(base))
check("healthy CPU sentinels render + exit 0",
      rc == 0 and "CPU-kernel sentinel" in out, out[-400:])
# degraded prior cpu probe warns without failing
rc, out = run_bt(sidecar(base, cpu=(0.45, 0.5)),
                 sidecar(base, cpu=(1.4, 0.5)))
check("degraded prior CPU sentinel warns, exit 0",
      rc == 0 and "CPU-STEAL WINDOW" in out, out[-400:])

# 13. a cpu-degraded mid probe discounts segment flags like a shuffle
# one (the shuffle value at the same site is healthy)
rc, out = run_bt(sidecar({**base, "q50_big": 21.0},
                         mid=[{"pos": 2, "sec": 0.3, "cpu": 1.5}]),
                 sidecar(base))
check("cpu-degraded mid probe discounts the segment flag, exit 0",
      rc == 0 and "DISCOUNTED" in out and "q50_big" in out, out[-500:])

# 14. discounted flags land in the automation flag file with their own
# status (ADVICE r18 #3) and guard_triage consumes them
flag_doc = json.load(open("/tmp/test_guard_flags.json"))
check("discounted entry written to flag file with status",
      [e["query"] for e in flag_doc.get("discounted", [])] == ["q50_big"]
      and flag_doc["discounted"][0].get("status") == "discounted"
      and flag_doc.get("flags") == [], str(flag_doc))

# 8. guard_triage verdict rule
sys.path.insert(0, HERE)
import importlib
gt = importlib.import_module("guard_triage")
check("triage: 2x ratio regression confirmed",
      gt.still_regressed(4.0, 1.9))
check("triage: q233 calibration (+2.75s at 1.16x) is clean",
      not gt.still_regressed(20.07, 17.32))
check("triage: r16-q120-class (+2s at 1.28x) confirmed",
      gt.still_regressed(9.2, 7.19))

print()
if failures:
    print(f"{len(failures)} FAILURE(S): {failures}")
    sys.exit(1)
print("all guard-tool checks pass")
