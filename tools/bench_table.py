#!/usr/bin/env python3
"""Render the >=1s slice of bench_times.json against a prior round's
sidecar as a markdown table (the VERDICT r12 #7 record), with:

- a DIAGNOSTIC TIER split (VERDICT r14 #5): q233/q210 are exact
  all-pairs evaluation references whose 100 TB paths are the graded
  twins q251/q257 — they stay correctness-graded and timed, but in a
  separate section so the headline s/q tracks shipping plans.
- a PER-QUERY REGRESSION GUARD (VERDICT r14 #3): any shared query
  >1.5x its prior time is flagged loudly and the script exits 1, so a
  q239-style regression cannot ship unnoticed behind a green total.
  Run order in the close: bench -> bench_table -> commit; a nonzero
  exit means triage (fresh-JVM re-time per the verify skill) before
  closing.
- MULTIPLE PRIOR SIDECARS (VERDICT r15 #4): every extra argv is a
  prior run; the guard compares against the MIN across all of them,
  so one slow prior run (GC/box luck) cannot manufacture a phantom
  regression and one fast current run cannot hide a real one. Pass
  both recorded runs of the prior round when available, e.g.
  `bench_table.py cur.json prev_close.json prev_driver.json`.
- SAMPLE-COUNT ANNOTATION (ADVICE r15 #4): when a flagged query's
  min-of-N tier differs between current and the prior run that set
  its floor, the row says so — the statistic changed, not only the
  plan.

Usage: bench_table.py CURRENT.json [PRIOR.json ...]
"""
import json
import sys

# Exact all-pairs diagnostics kept deliberately as evaluation references;
# their scale twins (q251 hub-capped wedges, q257 hash-sampled hubness)
# are the shipping plans. Still graded, still timed — reported apart.
DIAGNOSTIC = {"q233_link_prediction", "q210_knn_hubness"}
REGRESSION_FACTOR = 1.5
# Noise floors: sub-1.5s queries routinely swing 2x with GC/eviction
# luck on this box (measured across the two same-day r14 runs), so the
# ratio alone would flag ~20 phantom regressions per close. A real
# q239-class regression (1.86s -> 3.79s) clears both floors easily.
MIN_CUR_SEC = 1.5
MIN_DELTA_SEC = 1.0

cur = json.load(open(sys.argv[1]))
priors = [json.load(open(p)) for p in sys.argv[2:]]
cq = cur.get("queries", {})
cs = cur.get("samples", {})
# per-query min across all prior runs (ignoring failed/-1 entries),
# remembering which run set the floor so sample counts can be compared
pq, ps = {}, {}
for prior in priors:
    for k, v in prior.get("queries", {}).items():
        if v > 0 and (k not in pq or v < pq[k]):
            pq[k] = v
            ps[k] = prior.get("samples", {}).get(k)


def render(keys, title):
    rows = sorted(((cq[k], k) for k in keys if cq[k] >= 1.0), reverse=True)
    if not rows:
        return
    print(f"\n## {title}\n")
    print("| query | sec | prior sec | delta |")
    print("|---|---|---|---|")
    for v, k in rows:
        p = pq.get(k)
        if p is not None and p > 0:
            print(f"| {k} | {v:.2f} | {p:.2f} | {v - p:+.2f} |")
        else:
            print(f"| {k} | {v:.2f} | new | — |")


shipping = [k for k in cq if k not in DIAGNOSTIC]
render(shipping, "Shipping tier (>=1s)")
render([k for k in cq if k in DIAGNOSTIC],
       "Diagnostic tier (exact evaluation references; scale twins q251/q257 ship)")


def subtotal(keys, label):
    shared = [(k, cq[k], pq[k]) for k in keys
              if k in pq and cq[k] > 0 and pq[k] > 0]
    tot = sum(cq[k] for k in keys if cq[k] > 0)
    line = f"{label}: total {tot:.1f}s over {len(keys)} queries"
    if shared:
        st = sum(c for _, c, _ in shared)
        sp = sum(p for _, _, p in shared)
        line += (f"; shared-query subtotal {sp:.1f}s -> {st:.1f}s "
                 f"({(st - sp) / sp * 100:+.1f}%) over {len(shared)} queries")
    print("\n" + line + ".")


subtotal(shipping, "Shipping tier")
subtotal([k for k in cq if k in DIAGNOSTIC], "Diagnostic tier")
print(f"\nAll-queries total: {cur.get('value', 0):.1f}s over {len(cq)} queries.")

# Box-state sentinel (round-16): Bench times one fixed shuffle probe
# before and after the timed pass. A sentinel far above its cross-round
# band (~0.3-0.6s on this box) marks a degraded-box window — the mode
# that produced the r15 q233=58.6s artifact — so outliers in THAT run
# are box, not plan. Renders whenever the sidecar carries the fields.
sent = [(r.get("sentinel_pre"), r.get("sentinel_post"), lbl)
        for r, lbl in [(cur, "current")] +
        [(p, f"prior#{i + 1}") for i, p in enumerate(priors)]
        if r.get("sentinel_pre") is not None
        and r.get("sentinel_post") is not None]
if sent:
    print("\nBox sentinel (fixed lineitem groupBy, min-of-3): " + "; ".join(
        f"{lbl} pre {a:.2f}s / post {b:.2f}s" for a, b, lbl in sent) + ".")

# --- regression guard ---
# Vacuous-green guard (same class as plan_lint's parsed-plans floor):
# invoked with ZERO priors, pq={} and the guard below could flag
# nothing — a real regression would ship behind "clean". The close
# must pass at least one prior sidecar; exit 2 distinguishes misuse
# from a genuine regression (exit 1).
if not priors:
    print("\nHARD FAIL: no prior sidecar given — the regression guard "
          "compared against nothing. Usage: bench_table.py CURRENT.json "
          "PRIOR.json [PRIOR2.json ...]")
    sys.exit(2)
flags = [(k, cq[k], pq[k]) for k in cq
         if k in pq and pq[k] > 0 and cq[k] > 0
         and cq[k] > REGRESSION_FACTOR * pq[k]
         and cq[k] >= MIN_CUR_SEC and cq[k] - pq[k] >= MIN_DELTA_SEC]
if flags:
    print(f"\n## REGRESSION GUARD: {len(flags)} shared quer"
          f"{'y' if len(flags) == 1 else 'ies'} >"
          f"{REGRESSION_FACTOR}x min of {len(priors)} prior run(s)\n")
    for k, c, p in sorted(flags, key=lambda t: t[1] / t[2], reverse=True):
        note = ""
        if cs.get(k) is not None and ps.get(k) is not None \
                and cs.get(k) != ps.get(k):
            note = (f" [sampling changed: min-of-{ps[k]} prior vs "
                    f"min-of-{cs[k]} now — statistic differs]")
        print(f"- **{k}**: {p:.2f}s -> {c:.2f}s ({c / p:.2f}x){note} — "
              f"fresh-JVM re-time before closing "
              f"(see .claude/skills/verify/SKILL.md)")
    sys.exit(1)
print(f"\nRegression guard: clean (no shared query "
      f">{REGRESSION_FACTOR}x the min of {len(priors)} prior run(s)).")
