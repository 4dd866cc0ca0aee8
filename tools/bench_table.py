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
  exit means triage (tools/guard_triage.py, or the manual fresh-JVM
  protocol in the verify skill) before closing.
- an ABSOLUTE-DELTA TRIGGER (VERDICT r16 #3): a query >=2s that moves
  >=2s absolute flags regardless of ratio — q120's +2.99s at 1.42x
  slid under the ratio-only guard for a round.
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
- SENTINEL WARNINGS (ADVICE r16 #3): a current-run sentinel that
  failed (-1) or sits above the band ceiling prints an explicit
  DEGRADED-BOX / FAILED warning and fails the close (exit 1) — the
  one condition the sentinel exists to surface no longer relies on a
  human noticing the number. Ceiling: GRAFT_SENTINEL_CEILING env
  (default 0.9s; recorded healthy band is ~0.2-0.6s). Degraded PRIOR
  sentinels warn without failing: they discredit the floor, not the
  current run.
- PIN-CANDIDATE PROPOSALS (VERDICT r16 #5): the rule the builder
  applied by hand to q254/q236 — "flagged twice + re-timed clean
  twice across recorded rounds -> pin into Bench.alwaysMinOf3" — now
  runs on tools/triage_history.json (appended by guard_triage.py).
  Already-pinned queries are read from the CURRENT sidecar's
  always_min_of_3 field (written by Bench since round 17), not from a
  drift-prone copy here.
- a FLAGS SIDECAR for automation: when the guard fires, the flag set
  is also written as JSON (default /tmp/graft_guard_flags.json,
  override GRAFT_GUARD_FLAGS_OUT) so tools/guard_triage.py re-times
  exactly what the guard saw.

Usage: bench_table.py CURRENT.json [PRIOR.json ...]
Exit codes: 0 clean; 1 regression flags or degraded/failed current
sentinel (triage before closing); 2 misuse (no prior sidecar).
"""
import json
import os
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
# Absolute-delta trigger (VERDICT r16 #3): big movers on big queries
# flag even at a sub-1.5x ratio.
ABS_CUR_SEC = 2.0
ABS_DELTA_SEC = 2.0
SENTINEL_CEILING = float(os.environ.get("GRAFT_SENTINEL_CEILING", "0.9"))
# CPU-kernel sentinel ceiling (round-19, VERDICT r18 #1): the r18 close
# documented a uniform ~20% box mode the SHUFFLE probe cannot see
# (probes 0.20-0.29 while untouched queries inflated 1.4-2x). Bench now
# times a fixed 32-thread SplitMix64 kernel beside each shuffle probe
# (cpu_sentinel_pre/post + "cpu" in sentinel_mid); calibrated floor
# 0.42s, healthy min-of-3 spread 0.42-0.65s on this box.
CPU_SENTINEL_CEILING = float(os.environ.get("GRAFT_CPU_SENTINEL_CEILING",
                                            "0.9"))
FLAGS_OUT = os.environ.get("GRAFT_GUARD_FLAGS_OUT",
                           "/tmp/graft_guard_flags.json")
HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "triage_history.json")
PIN_THRESHOLD = 2  # flagged-then-retimed-clean events before proposing a pin

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
# are box, not plan. Renders whenever the sidecar carries the fields;
# a failed (-1) or above-ceiling value gets an explicit warning
# (ADVICE r16 #3) instead of relying on a human reading the number.
sentinel_alarm = False  # current-run only: fails the close
sent = [(r.get("sentinel_pre"), r.get("sentinel_post"), lbl)
        for r, lbl in [(cur, "current")] +
        [(p, f"prior#{i + 1}") for i, p in enumerate(priors)]
        if r.get("sentinel_pre") is not None
        and r.get("sentinel_post") is not None]
if sent:
    print("\nBox sentinel (fixed lineitem groupBy, min-of-3): " + "; ".join(
        f"{lbl} pre {a:.2f}s / post {b:.2f}s" for a, b, lbl in sent) + ".")
    for a, b, lbl in sent:
        for which, v in (("pre", a), ("post", b)):
            msg = None
            if v < 0:
                msg = (f"WARNING: sentinel FAILED — {lbl} {which} probe "
                       f"threw in all 3 samples; box health for that run "
                       f"is UNKNOWN")
            elif v > SENTINEL_CEILING:
                msg = (f"WARNING: DEGRADED-BOX WINDOW suspected — {lbl} "
                       f"{which} sentinel {v:.2f}s is above the "
                       f"{SENTINEL_CEILING:.2f}s ceiling (healthy band "
                       f"~0.2-0.6s); outliers in that run are box, not plan")
            if msg:
                print("\n" + msg + ".")
                if lbl == "current":
                    sentinel_alarm = True

# CPU-kernel sentinel (round-19): the shuffle probe is latency-bound
# and blind to uniform CPU-steal windows; the fixed 32-thread kernel
# reads sustained throughput directly. Same alarm semantics: a current
# run above the ceiling fails the close, degraded priors only warn.
cpu_sent = [(r.get("cpu_sentinel_pre"), r.get("cpu_sentinel_post"), lbl)
            for r, lbl in [(cur, "current")] +
            [(p, f"prior#{i + 1}") for i, p in enumerate(priors)]
            if r.get("cpu_sentinel_pre") is not None
            and r.get("cpu_sentinel_post") is not None]
if cpu_sent:
    print("\nCPU-kernel sentinel (32-thread SplitMix64, min-of-3): "
          + "; ".join(f"{lbl} pre {a:.2f}s / post {b:.2f}s"
                      for a, b, lbl in cpu_sent) + ".")
    for a, b, lbl in cpu_sent:
        for which, v in (("pre", a), ("post", b)):
            if v is not None and v > CPU_SENTINEL_CEILING:
                print(f"\nWARNING: CPU-STEAL WINDOW suspected — {lbl} "
                      f"{which} cpu sentinel {v:.2f}s is above the "
                      f"{CPU_SENTINEL_CEILING:.2f}s ceiling (calibrated "
                      f"floor 0.42s, healthy spread 0.42-0.65s); the "
                      f"shuffle probe CANNOT see this mode — outliers in "
                      f"that run are box, not plan.")
                if lbl == "current":
                    sentinel_alarm = True

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


def flagged(k, c, p):
    ratio = (c > REGRESSION_FACTOR * p
             and c >= MIN_CUR_SEC and c - p >= MIN_DELTA_SEC)
    # The absolute trigger is SHIPPING-TIER ONLY: the two diagnostic
    # exact references swing several seconds on byte-identical code
    # (q233's recorded controlled band is 19-27s vs a 17.32s best-ever
    # floor — any +-2s rule anchored on a best-ever floor flags that
    # noise every round; its r17 flag burned three controlled re-times
    # to adjudicate). They stay ratio-guarded at 1.5x like everything
    # else.
    absolute = (k not in DIAGNOSTIC
                and c >= ABS_CUR_SEC and c - p >= ABS_DELTA_SEC)
    return ratio or absolute


flags = [(k, cq[k], pq[k]) for k in cq
         if k in pq and pq[k] > 0 and cq[k] > 0 and flagged(k, cq[k], pq[k])]

# --- degraded-segment discount (VERDICT r17 #2) ---
# Bench interleaves a sentinel probe every 50 queries (sentinel_mid,
# round 18): the r17 close carried healthy ENDPOINT sentinels around a
# mid-run degraded window that inflated an adjacent-alphabet cluster
# 2-2.9x. A flag whose query ran inside a segment bounded by a degraded
# probe (> ceiling) is box inflation, not a plan change: report it as
# DISCOUNTED and keep it out of the exit code and the automation flag
# file — no fresh-JVM re-time needed. Failed probes (-1) give no
# evidence either way and never discount.
_order = sorted(cq)
_pos = {k: i + 1 for i, k in enumerate(_order)}
# each probe site carries (pos, shuffle_sec, cpu_sec); cpu is None on
# pre-round-19 artifacts. A site is degraded when EITHER probe type is
# above its ceiling — the r18 uniform mode was visible only to cpu.
_probes = sorted(
    [(0, cur.get("sentinel_pre"), cur.get("cpu_sentinel_pre")),
     (len(_order), cur.get("sentinel_post"), cur.get("cpu_sentinel_post"))] +
    [(m.get("pos"), m.get("sec"), m.get("cpu"))
     for m in cur.get("sentinel_mid", [])])
_probes = [(p, v, c) for p, v, c in _probes
           if p is not None and (v is not None or c is not None)]


def _site_degraded(v, c):
    return ((v is not None and v > SENTINEL_CEILING)
            or (c is not None and c > CPU_SENTINEL_CEILING))


def in_degraded_segment(k):
    i = _pos[k]
    lower = [(v, c) for p, v, c in _probes if p < i]
    upper = [(v, c) for p, v, c in _probes if p >= i]
    bounds = ([lower[-1]] if lower else []) + ([upper[0]] if upper else [])
    return any(_site_degraded(v, c) for v, c in bounds)


degraded_mid = [(p, v, c) for p, v, c in _probes
                if 0 < p < len(_order) and _site_degraded(v, c)]
if degraded_mid:
    print("\nWARNING: DEGRADED-BOX WINDOW mid-run — probe site(s) "
          + ", ".join(
              f"shuffle {v if v is not None else -1:.2f}s / cpu "
              f"{c if c is not None else -1:.2f}s after query {p}"
              for p, v, c in degraded_mid)
          + f" above ceiling (shuffle {SENTINEL_CEILING:.2f}s / cpu "
          f"{CPU_SENTINEL_CEILING:.2f}s); flags inside the "
          f"affected segment(s) are discounted below, but segment totals "
          f"are inflated — prefer a healthy-window re-run for a close "
          f"artifact.")

discounted = [f for f in flags if in_degraded_segment(f[0])]
flags = [f for f in flags if not in_degraded_segment(f[0])]
if discounted:
    print(f"\n## DISCOUNTED FLAGS: {len(discounted)} quer"
          f"{'y' if len(discounted) == 1 else 'ies'} over threshold inside "
          f"a degraded-sentinel segment (box, not plan — no re-time "
          f"needed)\n")
    for k, c, p in sorted(discounted, key=lambda t: t[1] / t[2], reverse=True):
        print(f"- {k}: {p:.2f}s -> {c:.2f}s ({c / p:.2f}x) [discounted: "
              f"degraded segment]")

if flags:
    print(f"\n## REGRESSION GUARD: {len(flags)} shared quer"
          f"{'y' if len(flags) == 1 else 'ies'} over threshold "
          f"(>{REGRESSION_FACTOR}x, or +{ABS_DELTA_SEC:.0f}s absolute on a "
          f">={ABS_CUR_SEC:.0f}s query) vs min of {len(priors)} prior "
          f"run(s)\n")
    for k, c, p in sorted(flags, key=lambda t: t[1] / t[2], reverse=True):
        note = ""
        if c <= REGRESSION_FACTOR * p:
            note = " [absolute-delta trigger]"
        if cs.get(k) is not None and ps.get(k) is not None \
                and cs.get(k) != ps.get(k):
            note += (f" [sampling changed: min-of-{ps[k]} prior vs "
                     f"min-of-{cs[k]} now — statistic differs]")
        print(f"- **{k}**: {p:.2f}s -> {c:.2f}s ({c / p:.2f}x){note} — "
              f"fresh-JVM re-time before closing "
              f"(tools/guard_triage.py, or see "
              f".claude/skills/verify/SKILL.md)")
else:
    print(f"\nRegression guard: clean (no shared query "
          f">{REGRESSION_FACTOR}x or +{ABS_DELTA_SEC:.0f}s-absolute vs "
          f"the min of {len(priors)} prior run(s)).")

# Automation flag file: live flags AND discounted ones (ADVICE r18 #3 —
# a discounted flag used to vanish from the file entirely, so a genuine
# plan regression landing in a degraded segment had no follow-up
# mechanism; guard_triage now re-adjudicates 'discounted' entries with
# a fresh-JVM re-time in the next healthy window).
if flags or discounted:
    try:
        def _entry(k, c, p, status):
            return {"query": k, "cur_sec": c, "prior_floor": p,
                    "cur_samples": cs.get(k), "floor_samples": ps.get(k),
                    "status": status}
        with open(FLAGS_OUT, "w") as f:
            json.dump({"sf": cur.get("sf"),
                       "flags": [_entry(k, c, p, "flag")
                                 for k, c, p in flags],
                       "discounted": [_entry(k, c, p, "discounted")
                                      for k, c, p in discounted]},
                      f, indent=1)
        print(f"\nFlag set written for automation: {FLAGS_OUT} "
              f"({len(flags)} live, {len(discounted)} discounted — "
              f"consume with tools/guard_triage.py).")
    except OSError as e:
        print(f"\n(could not write {FLAGS_OUT}: {e})")
else:
    # ADVICE r19: a clean run must not leave a PREVIOUS run's flag set
    # behind for guard_triage to re-adjudicate — remove it.
    try:
        if os.path.exists(FLAGS_OUT):
            os.remove(FLAGS_OUT)
            print(f"\n(stale flag set removed: {FLAGS_OUT})")
    except OSError as e:
        print(f"\n(could not remove stale {FLAGS_OUT}: {e})")

# --- pin candidates (VERDICT r16 #5) ---
# A query that keeps flagging and keeps re-timing clean is a chronic
# GC-luck swinger: after PIN_THRESHOLD recorded clean-retime events it
# should sample min-of-3 every run. The history ledger is appended by
# guard_triage.py; already-pinned queries come from the sidecar.
pinned = set(cur.get("always_min_of_3", []))
if os.path.exists(HISTORY_PATH):
    hist = json.load(open(HISTORY_PATH))
    clean_counts = {}
    for ev in hist.get("events", []):
        if ev.get("verdict") == "clean":
            q = ev["query"]
            clean_counts[q] = clean_counts.get(q, 0) + 1
    # suppress queries already sampling min-of-3 in the current
    # artifact — pinned ones, and the >3s tier Bench bumps to a third
    # sample automatically (q233-class: a pin would be a no-op)
    cands = sorted(q for q, n in clean_counts.items()
                   if n >= PIN_THRESHOLD and q not in pinned
                   and cs.get(q) != 3)
    for q in cands:
        print(f"\nPIN-CANDIDATE: {q} flagged + re-timed clean "
              f"{clean_counts[q]} times across recorded rounds — add to "
              f"Bench.alwaysMinOf3 (the q254/q236 rule).")
    if not pinned and cands:
        print("\n(note: current sidecar carries no always_min_of_3 field — "
              "pre-round-17 artifact; candidates above may already be "
              "pinned in Bench.scala)")

sys.exit(1 if (flags or sentinel_alarm) else 0)
