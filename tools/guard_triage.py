#!/usr/bin/env python3
"""Automated close-time guard triage (VERDICT r16 #2).

The regression guard (tools/bench_table.py) flags shared queries over
threshold and writes the flag set to /tmp/graft_guard_flags.json. For
three straight rounds the follow-up was run by hand: fresh-JVM re-time
each flagged query under SPARK_GRAFT_ONLY, compare against the prior
floor, write the verdict table into BENCH_TABLE_r{N}.md. This script IS
that protocol:

  1. reads the guard's flag set (or --queries for an ad-hoc list),
  2. launches ONE fresh JVM via tools/bench_fresh.sh with
     SPARK_GRAFT_ONLY=<flagged queries> (each query still gets the
     full warm-up + cleanup + min-of-2/3 discipline inside Bench; the
     sidecar goes to /tmp, never the repo artifact),
  3. renders the floor-vs-flag markdown table (append to
     BENCH_TABLE_r{N}.md with --append-to),
  4. appends one event per query to tools/triage_history.json — the
     ledger bench_table.py mines for PIN-CANDIDATE proposals (the
     "flagged twice + re-timed clean twice -> alwaysMinOf3" rule that
     pinned q254/q236 by hand).

Verdict rule per query: "clean" when the fresh-JVM re-time does NOT
itself trip the guard thresholds vs the prior floor (ratio >1.5x AND
the 1.5s/1.0s floors, or the +2s absolute trigger) — i.e. the full-run
number was GC/box luck; "regressed" otherwise — a plan or code change
to chase before closing. With no recorded floor the re-time is compared
against the flagged value alone (clean = re-time < flagged/1.5).

Usage:
  python3 tools/guard_triage.py                      # consume guard flags
  python3 tools/guard_triage.py --queries q25_media_features,...
  python3 tools/guard_triage.py --append-to BENCH_TABLE_r17.md
  python3 tools/guard_triage.py --sf /root/testdata/sf0.1 --round r17
Exit codes: 0 all clean; 1 any query re-timed regressed; 2 nothing to
triage / harness failure.
"""
import argparse
import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FLAGS_IN = os.environ.get("GRAFT_GUARD_FLAGS_OUT",
                          "/tmp/graft_guard_flags.json")
HISTORY = os.path.join(HERE, "triage_history.json")
TRIAGE_SIDECAR = "/tmp/graft_triage_times.json"
# Same thresholds as bench_table.py (kept in lockstep — a flag must be
# judged by the rule that raised it).
REGRESSION_FACTOR = 1.5
MIN_CUR_SEC = 1.5
MIN_DELTA_SEC = 1.0
ABS_CUR_SEC = 2.0
ABS_DELTA_SEC = 2.0


def still_regressed(retime, floor):
    ratio = (retime > REGRESSION_FACTOR * floor
             and retime >= MIN_CUR_SEC and retime - floor >= MIN_DELTA_SEC)
    # The absolute branch needs a relative margin HERE that the guard
    # deliberately omits: the guard flags any >=2s mover off a cheap
    # full-run artifact (sensitive), while this controlled verdict must
    # not call normal big-query variance a regression (specific). On
    # this box queries in the 15-30s class swing several seconds on
    # byte-identical code (q233's recorded controlled band is 19-27s,
    # and its r17 flag re-timed at 20.07s vs a 17.32s best-ever floor —
    # +2.75s, 1.16x: variance, not a plan change). 1.25x keeps the real
    # cases: the r16 q120 regression re-timed at 1.28x its floor.
    absolute = (retime >= ABS_CUR_SEC and retime - floor >= ABS_DELTA_SEC
                and retime > 1.25 * floor)
    return ratio or absolute


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", help="comma list; default: guard flag file")
    ap.add_argument("--flags", default=FLAGS_IN)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--round", default="",
                    help="round label for the history ledger, e.g. r17")
    ap.add_argument("--append-to", help="markdown file to append the table to")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the launch command and exit")
    args = ap.parse_args()

    flags = {}  # query -> {cur_sec, prior_floor}
    if args.queries:
        for q in args.queries.split(","):
            if q.strip():
                flags[q.strip()] = {"cur_sec": None, "prior_floor": None}
    else:
        if not os.path.exists(args.flags):
            print(f"nothing to triage: no flag file at {args.flags} "
                  f"(guard was clean, or pass --queries)")
            return 2
        doc = json.load(open(args.flags))
        # 'discounted' entries (round-19, ADVICE r18 #3) are flags that
        # fell inside a degraded-sentinel segment: the guard excluded
        # them from its exit code, but they still need a healthy-window
        # re-adjudication — triage them exactly like live flags.
        for f in doc.get("flags", []) + doc.get("discounted", []):
            flags[f["query"]] = {"cur_sec": f.get("cur_sec"),
                                 "prior_floor": f.get("prior_floor")}
    if not flags:
        print("nothing to triage: empty flag set")
        return 2

    names = sorted(flags)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=args.sf,
               SPARK_GRAFT_CPUS=args.cpus,
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_OUT=TRIAGE_SIDECAR)
    cmd = [os.path.join(HERE, "bench_fresh.sh")]
    if args.dry_run:
        print("would run:", " ".join(
            f"{k}={env[k]}" for k in ("SPARK_GRAFT_SF_DIR", "SPARK_GRAFT_CPUS",
                                      "SPARK_GRAFT_ONLY",
                                      "SPARK_GRAFT_BENCH_OUT")), cmd[0])
        return 0
    print(f"fresh-JVM re-time of {len(names)} flagged quer"
          f"{'y' if len(names) == 1 else 'ies'} at {args.sf} "
          f"(one JVM, full Bench warm-up/cleanup/min-of-N discipline)...")
    r = subprocess.run(cmd, env=env, cwd=REPO,
                       stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                       text=True)
    if r.returncode != 0:
        print(f"bench_fresh.sh failed (exit {r.returncode}):\n"
              + r.stderr[-2000:])
        return 2
    side = json.load(open(TRIAGE_SIDECAR))
    retimes = side.get("queries", {})
    samples = side.get("samples", {})
    sent = (side.get("sentinel_pre"), side.get("sentinel_post"))

    now = datetime.datetime.now(datetime.timezone.utc)

    # A stale/old-format sidecar (pre-round-16 jar) carries no sentinel
    # fields; render them as "—" instead of raising TypeError AFTER the
    # expensive fresh-JVM re-time completed (ADVICE r17 #3).
    def fmt_sent(v):
        return f"{v:.2f}" if isinstance(v, (int, float)) else "—"

    lines = [
        "",
        f"### Guard triage (automated, {now:%Y-%m-%d %H:%M} UTC, "
        f"sentinels {fmt_sent(sent[0])}/{fmt_sent(sent[1])}s)",
        "",
        "| query | flagged sec | prior floor | fresh-JVM re-time | verdict |",
        "|---|---|---|---|---|",
    ]
    events, any_regressed = [], False
    for q in names:
        rt = retimes.get(q)
        floor = flags[q]["prior_floor"]
        cur = flags[q]["cur_sec"]
        if rt is None or rt < 0:
            verdict = "RE-TIME FAILED"
            any_regressed = True
        elif floor is not None and floor > 0:
            verdict = ("REGRESSED — chase before closing"
                       if still_regressed(rt, floor) else "clean (GC/box luck)")
            any_regressed |= verdict.startswith("REGRESSED")
        else:
            verdict = ("clean (GC/box luck)"
                       if cur is None or rt < cur / REGRESSION_FACTOR
                       else "inconclusive — no recorded floor")
            any_regressed |= verdict.startswith("inconclusive")
        n = samples.get(q)
        rt_s = f"{rt:.2f}s (min-of-{n})" if rt is not None and rt >= 0 else "—"
        lines.append(
            f"| {q} | {'—' if cur is None else f'{cur:.2f}'} "
            f"| {'—' if floor is None else f'{floor:.2f}'} "
            f"| {rt_s} | {verdict} |")
        # Ad-hoc --queries runs never tripped the guard: ledger them
        # under a distinct verdict so repeated A/B re-times cannot feed
        # the PIN-CANDIDATE "flagged twice + re-timed clean twice"
        # counter in bench_table.py (ADVICE r17 #1). Only genuine
        # flag-then-clean events count as "clean".
        ledger_verdict = ("clean" if verdict.startswith("clean")
                          else "regressed" if verdict.startswith("REGRESSED")
                          else "inconclusive")
        if args.queries:
            ledger_verdict = "adhoc-" + ledger_verdict
        events.append({
            "round": args.round or f"adhoc-{now:%Y%m%d}",
            "query": q,
            "flagged_sec": cur,
            "prior_floor": floor,
            "retimed_sec": None if rt is None or rt < 0 else round(rt, 3),
            "verdict": ledger_verdict,
            "sentinels": [sent[0], sent[1]],
        })
    table = "\n".join(lines) + "\n"
    print(table)
    if args.append_to:
        with open(os.path.join(REPO, args.append_to), "a") as f:
            f.write(table)
        print(f"appended to {args.append_to}")

    hist = (json.load(open(HISTORY)) if os.path.exists(HISTORY)
            else {"events": []})
    hist["events"].extend(events)
    with open(HISTORY, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"{len(events)} event(s) appended to {os.path.relpath(HISTORY, REPO)}"
          f" — bench_table.py proposes PIN-CANDIDATEs from it.")
    return 1 if any_regressed else 0


if __name__ == "__main__":
    sys.exit(main())
