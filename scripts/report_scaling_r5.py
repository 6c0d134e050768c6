#!/usr/bin/env python
"""Summarize build/scaling_r5.jsonl with the PRE-REGISTERED clean-pair
criterion: a pair is CLEAN iff BOTH legs measured co-tenant CPU < 5% of
the leg's own CPU (objective /proc accounting — see
scripts/_scaling_child.py), with no load-average eyeballing and no
best-vs-best pooling needed. All pairs print regardless."""

import json
import os
import statistics as st
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "build", "scaling_r5.jsonl")

CLEAN_FRAC = 0.05

rows = [json.loads(l) for l in open(PATH)]
rows = [r for r in rows if "error" not in r]


def clean(r):
    return r["cotenant_cpu_s"] < CLEAN_FRAC * max(r["self_cpu_s"], 1.0)


by_level = {}
for r in rows:
    by_level.setdefault(r["level"], []).append(r)

print("== per-level distribution (ups k/s; * = clean leg) ==")
for lvl, rs in sorted(by_level.items()):
    marks = " ".join(
        f"{x['ups']/1000:.0f}{'*' if clean(x) else ''}" for x in rs)
    print(f"{lvl:12s} n={len(rs)}  {marks}")

cans = [c for r in rows for c in r.get("canary_sec", [])]
if cans:
    print(f"\ncanary spread: min={min(cans):.3f}s max={max(cans):.3f}s "
          f"(a leg whose canaries exceed min by >15% ran in a "
          f"host-contended window even if cotenant_cpu_s ~ 0)")

# 32-process parallel canary: host-level many-core availability. A leg
# is host-starved when its slowest worker ran >2x the session's best
# min (workers descheduled mid-loop: the host lacked physical cores in
# that window even though guest /proc showed it idle).
par_mins = [min(p) for r in rows for p in r.get("canary_par", [])]
PAR_BEST = min(par_mins) if par_mins else None


def host_ok(r):
    probes = r.get("canary_par")
    if not probes or PAR_BEST is None:
        return None  # instrument not present on this leg
    return all(max(p) <= 2.0 * PAR_BEST for p in probes)


if PAR_BEST is not None:
    n_inst = sum(1 for r in rows if r.get("canary_par"))
    n_bad = sum(1 for r in rows if host_ok(r) is False)
    print(f"parallel canary: best per-worker {PAR_BEST:.3f}s; "
          f"{n_bad}/{n_inst} instrumented legs host-starved "
          f"(slowest worker >2x best)")
mixes = [(r["level"], r["jvm_cpu_s"], r["pyworker_cpu_s"]) for r in rows
         if r.get("jvm_cpu_s") is not None]
if mixes:
    tot_j = sum(m[1] for m in mixes)
    tot_p = sum(m[2] for m in mixes)
    print(f"jvm:python CPU mix across legs: "
          f"{tot_j/(tot_j+tot_p):.0%}:{tot_p/(tot_j+tot_p):.0%}")

PAIRS = [("control", "ctl-4@8", "ctl-16@32"),
         ("disjoint", "dis-4@8", "dis-16@32"),
         ("executors", "exec-1x8@8", "exec-4x8@32"),
         ("plain", "plain-8@8", "plain-32@32")]

print("\n== per-iteration efficiencies ==")
effs = {name: [] for name, _, _ in PAIRS}
clean_effs = {name: [] for name, _, _ in PAIRS}
for it in sorted({r["iter"] for r in rows}):
    ir = {r["level"]: r for r in rows if r["iter"] == it}
    line = f"i{it}:"
    for name, lo, hi in PAIRS:
        if lo in ir and hi in ir:
            e = ir[hi]["ups"] / ir[lo]["ups"] / 4
            effs[name].append(e)
            is_clean = clean(ir[lo]) and clean(ir[hi])
            if is_clean:
                clean_effs[name].append(e)
            hmark = ""
            hs = [host_ok(ir[lo]), host_ok(ir[hi])]
            if False in hs:
                hmark = "!"  # host-starved window on a leg
            elif hs == [True, True]:
                hmark = "h"  # both legs host-verified
            line += (f"  {name}={e:.3f}{'*' if is_clean else ''}{hmark}"
                     f" (cot {ir[lo]['cotenant_cpu_s']:.0f}/"
                     f"{ir[hi]['cotenant_cpu_s']:.0f}s)")
    print(line)

print("\n== summary (all / clean-only) ==")
for name, _, _ in PAIRS:
    a, c = effs[name], clean_effs[name]

    def span(v):
        if not v:
            return "n/a"
        return f"min={min(v):.3f} med={st.median(v):.3f} max={max(v):.3f} n={len(v)}"
    print(f"{name:9s} all: {span(a)}   clean: {span(c)}")

weak = [r for r in rows if r["level"] == "weak-32@32"]
if weak:
    base = [x for x in by_level.get("plain-32@32", []) if clean(x)]
    base_ups = max(x["ups"] for x in base) if base else None
    print("\n== weak scaling (96M @ 32c) ==")
    for w in weak:
        rel = f" rel-16M/6={w['ups']/base_ups:.2f}" if base_ups else ""
        print(f"ups={w['ups']/1000:.0f}k clean={clean(w)}"
              f" cot={w['cotenant_cpu_s']:.0f}s{rel}")
