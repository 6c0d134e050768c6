#!/usr/bin/env python
"""Summarize build/scaling_r4.jsonl: per-level distributions, per-quartet
efficiencies, and the full (unselected) picture for BENCH/BASELINE.md."""

import json
import os
import statistics as st
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "build", "scaling_r4.jsonl")

rows = [json.loads(l) for l in open(PATH)]
by_level = {}
for r in rows:
    by_level.setdefault(r["level"], []).append(r)

print("== per-level distribution (ups, k/s) ==")
for lvl, rs in sorted(by_level.items()):
    ups = sorted(x["ups"] / 1000 for x in rs)
    print(f"{lvl:12s} n={len(ups)} min={ups[0]:.0f} med={st.median(ups):.0f} "
          f"max={ups[-1]:.0f} loads_at_start="
          + ",".join(str(x["load_at_start"]) for x in rs))

quartets = sorted({r["quartet"] for r in rows if r["level"] != "32@32-weak"})
print("\n== per-quartet efficiencies ==")
plain_effs, ctrl_effs = [], []
for q in quartets:
    qr = {r["level"]: r for r in rows if r.get("quartet") == q
          and r["level"] != "32@32-weak"}
    line = f"q{q}:"
    if "8@8" in qr and "32@32" in qr:
        e = qr["32@32"]["ups"] / qr["8@8"]["ups"] / 4
        plain_effs.append(e)
        line += f" plain={e:.3f} (loads {qr['8@8']['load_at_start']}/{qr['32@32']['load_at_start']})"
    if "4@8" in qr and "16@32" in qr:
        e = qr["16@32"]["ups"] / qr["4@8"]["ups"] / 4
        ctrl_effs.append(e)
        line += f" control={e:.3f} (loads {qr['4@8']['load_at_start']}/{qr['16@32']['load_at_start']})"
    print(line)

def span(v):
    return f"min={min(v):.3f} med={st.median(v):.3f} max={max(v):.3f}" if v else "n/a"

print("\nplain  eff:", span(plain_effs))
print("control eff:", span(ctrl_effs))

# best-vs-best (the run_scaling reporting rule: best leg per level)
if "8@8" in by_level and "32@32" in by_level:
    bb = max(x["ups"] for x in by_level["32@32"]) / max(
        x["ups"] for x in by_level["8@8"]) / 4
    print(f"plain  best-vs-best: {bb:.3f}")
if "4@8" in by_level and "16@32" in by_level:
    bb = max(x["ups"] for x in by_level["16@32"]) / max(
        x["ups"] for x in by_level["4@8"]) / 4
    print(f"control best-vs-best: {bb:.3f}")

weak = [r for r in rows if r["level"] == "32@32-weak"]
if weak:
    base = max(x["ups"] for x in by_level.get("32@32", [])) if "32@32" in by_level else None
    print("\n== weak scaling (96M @ 32c) ==")
    for w in weak:
        rel = f" rel16M={w['ups']/base:.2f}" if base else ""
        print(f"ups={w['ups']/1000:.0f}k load_start={w['load_at_start']}"
              f" load_after={w['load_after']}{rel}")
