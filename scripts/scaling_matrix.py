#!/usr/bin/env python
"""Run the N-vs-4N scaling matrix leg by leg, appending one JSON line per
leg to build/scaling_r3.jsonl so a partial run still yields data. Legs
alternate across pairs (a co-tenant load burst cannot bias one side).

Levels: plain pair local[8]@8-pins vs local[32]@32-pins, plus the
core-sharing control pair local[4]@8-pins vs local[16]@32-pins (python
workers get dedicated headroom — the honest model of a cluster that
provisions executor cores for python workers explicitly)."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _scaling_leg  # noqa: E402

OUT = os.path.join(REPO, "build", "scaling_r3.jsonl")


def main():
    n_urls = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "16000000"))
    pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "2"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "4"))
    levels = [("8", 8), ("32", 32), ("4", 8), ("16", 32)]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for p in range(pairs):
        for spark_cores, pin in levels:
            load0 = os.getloadavg()[0]
            t0 = time.time()
            leg = _scaling_leg(spark_cores, pin, n_urls, runs)
            rec = {
                "pair": p,
                "level": f"{spark_cores}@{pin}",
                "sec": leg["sec"],
                "ups": leg["ups"],
                "load_before": round(load0, 2),
                "wall": round(time.time() - t0, 1),
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
