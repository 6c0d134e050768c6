#!/usr/bin/env python
"""Attribute the ctl-pair CPU-per-URL inflation: engine or memory system?

The round-5 control pairs (local[4]@8pins -> local[16]@32pins) lose
efficiency almost entirely as CPU-TIME inflation per unit work
(13.7 -> ~21 cpu-us/url, scaling_r5.jsonl), not as idle cores. Two
rival explanations:

  (a) engine overhead grows with parallelism (more shuffle partitions,
      coordination, GC pressure) — would indict the design;
  (b) memory stalls count as busy CPU, and 32 active workers share the
      bandwidth 8 enjoy alone (membw_r5.jsonl: per-worker bandwidth
      drops x0.77) — engine-independent hardware ceiling.

This probe separates them: run the IDENTICAL frontier leg —
local[4] pinned to cpus 0-7, same 16M-URL universe, same code, same
parallelism, same shuffle partition count — twice:

  quiet:  remaining 24 cpus idle
  hogged: 24 processes on cpus 8-31 streaming numpy sums over
          LLC-busting buffers (pure bandwidth pressure, zero scheduler
          contention with the leg's pins)

If cpu-us/url inflates under hogs by about the same factor the ctl
pairs show, the inflation is the box's memory system, not the engine:
nothing about the engine changed between the two runs. A real
cluster's 4N cores arrive with 4N/8 sockets of bandwidth, so this
component of the local efficiency loss does not transfer.

Appends JSON lines to build/stall_inflation_r5.jsonl.
"""

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "build", "stall_inflation_r5.jsonl")
N_URLS = int(os.environ.get("SPARK_GRAFT_STALL_URLS", "16000000"))
RUNS = int(os.environ.get("SPARK_GRAFT_STALL_RUNS", "3"))
REPS = int(os.environ.get("SPARK_GRAFT_STALL_REPS", "3"))
LEG_CPUS = 8          # leg envelope: cpus 0-7, local[4] (ctl-4@8 shape)
HOG_FROM, HOG_TO = 8, 32


def hog(core, stop_evt):
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(256 * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()
    while not stop_evt.is_set():
        a.sum()


def run_leg(mode):
    """One fresh-subprocess ctl-4@8 leg via scripts/_scaling_child.py
    (same pinning + /proc CPU accounting as every scaling_r5 leg)."""
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_scaling_child.py"),
         "4", str(LEG_CPUS), str(N_URLS), str(RUNS), "0"],
        capture_output=True, text=True, env=env, cwd=REPO)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    try:
        rec = json.loads(line)
    except ValueError:
        return {"mode": mode, "error":
                (r.stdout[-1500:] + "\n" + r.stderr[-1500:])}
    rec = {k: rec[k] for k in ("sec", "ups", "times", "self_cpu_s",
                               "jvm_cpu_s", "pyworker_cpu_s",
                               "cotenant_cpu_s", "canary_sec")
           if k in rec}
    rec["mode"] = mode
    rec["cpu_us_per_url"] = round(
        rec["self_cpu_s"] / (N_URLS * RUNS) * 1e6, 2)
    return rec


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    for rep in range(REPS):
        for mode in ("quiet", "hogged"):
            while os.getloadavg()[0] > 2.0:
                time.sleep(20)
            stop_evt = mp.Event()
            hogs = []
            if mode == "hogged":
                hogs = [mp.Process(target=hog, args=(c, stop_evt))
                        for c in range(HOG_FROM, HOG_TO)]
                for p in hogs:
                    p.start()
                time.sleep(3)  # let hogs reach steady state
            t0 = time.time()
            rec = run_leg(mode)
            rec.update({"rep": rep, "urls": N_URLS,
                        "wall": round(time.time() - t0, 1),
                        "n_hogs": len(hogs)})
            stop_evt.set()
            for p in hogs:
                p.join()
            emit(rec)


if __name__ == "__main__":
    main()
