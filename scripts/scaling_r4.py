#!/usr/bin/env python
"""Round-4 scaling evidence collector: run N-vs-4N legs ONLY when the
shared box is quiet, so the reported distribution needs no quiet-pair
cherry-picking (VERDICT r3 item 2).

Each iteration runs one full interleaved quartet — plain pair
(local[8]@8 pins, local[32]@32 pins) then headroom-control pair
(local[4]@8, local[16]@32) — but each LEG individually waits for
load < LOAD_GATE before starting, and records the load it actually ran
at. Quartets where any leg exceeded the gate at start are still logged
(with the load) and can be filtered honestly at reporting time.

Also interleaves weak-scaling legs (96M urls at 32 cores) every
WEAK_EVERY quartets — the r3 128M legs all overlapped co-tenant bursts
(VERDICT item 8); 96M at load<5 settles whether 0.54 was interference.

Appends one JSON line per leg to build/scaling_r4.jsonl.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _scaling_leg  # noqa: E402

OUT = os.path.join(REPO, "build", "scaling_r4.jsonl")
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.5"))
MAX_WAIT = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))
N_URLS = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "16000000"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
QUARTETS = int(os.environ.get("SPARK_GRAFT_SCALING_QUARTETS", "6"))
WEAK_EVERY = int(os.environ.get("SPARK_GRAFT_WEAK_EVERY", "3"))
WEAK_URLS = int(os.environ.get("SPARK_GRAFT_WEAK_URLS", "96000000"))

LEVELS = [("8", 8), ("32", 32), ("4", 8), ("16", 32)]


def wait_quiet():
    """Block until 1-min load is under the gate (or MAX_WAIT elapses);
    returns the load at release."""
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < LOAD_GATE or time.time() - t0 > MAX_WAIT:
            return round(load, 2)
        time.sleep(20)


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    for q in range(QUARTETS):
        for spark_cores, pin in LEVELS:
            load = wait_quiet()
            t0 = time.time()
            leg = _scaling_leg(spark_cores, pin, N_URLS, RUNS)
            emit({
                "quartet": q,
                "level": f"{spark_cores}@{pin}",
                "urls": N_URLS,
                "sec": leg["sec"],
                "ups": leg["ups"],
                "load_at_start": load,
                "load_after": round(os.getloadavg()[0], 2),
                "wall": round(time.time() - t0, 1),
            })
        if WEAK_EVERY and (q + 1) % WEAK_EVERY == 0:
            load = wait_quiet()
            t0 = time.time()
            leg = _scaling_leg("32", 32, WEAK_URLS, 2)
            emit({
                "quartet": q,
                "level": "32@32-weak",
                "urls": WEAK_URLS,
                "sec": leg["sec"],
                "ups": leg["ups"],
                "load_at_start": load,
                "load_after": round(os.getloadavg()[0], 2),
                "wall": round(time.time() - t0, 1),
            })


if __name__ == "__main__":
    main()
