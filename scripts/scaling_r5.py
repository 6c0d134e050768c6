#!/usr/bin/env python
"""Round-5 scaling evidence collector (VERDICT_r04 item 1).

Per iteration, load-gated N-vs-4N pairs, legs alternated small/big so a
co-tenant burst cannot bias one side:

  control   local[4]@8pins  vs local[16]@32pins  (python-worker headroom)
  plain     local[8]@8pins  vs local[32]@32pins  (2x oversubscribed both
            sides — the known local-mode core-sharing bound, kept for
            continuity with r3/r4)

(A 50:50 disjoint-pin pair — JVM on half the envelope, workers on the
other half — ran in iteration 0 and is RETIRED as a negative result:
efficiency 0.44, because the frontier's JVM:python mix is far from
50:50, so half the envelope idles during JVM-heavy phases; the
per-leg jvm_cpu_s/pyworker_cpu_s split now measures the real mix.)

Every leg records per-run times AND objective co-tenant CPU seconds
measured from /proc (see scripts/_scaling_child.py) — the pre-registered
clean-pair criterion is `cotenant_cpu_s` small on BOTH legs (< 5% of
the leg's own CPU) AND matching canary times (guest-side /proc cannot
see host-level contention; the single-thread canary catches windows
where threads run busy-but-slow). ALL legs are appended to
build/scaling_r5.jsonl regardless of outcome.

A weak-scaling leg (96M URLs at 32) runs every WEAK_EVERY iterations.
SPARK_GRAFT_ITER_BASE offsets iteration ids so restarted collections
append to the same log without colliding.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _scaling_leg  # noqa: E402

OUT = os.path.join(REPO, "build", "scaling_r5.jsonl")
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
MAX_WAIT = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))
N_URLS = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "16000000"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
ITERS = int(os.environ.get("SPARK_GRAFT_SCALING_ITERS", "4"))
ITER_BASE = int(os.environ.get("SPARK_GRAFT_ITER_BASE", "0"))
WEAK_EVERY = int(os.environ.get("SPARK_GRAFT_WEAK_EVERY", "2"))
WEAK_URLS = int(os.environ.get("SPARK_GRAFT_WEAK_URLS", "96000000"))

# (tag, spark_cores, pin_cores, disjoint)
# exec-* legs use master local-cluster[N,8,mem]: N REAL executor JVM
# processes x 8 cores each (own heap / shuffle service / python-worker
# pool, cross-process block transfers) — the literal "N executors vs 4N
# executors" shape of the north rule, vs the thread-based local[N] legs.
# SPARK_GRAFT_LEGS=<substring> restricts an invocation to matching tags.
LEGS = [
    ("ctl-4@8", "4", 8, False),
    ("ctl-16@32", "16", 32, False),
    ("exec-1x8@8", "1x8", 8, False),
    ("exec-4x8@32", "4x8", 32, False),
    ("plain-8@8", "8", 8, False),
    ("plain-32@32", "32", 32, False),
]
LEG_FILTER = [s for s in os.environ.get("SPARK_GRAFT_LEGS", "").split(",")
              if s]


def wait_quiet():
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


def run_leg(it, tag, spark_cores, pin, urls, runs, disjoint):
    load = wait_quiet()
    t0 = time.time()
    try:
        leg = _scaling_leg(spark_cores, pin, urls, runs, disjoint=disjoint)
    except RuntimeError as e:
        emit({"iter": it, "level": tag, "urls": urls, "error": str(e)[:2500]})
        return
    rec = {"iter": it, "level": tag, "urls": urls,
           "load_at_start": load, "wall": round(time.time() - t0, 1)}
    rec.update({k: v for k, v in leg.items() if k != "box_busy_s"})
    emit(rec)


def main():
    for i in range(ITERS):
        it = ITER_BASE + i
        for tag, spark_cores, pin, disjoint in LEGS:
            if LEG_FILTER and not any(s in tag for s in LEG_FILTER):
                continue
            run_leg(it, tag, spark_cores, pin, N_URLS, RUNS, disjoint)
        if WEAK_EVERY and (i + 1) % WEAK_EVERY == 0:
            run_leg(it, "weak-32@32", "32", 32, WEAK_URLS, 2, False)


if __name__ == "__main__":
    main()
