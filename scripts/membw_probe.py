#!/usr/bin/env python
"""Memory-bandwidth ceiling probe: aggregate streaming-read bandwidth
with K pinned worker processes, for K in (1, 8, 16, 32).

Why this matters for the N-vs-4N scaling gate: the frontier's CPU is
~90% JVM-side (see scaling_r5.jsonl jvm_cpu_s vs pyworker_cpu_s), and
string-heavy columnar work is memory-bound long before it is ALU-bound.
On ONE socket, 4x the cores do NOT bring 4x the memory channels — if
this probe shows aggregate bandwidth at 32 pins is only ~2x the 8-pin
figure, then NO memory-bound engine can scale 0.8+ from 8 to 32 cores
on this box, while a real cluster's 4N cores arrive with 4N/8 sockets
of bandwidth. The probe turns that from an excuse into a measured,
engine-independent box ceiling.

Each worker repeatedly sums a 256 MB numpy array (streaming reads,
no allocation in the loop) for DURATION seconds; bandwidth =
bytes_swept / wall. Appends one JSON line per K to
build/membw_r5.jsonl.
"""

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "build", "membw_r5.jsonl")
DURATION = float(os.environ.get("SPARK_GRAFT_MEMBW_SEC", "6"))
LEVELS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_MEMBW_LEVELS", "1,8,16,32").split(",")]


def worker(core, dur, q):
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(256 * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()  # touch pages
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        a.sum()
        n += 1
    q.put(n * a.nbytes / (time.perf_counter() - t0))


def main():
    for k in LEVELS:
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(c, DURATION, q))
              for c in range(k)]
        t0 = time.time()
        for p in ps:
            p.start()
        bw = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        rec = {"workers": k, "agg_gb_s": round(bw / 1e9, 2),
               "per_worker_gb_s": round(bw / 1e9 / k, 2),
               "load_at_start": round(os.getloadavg()[0], 2),
               "wall": round(time.time() - t0, 1)}
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
