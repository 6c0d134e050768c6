#!/usr/bin/env python
"""One scaling leg, run as a fresh subprocess by bench._scaling_leg.

argv: spark_cores pin_cores n_urls runs disjoint(0|1)

Pins CPU affinity BEFORE the JVM starts (an in-process sched_setaffinity
cannot re-pin the already-running py4j JVM). In disjoint mode the JVM and
driver get the FIRST half of the pin envelope and every python UDF worker
re-pins itself — via a PYSPARK_PYTHON wrapper — to the SECOND half, so
nothing in the leg time-slices a core and the total footprint is still
exactly ``pin_cores``: the way a real cluster provisions executor cores
and python-worker cores explicitly.

Prints one JSON line:
  sec/ups        best-of-runs frontier time and URLs/sec
  times          every individual run time (spread = in-leg noise)
  self_cpu_s     CPU seconds consumed by this process TREE (driver,
                 JVM, pyspark daemons/workers) over the measured window,
                 from /proc — live descendants' utime+stime plus each
                 tree member's reaped-children cutime+cstime
  box_busy_s     box-wide busy CPU seconds over the same window
                 (/proc/stat: total minus idle minus iowait)
  cotenant_cpu_s box_busy_s - self_cpu_s: CPU burned by OTHER tenants
                 inside the measurement window. The objective
                 clean-pair criterion — no load-average eyeballing.
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLK = os.sysconf("SC_CLK_TCK")


def box_busy():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return (sum(v) - v[3] - v[4]) / CLK


def tree_cpu():
    """CPU seconds of this process and every live descendant, plus each
    tree member's already-reaped children (cutime/cstime) — covers the
    py4j JVM, pyspark daemons, and python workers without needing to
    reap anything. Returns (total, jvm, python_workers): the split tells
    what fraction of the leg is JVM task work vs python UDF work — the
    number a real cluster uses to size executor cores vs
    spark.task.cpus headroom for python workers."""
    info = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                data = f.read()
        except OSError:
            continue
        comm = data[data.index(b"(") + 1:data.rindex(b")")]
        rest = data[data.rindex(b")") + 2:].split()
        info[int(pid)] = (int(rest[1]),  # ppid
                          int(rest[11]) + int(rest[12])   # utime+stime
                          + int(rest[13]) + int(rest[14]),  # cutime+cstime
                          comm)
    tree = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _, _) in info.items():
            if ppid in tree and pid not in tree:
                tree.add(pid)
                grew = True
    total = jvm = pyw = drv = 0
    me = os.getpid()
    for p in tree:
        if p not in info:
            continue
        ppid, cpu, comm = info[p]
        total += cpu
        if comm.startswith(b"java"):
            jvm += cpu
            if ppid == me:
                # the driver py4j JVM (in local-cluster mode the OTHER
                # java processes are worker daemons + executor backends;
                # this split quantifies how much of the envelope the
                # driver itself burns — a real cluster hosts it off-node)
                drv += cpu
        elif p != me and b"python" in comm:
            # pyspark daemons + UDF workers (cutime of reaped workers
            # rolls up into the daemon, also python-comm)
            pyw += cpu
    return total / CLK, jvm / CLK, pyw / CLK, drv / CLK


def canary():
    """Fixed single-thread probe (sha256 over a 64 MB buffer + an int
    loop, ~0.5 s nominal): guest-side /proc can't see HOST-level
    contention — threads show busy while IPC drops — so a leg is only
    comparable when its canary time matches the session's best. Runs
    pinned like everything else in this process."""
    import hashlib
    import time

    buf = b"\xa5" * (64 << 20)
    t0 = time.perf_counter()
    for _ in range(3):
        hashlib.sha256(buf).digest()
    acc = 0
    for i in range(3_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 3)


def canary_par(nproc=32):
    """32-process CPU canary (sha256 over an L2-resident 1 MB buffer —
    pure compute, no bandwidth confound): wall time for all workers.
    The single-thread canary misses host oversubscription that only
    bites when the guest demands MANY cores at once (observed: a leg
    with single-canary 0.32s and cotenant ~0 still ran 0.41x of its
    fast-state throughput). wall >> per-worker time = the host is not
    actually giving us nproc cores right now. Runs OUTSIDE the
    cotenant-CPU measurement window; temporarily widens affinity to
    probe the whole box, then restores the leg's pins."""
    import hashlib
    import multiprocessing as mp
    import time

    old = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(nproc)))

    def w(core, q):
        os.sched_setaffinity(0, {core})
        buf = b"\xa5" * (1 << 20)
        t0 = time.perf_counter()
        for _ in range(220):
            hashlib.sha256(buf).digest()
        q.put(time.perf_counter() - t0)

    q = mp.Queue()
    ps = [mp.Process(target=w, args=(c, q)) for c in range(nproc)]
    for p in ps:
        p.start()
    per = [q.get() for _ in ps]
    for p in ps:
        p.join()
    os.sched_setaffinity(0, old)
    # [slowest worker, fastest worker] own-compute times: spawn stagger
    # cancels out; a slow max with a fast min = workers were descheduled
    # mid-loop, i.e. the host is short of physical cores right now
    return [round(max(per), 3), round(min(per), 3)]


def main():
    spark_cores, pin, n_urls, runs, disjoint = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5] == "1",
    )
    if disjoint:
        os.sched_setaffinity(0, set(range(pin // 2)))
        w = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
        w.write(
            "#!%s\nimport os, sys\n"
            "os.sched_setaffinity(0, set(range(%d, %d)))\n"
            "os.execv(%r, [%r] + sys.argv[1:])\n"
            % (sys.executable, pin // 2, pin, sys.executable, sys.executable)
        )
        w.close()
        os.chmod(w.name, 0o755)
        os.environ["PYSPARK_PYTHON"] = w.name
        os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
    else:
        os.sched_setaffinity(0, set(range(pin)))

    sys.path.insert(0, REPO)
    from bench import frontier_throughput, make_spark

    s = make_spark(spark_cores)
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000).count()

    can0 = canary()
    canp0 = canary_par()
    busy0, (cpu0, jvm0, pyw0, drv0) = box_busy(), tree_cpu()
    times = []
    sec, ups = frontier_throughput(s, n_urls, runs=runs, all_times=times)
    busy1, (cpu1, jvm1, pyw1, drv1) = box_busy(), tree_cpu()
    can1 = canary()
    canp1 = canary_par()
    s.stop()

    self_cpu = cpu1 - cpu0
    print(json.dumps({
        "sec": sec, "ups": ups, "times": times,
        "self_cpu_s": round(self_cpu, 1),
        "jvm_cpu_s": round(jvm1 - jvm0, 1),
        "driver_jvm_cpu_s": round(drv1 - drv0, 1),
        "pyworker_cpu_s": round(pyw1 - pyw0, 1),
        "box_busy_s": round(busy1 - busy0, 1),
        "cotenant_cpu_s": round((busy1 - busy0) - self_cpu, 1),
        "canary_sec": [can0, can1],
        "canary_par": [canp0, canp1],
    }))


if __name__ == "__main__":
    main()
