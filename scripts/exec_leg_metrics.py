#!/usr/bin/env python
"""Diagnose why local-cluster[4,8] runs the frontier no faster than
local-cluster[1,8]: run one exec leg with event logging enabled, then
aggregate per-stage task metrics (executor run/CPU time, GC, shuffle
fetch wait, write time, (de)serialization) from the event log.

argv: master_shape [n_urls] [runs]   e.g.  4x8 16000000 2
env:  SPARK_GRAFT_EXEC_MEM / _EXEC_MB to vary executor heap.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/spark-events-diag"


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "4x8"
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.makedirs(EVDIR, exist_ok=True)
    os.environ["SPARK_GRAFT_EVENTLOG"] = EVDIR

    import bench

    # same confs as bench.make_spark, plus the event log
    from pyspark.sql import SparkSession

    if "x" in shape:
        n_exec, cores = (int(p) for p in shape.split("x"))
        worker_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "9216"))
        master = f"local-cluster[{n_exec},{cores},{worker_mb}]"
        total = n_exec * cores
    else:
        master = f"local[{shape}]"
        total = int(shape)
        n_exec = 0

    b = (
        SparkSession.builder.master(master)
        .appName("exec-leg-diag")
        .config("spark.sql.shuffle.partitions", str(max(8, total)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", bench._local_dirs())
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
    )
    if "x" in shape:
        b = (b.config("spark.executor.memory",
                      os.environ.get("SPARK_GRAFT_EXEC_MEM", "8g"))
             .config("spark.driver.memory", "8g")
             .config("spark.executorEnv.PYSPARK_PYTHON", sys.executable))
        extra = os.environ.get("SPARK_GRAFT_EXEC_JAVA_OPTS")
        if extra:
            b = b.config("spark.executor.extraJavaOptions", extra)
    else:
        b = b.config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if "x" in shape:
        import time as _t
        deadline = _t.time() + 120
        sc = spark.sparkContext
        while _t.time() < deadline:
            if sc._jsc.sc().getExecutorMemoryStatus().size() >= n_exec + 1:
                break
            _t.sleep(0.5)
    import __spark_entry__ as _entry

    _entry._ensure_shipped(spark)
    spark.range(1000).count()

    times = []
    sec, ups = bench.frontier_throughput(spark, n_urls, runs=runs,
                                         all_times=times)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # aggregate the event log
    agg = {}
    stages = {}
    path = os.path.join(EVDIR, app_id)
    for line in open(path):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        if ev.get("Event") == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, {
                "n": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                "fetch_wait_ms": 0, "shuf_write_ms": 0,
                "deser_ms": 0, "ser_ms": 0, "python_boot": 0,
            })
            st["n"] += 1
            st["run_ms"] += m.get("Executor Run Time", 0)
            st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
            st["gc_ms"] += m.get("JVM GC Time", 0)
            st["fetch_wait_ms"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Fetch Wait Time", 0)
            st["shuf_write_ms"] += ((m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Write Time", 0)) // 1_000_000
            st["deser_ms"] += m.get("Executor Deserialize Time", 0)
            st["ser_ms"] += m.get("Result Serialization Time", 0)
    tot = {k: sum(s[k] for s in stages.values())
           for k in next(iter(stages.values()))} if stages else {}
    top = sorted(stages.items(), key=lambda kv: kv[1]["run_ms"],
                 reverse=True)[:6]
    print(json.dumps({
        "shape": shape, "urls": n_urls, "sec": sec, "ups": ups,
        "times": times, "totals": tot,
        "top_stages": [{"stage": k, **v} for k, v in top],
    }, indent=1))


if __name__ == "__main__":
    main()
