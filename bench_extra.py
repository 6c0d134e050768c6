#!/usr/bin/env python
"""Round-6 optimization harness: noop-sink isolation timing for chosen
queries at a chosen scale factor (guide §1.4), without touching the frozen
bench.py. Prints one JSON line per query to stdout and (optionally) dumps
.explain("formatted") to a file.

Usage:
    python bench_extra.py [--sf SFDIR] [--runs N] [--explain DIR] q1 q2 ...
    python bench_extra.py --all            # whole BENCH_QUERIES battery
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>.txt formatted plans")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    spark = bench.make_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    qs = entrymod.queries()
    names = bench.BENCH_QUERIES if args.all else args.queries
    out = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"r06 bench: {name}")
            t0 = time.perf_counter()
            bench.force(qs[name](spark, args.sf))
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"best": min(samples) if samples else None,
                     "samples": samples}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    total = round(sum(v["best"] or 0 for v in out.values()), 3)
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "sum_best": total,
                      "queries": {k: v["best"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
