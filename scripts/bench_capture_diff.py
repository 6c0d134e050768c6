#!/usr/bin/env python
"""capture_diff scale evidence: the crawl-over-crawl diff must stay one
urlkey aggregation whose cost is linear in the captures INSIDE the two
windows and independent of the index volume OUTSIDE them.

Two axes over a synthetic typed index (urlkey grid sized so windows
carry multi-capture urlkeys):

Axis A (in-window volume): captures split evenly across windows A/B,
  n_rows in SPARK_GRAFT_DIFF_ROWS — time should scale ~linearly.
Axis B (out-of-window chaff): in-window volume FIXED at the smallest
  axis-A point while total rows grow by adding captures outside both
  windows — on the parquet-backed variant the window predicates reach
  the scan (row-group stats), so time should stay FLAT; the same data
  as an in-memory frame (no stats to prune with) is timed alongside as
  the contrast.

Appends one JSON line per (axis, point, variant) to
build/capture_diff_r5.jsonl.
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark  # noqa: E402

OUT = os.path.join(REPO, "build", "capture_diff_r5.jsonl")
ROWS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DIFF_ROWS", "2000000,8000000,32000000").split(",")]
CHAFF = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DIFF_CHAFF", "0,8000000,32000000").split(",")]
REPS = int(os.environ.get("SPARK_GRAFT_DIFF_REPS", "3"))
WIN_A = ("202401", "202401")
WIN_B = ("202402", "202402")


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def synth(spark, n_rows, chaff_rows=0):
    """(urlkey, timestamp, url, digest): ids land in Jan/Feb 2024 by
    parity; chaff ids land in 2023 (outside both windows). ~8 captures
    per urlkey at any size so latest-selection does real work."""
    from pyspark.sql import functions as F

    d = F.col("id")
    s = lambda x: x.cast("string")  # noqa: E731
    n_keys = max(n_rows // 8, 1)
    month = F.when(d % 2 == 0, F.lit("01")).otherwise(F.lit("02"))
    in_win = spark.range(n_rows).select(
        F.concat(F.lit("com,h"), s(d % n_keys), F.lit(")/p")).alias("urlkey"),
        F.concat(F.lit("2024"), month,
                 F.lpad(s(d % 28 + 1), 2, "0"),
                 F.lpad(s(d % 24), 2, "0"),
                 F.lpad(s(d % 60), 2, "0"), F.lit("00")).alias("timestamp"),
        F.concat(F.lit("http://h"), s(d % n_keys), F.lit(".ex/p")).alias("url"),
        F.concat(F.lit("sha1:"), s(d % 5)).alias("digest"),
    )
    if not chaff_rows:
        return in_win
    c = spark.range(chaff_rows).select(
        F.concat(F.lit("com,h"), s(d % n_keys), F.lit(")/p")).alias("urlkey"),
        F.concat(F.lit("2023"), F.lpad(s(d % 12 + 1), 2, "0"),
                 F.lpad(s(d % 28 + 1), 2, "0"),
                 F.lpad(s(d % 24), 2, "0"),
                 F.lpad(s(d % 60), 2, "0"), F.lit("00")).alias("timestamp"),
        F.concat(F.lit("http://h"), s(d % n_keys), F.lit(".ex/p")).alias("url"),
        F.concat(F.lit("sha1:"), s(d % 5)).alias("digest"),
    )
    return in_win.unionAll(c)


def time_diff(spark, df, reps):
    from warcio_spark.sources.cdxj import capture_diff

    best = None
    rows = None
    for _ in range(reps):
        t0 = time.time()
        rows = capture_diff(df, WIN_A, WIN_B).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main():
    spark = make_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="capture_diff_bench_")
    try:
        for n in ROWS:
            sec, rows = time_diff(spark, synth(spark, n), REPS)
            emit({"axis": "volume", "variant": "memory", "n_rows": n,
                  "chaff": 0, "sec": round(sec, 3), "out_rows": rows})
        base = ROWS[0]
        for ch in CHAFF:
            path = os.path.join(tmp, "idx_%d" % ch)
            synth(spark, base, ch).write.mode("overwrite").parquet(path)
            pq = spark.read.parquet(path)
            sec, rows = time_diff(spark, pq, REPS)
            emit({"axis": "chaff", "variant": "parquet", "n_rows": base,
                  "chaff": ch, "sec": round(sec, 3), "out_rows": rows})
            mem = synth(spark, base, ch)
            sec, rows = time_diff(spark, mem, REPS)
            emit({"axis": "chaff", "variant": "memory", "n_rows": base,
                  "chaff": ch, "sec": round(sec, 3), "out_rows": rows})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
