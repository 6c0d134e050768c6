#!/usr/bin/env python
"""Evidence that the recrawl due-set costs O(stale + delta), not O(seen)
(VERDICT r3 item 1 done-criterion).

Builds compacted fetch_round-partitioned seen snapshots of growing total
size with a FIXED stale fraction, then times (a) recrawl_due (pruned
scan + delta aggregation) and (b) the old full-seen groupBy formulation,
at each size. The due rows are identical by construction; the old cost
grows with the seen size while recrawl_due tracks the stale size.

Appends one JSON line per (n_seen, variant) to build/recrawl_due_r4.jsonl.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark  # noqa: E402

OUT = os.path.join(REPO, "build", "recrawl_due_r4.jsonl")
SIZES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DUE_SIZES", "2000000,8000000,32000000").split(",")]
N_STALE = int(os.environ.get("SPARK_GRAFT_DUE_STALE", "200000"))
REPS = int(os.environ.get("SPARK_GRAFT_DUE_REPS", "3"))


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from warcio_spark.plans import crawl as crawlmod

    spark = make_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    ttl = 4
    current_round = 20  # cutoff = 16

    for n_seen in SIZES:
        tmp = tempfile.mkdtemp(prefix="due_bench_")
        state = crawlmod.RoundState(os.path.join(tmp, "state"))
        rd = state.round_dir(10)
        os.makedirs(rd, exist_ok=True)
        # one-row-per-url compacted snapshot: N_STALE urls fetched at
        # rounds <= cutoff (partitions 10..16), the rest fresh (17..20)
        df = spark.range(0, n_seen, 1, 64).select(
            F.xxhash64(F.col("id")).alias("url_hash"),
            F.concat(F.lit("http://h"), F.pmod("id", F.lit(997)).cast("string"),
                     F.lit(".example.com/p/"), F.col("id").cast("string")
                     ).alias("url_canon"),
            F.when(F.col("id") < N_STALE,
                   (10 + F.pmod("id", F.lit(7))).cast("int"))
            .otherwise((17 + F.pmod("id", F.lit(4))).cast("int"))
            .alias("fetch_round"),
            F.col("id").alias("seq"),
        )
        df.write.partitionBy("fetch_round").parquet(os.path.join(rd, "seen"))
        # two small post-compaction deltas (rounds 11..12 refetch a slice)
        for r in (11, 12):
            d = state.round_dir(r)
            os.makedirs(d, exist_ok=True)
            spark.range(0, 50_000, 1, 8).select(
                F.xxhash64(F.col("id") * 3).alias("url_hash"),
                F.concat(F.lit("http://d"), F.col("id").cast("string")
                         ).alias("url_canon"),
                F.lit(r).cast("int").alias("fetch_round"),
                (F.col("id") + 10_000_000).alias("seq"),
            ).write.parquet(os.path.join(d, "seen_delta"))
            open(os.path.join(d, "_COMMIT"), "w").write("1")
        open(os.path.join(rd, "_COMMIT"), "w").write("1")

        def run_incremental():
            return crawlmod.recrawl_due(
                spark, state, 12, current_round, ttl, 95.0
            ).count()

        def run_full_agg():
            seen = state.read_seen(spark, 12)
            return (
                seen.groupBy("url_hash", "url_canon")
                .agg(F.max("fetch_round").alias("_lf"),
                     F.min("seq").alias("_s0"))
                .filter(F.col("_lf") <= current_round - ttl)
                .count()
            )

        for name, fn in (("incremental", run_incremental),
                         ("full_agg", run_full_agg)):
            best, rows = None, None
            for _ in range(REPS):
                t0 = time.perf_counter()
                rows = fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emit({"n_seen": n_seen, "n_stale": N_STALE, "variant": name,
                  "due_rows": rows, "sec": round(best, 3),
                  "load": round(os.getloadavg()[0], 2)})
        shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
