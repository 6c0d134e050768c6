#!/usr/bin/env python
"""Round-5 recrawl_due stress on the axes the r4 bench held fixed
(VERDICT_r04 item 6): the r4 legs grew total seen at FIXED stale=200k and
fixed small deltas, showing O(stale+delta) vs the old O(seen) groupBy.
Here the backlog itself grows, and then the delta tail grows, at fixed
corpus size — confirming cost tracks stale+delta and locating the
crossover where compaction should run more often.

Axis A (backlog): n_seen fixed, stale in SPARK_GRAFT_DUE_STALES — the
  pruned-scan side scales with the stale partitions it must read.
Axis B (deltas): n_seen and stale fixed, the number of 50k-row
  post-compaction delta rounds grows (compact_every stretched) — the
  delta-union side scales with rows written since the last compaction.
Both axes also time the old full-seen groupBy at the same state for the
crossover: once stale+delta approaches seen, the incremental read loses
its edge and compact_every should shrink.

Appends one JSON line per (axis, point, variant) to
build/recrawl_due_r5.jsonl.
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

OUT = os.path.join(REPO, "build", "recrawl_due_r5.jsonl")
N_SEEN = int(os.environ.get("SPARK_GRAFT_DUE_SEEN", "32000000"))
STALES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DUE_STALES", "2000000,8000000,32000000").split(",")]
DELTA_ROUNDS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DUE_DELTAS", "2,8,32").split(",")]
DELTA_ROWS = int(os.environ.get("SPARK_GRAFT_DUE_DELTA_ROWS", "50000"))
REPS = int(os.environ.get("SPARK_GRAFT_DUE_REPS", "3"))


def emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def build_state(spark, crawlmod, F, tmp, n_seen, n_stale, n_delta_rounds):
    """Compacted snapshot at round 10 (stale urls in partitions 10..16,
    fresh in 17..20) + n_delta_rounds 50k-row deltas at rounds 11+."""
    state = crawlmod.RoundState(os.path.join(tmp, "state"))
    rd = state.round_dir(10)
    os.makedirs(rd, exist_ok=True)
    df = spark.range(0, n_seen, 1, 64).select(
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.concat(F.lit("http://h"), F.pmod("id", F.lit(997)).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")
                 ).alias("url_canon"),
        F.when(F.col("id") < n_stale,
               (10 + F.pmod("id", F.lit(7))).cast("int"))
        .otherwise((17 + F.pmod("id", F.lit(4))).cast("int"))
        .alias("fetch_round"),
        F.col("id").alias("seq"),
    )
    df.write.partitionBy("fetch_round").parquet(os.path.join(rd, "seen"))
    last = 10
    for i in range(n_delta_rounds):
        r = 11 + i
        d = state.round_dir(r)
        os.makedirs(d, exist_ok=True)
        spark.range(0, DELTA_ROWS, 1, 8).select(
            F.xxhash64(F.col("id") * 3 + i).alias("url_hash"),
            F.concat(F.lit("http://d"), F.lit(i), F.lit("-"),
                     F.col("id").cast("string")).alias("url_canon"),
            F.lit(r).cast("int").alias("fetch_round"),
            (F.col("id") + 10_000_000 + i * DELTA_ROWS).alias("seq"),
        ).write.parquet(os.path.join(d, "seen_delta"))
        open(os.path.join(d, "_COMMIT"), "w").write("1")
        last = r
    open(os.path.join(rd, "_COMMIT"), "w").write("1")
    return state, last


def time_point(spark, crawlmod, F, axis, point, n_stale, n_deltas):
    from pyspark.sql import functions as _F  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="due_bench_r5_")
    ttl = 4
    current_round = 20  # cutoff = 16: partitions 10..16 are stale
    state, last = build_state(
        spark, crawlmod, F, tmp, N_SEEN, n_stale, n_deltas)

    def run_incremental():
        return crawlmod.recrawl_due(
            spark, state, last, current_round, ttl, 95.0).count()

    def run_full_agg():
        seen = state.read_seen(spark, last)
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
        emit({"axis": axis, "point": point, "n_seen": N_SEEN,
              "n_stale": n_stale, "delta_rounds": n_deltas,
              "delta_rows": n_deltas * DELTA_ROWS, "variant": name,
              "due_rows": rows, "sec": round(best, 3),
              "load": round(os.getloadavg()[0], 2)})
    shutil.rmtree(tmp)


def main():
    from pyspark.sql import functions as F

    from warcio_spark.plans import crawl as crawlmod

    spark = make_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    for n_stale in STALES:
        time_point(spark, crawlmod, F, "backlog", n_stale, n_stale, 2)
    for n_deltas in DELTA_ROUNDS:
        time_point(spark, crawlmod, F, "delta", n_deltas, 2_000_000,
                   n_deltas)


if __name__ == "__main__":
    main()
