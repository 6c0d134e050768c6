"""North-rule determinism evidence: the same crawl at local[8] and local[32]
(separate processes = separate JVMs/schedulers) produces byte-identical
fetch logs and seen-sets. Run: python scripts/verify_parallelism_determinism.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]")
         .config("spark.sql.shuffle.partitions", "{parts}")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
e._ensure_shipped(spark)
from warcio_spark.plans.crawl import crawl, fetch_log, RoundState
from warcio_spark.plans.frontier import demo_robots
seeds = spark.range(60000).select(
    F.concat(F.lit("http://host"), F.pmod("id", F.lit(97)).cast("string"),
             F.lit(".example.com/seed/"), F.col("id").cast("string")).alias("url"),
    (F.pmod(F.col("id") * 7919, F.lit(1000)) / 10.0).alias("priority"),
    F.col("id").alias("seq"))
crawl(spark, seeds, demo_robots(spark), {state!r}, rounds=2)
log = [(r.round, r.fetch_order, r.url_canon)
       for r in fetch_log(spark, {state!r}).orderBy("round", "fetch_order").collect()]
st = RoundState({state!r})
seen = sorted(r.url_canon for r in st.read(spark, st.last_round(), "seen").collect())
print(json.dumps({{"log": log, "seen_n": len(seen), "seen_head": seen[:5],
                   "seen_tail": seen[-5:]}}))
"""


def run(cpus: int, parts: int) -> dict:
    state = tempfile.mkdtemp(prefix=f"det_crawl_{cpus}_")
    code = WORKER.format(repo=REPO, cpus=cpus, parts=parts, state=state)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/tmp")
    if out.returncode != 0:
        raise SystemExit(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    a = run(8, 8)
    b = run(32, 64)
    same_log = a["log"] == b["log"]
    same_seen = (a["seen_n"], a["seen_head"], a["seen_tail"]) == (
        b["seen_n"], b["seen_head"], b["seen_tail"]
    )
    print(json.dumps({
        "fetch_log_entries": len(a["log"]),
        "identical_fetch_log": same_log,
        "identical_seen_set": same_seen,
    }))
    sys.exit(0 if (same_log and same_seen) else 1)


if __name__ == "__main__":
    main()
