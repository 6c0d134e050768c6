"""spark-submit entry point for the crawl loop (shipped via --py-files).

Runs N rounds of the checkpointed frontier crawl and prints the per-round
metrics JSON. Resumable: re-submitting with the same --state continues from
the last committed round.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--state", required=True)
    p.add_argument("--seeds", type=int, default=100_000)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--slot-seconds", type=int, default=60)
    p.add_argument("--default-crawl-delay", type=float, default=5.0)
    args, _ = p.parse_known_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("warcio_spark-crawl").getOrCreate()

    from warcio_spark.plans.crawl import crawl
    from warcio_spark.plans.frontier import PolitenessConfig, demo_robots

    seeds = spark.range(args.seeds).select(
        F.concat(
            F.lit("http://host"), F.pmod("id", F.lit(97)).cast("string"),
            F.lit(".example.com/seed/"), F.col("id").cast("string"),
        ).alias("url"),
        (F.pmod(F.col("id") * 7919, F.lit(1000)) / 10.0).alias("priority"),
        F.col("id").alias("seq"),
    )
    cfg = PolitenessConfig(
        slot_seconds=args.slot_seconds,
        default_crawl_delay=args.default_crawl_delay,
    )
    summary = crawl(spark, seeds, demo_robots(spark), args.state,
                    rounds=args.rounds, cfg=cfg)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
