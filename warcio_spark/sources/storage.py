"""Records-table storage shim: partitioned/sorted parquet with the layout an
Iceberg table would use at 100 TB.

- partition by crawl/rec_type (low-cardinality) so type- and crawl-scoped
  scans prune at the source (PartitionFilters in the plan)
- sort within files by (filename, offset) so the seek-to-offset point read
  (W2) rides parquet min-max statistics
- url_bucket column = pmod(xxhash64(url), n_buckets): writing bucketed by
  it makes the fetch join / seen-set join co-located (Iceberg bucket
  transform; plain parquet keeps the column so readers can still
  pre-partition on it)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_records_table(records: DataFrame, path: str, crawl_id: str = "c0",
                        n_url_buckets: int = 64, mode: str = "overwrite") -> None:
    out = (
        records.withColumn("crawl", F.lit(crawl_id))
        .withColumn(
            "url_bucket",
            F.pmod(F.xxhash64(F.coalesce(F.col("url"), F.lit(""))),
                   F.lit(n_url_buckets)),
        )
        .repartition("rec_type")
        .sortWithinPartitions("filename", "offset")
    )
    out.write.mode(mode).partitionBy("crawl", "rec_type").parquet(path)


def read_records_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def responses_only(spark: SparkSession, path: str) -> DataFrame:
    """Partition-pruned scan: only the rec_type=response directories are
    listed/read."""
    return read_records_table(spark, path).filter(F.col("rec_type") == "response")


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str = "url_hash",
                         buckets: int = 64, sort_col: str | None = None,
                         mode: str = "overwrite") -> None:
    """Spark-native bucketed table (the Iceberg bucket-transform analog):
    two tables bucketed identically on the join key join WITHOUT a shuffle
    — the layout that makes the fetch join (scheduled x pages) and repeated
    seen-set joins co-located at 100 TB. Plain parquet paths cannot carry
    bucket metadata, so this goes through saveAsTable."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str = "url_hash", how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With both
    sides bucketed to the same count, the physical plan has NO Exchange —
    each task reads matching buckets from both sides. The merge hint pins
    the sort-merge strategy (at 10^10 rows neither side broadcasts; at
    test scale the planner would otherwise pick a broadcast join and skip
    the bucket layout entirely)."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on, how
    )
