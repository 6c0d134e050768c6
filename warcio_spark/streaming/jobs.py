"""Structured Streaming jobs (SURVEY §2.9).

The reference is a pull-based batch stream; the streaming engine analogs:

- incremental scan  -> file-source readStream over a growing table dir
- windowed census   -> watermark + tumbling window agg (late data bounded)
- crawl ingest      -> foreachBatch: each micro-batch of new pages becomes
                       frontier candidates merged through the same
                       canonicalize/dedup pipeline as the batch path
- custom state      -> applyInPandasWithState per-host token bucket

All jobs run with ``trigger(availableNow=True)`` in tests (drain-and-stop),
and unchanged on a real cluster with continuous triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcio_spark.schema import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, src_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def windowed_page_counts(pages_stream: DataFrame) -> DataFrame:
    """Tumbling 1-hour census with a 2-hour watermark: the streaming version
    of the record-type census (late rows beyond the watermark dropped)."""
    return (
        pages_stream.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("w.start").alias("hour_start"), "lang", "n_pages")
    )


def run_to_memory(stream_df: DataFrame, name: str, checkpoint: str,
                  output_mode: str = "append"):
    """Drain all available input into an in-memory table; returns the query
    after completion (tests + local verification)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_pages_to_candidates(spark: SparkSession, src_dir: str,
                               out_dir: str, checkpoint: str):
    """Batch-incremental crawl ingest: every micro-batch of new pages is
    keyed/canonicalized with the SAME pipeline as the batch frontier and
    appended to the candidates table. foreachBatch = the reference's
    'generator resumes where it left off' (warcio/archiveiterator.py:102-140)
    with exactly-once file-source progress tracking."""
    from warcio_spark.plans.frontier import with_frontier_keys

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cands = with_frontier_keys(
            batch_df.select(
                "url",
                F.lit(50.0).alias("priority"),
                F.xxhash64("url").alias("seq"),
            )
        )
        cands.write.mode("append").parquet(out_dir)

    q = (
        read_pages_stream(spark, src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def host_token_bucket_stream(pages_stream: DataFrame, budget_per_batch: int = 5):
    """Custom stateful operator: per-host running fetch counter with budget
    cut-off, via applyInPandasWithState (the politeness token bucket as a
    streaming primitive)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from warcio_spark import functions as WF

    keyed = pages_stream.select(
        WF.url_host("url").alias("host"), "url", "warc_ts"
    ).filter(F.col("host").isNotNull())

    out_schema = "host string, url string, host_seen_count long, admitted boolean"
    state_schema = "count long"

    def bucket(key, pdf_iter, state: GroupState):
        (host,) = key
        count = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("url")
            n = len(pdf)
            seen = count + pd.RangeIndex(1, n + 1)
            out = pd.DataFrame(
                {
                    "host": host,
                    "url": pdf["url"].values,
                    "host_seen_count": seen,
                    "admitted": seen <= budget_per_batch,
                }
            )
            count += n
            yield out
        state.update((count,))

    return keyed.groupBy("host").applyInPandasWithState(
        bucket, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
