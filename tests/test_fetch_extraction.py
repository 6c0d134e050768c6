"""End-to-end: schedule a round over the synthetic pages universe, fetch by
joining the pages table, and extract text byte-identically (the pages.text
column is itself validated against warcio in test_spark_ingest)."""

from pyspark.sql import functions as F

from warcio_spark.plans.crawl import fetch_from_pages
from warcio_spark.plans.frontier import (
    PolitenessConfig,
    fetch_order,
    prepare_candidates,
    schedule_round,
)
from warcio_spark.sources import synth_pages


def test_fetch_extracts_byte_identical_text(spark):
    pages = synth_pages(spark, 400, partitions=4).cache()
    cands = pages.select(
        "url",
        F.lit(10.0).alias("priority"),
        F.xxhash64("url").alias("seq"),
    )
    cfg = PolitenessConfig(slot_seconds=600, default_crawl_delay=1.0,
                           max_host_budget=500, salt_buckets=4)
    scheduled = fetch_order(
        schedule_round(prepare_candidates(cands, None, None, cfg), cfg)
    )
    fetched = fetch_from_pages(scheduled, pages)

    rows = fetched.select("page_url", "text").filter(
        F.col("page_url").isNotNull()
    ).collect()
    assert len(rows) > 300
    want = {r.url: r.text for r in pages.collect()}
    for r in rows:
        assert r.text == want[r.page_url], r.page_url
    pages.unpersist()
