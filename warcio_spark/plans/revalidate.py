"""Conditional-GET revalidation: HTTP cache validators for recrawl.

A freshness-aware crawler (Heritrix's FetchHistoryProcessor shape,
wget -N) does not blindly re-download a due url: it stores the last
response's cache validators and re-requests conditionally — the server
answers 304 Not Modified and the crawler keeps (and revisit-records)
the prior capture. Per RFC 9110 §13.1.1-13.1.3 the conditional headers
echo the STORED field values verbatim: ``If-None-Match`` carries the
last ``ETag`` (weak prefix and quotes included), ``If-Modified-Since``
carries the last ``Last-Modified`` byte-for-byte.

Like retry (plans/retry.py), this is a COMPOSABLE layer over the
parity-pinned ``crawl()`` loop: build ``validators_table`` from the
archived responses (or maintain it incrementally per round alongside
the seen-set — at 10^10 urls store it partitioned by fetch_round like
the compacted seen snapshot so the due-side join prunes to stale
partitions), then ``conditional_requests`` decorates ``recrawl_due``'s
output with the request headers to send.

Scale shape: validators_table is one partial-aggregated groupBy on the
url (max over (warc_ts, ...) structs — latest capture wins, no window,
no join); conditional_requests is one equi join keyed on the url with
the due side typically orders of magnitude smaller.

Reference analog: warcio itself archives what capture_http fetched;
the validator echo contract here matches what its recorded requests
carry (/root/reference/warcio/capture_http.py records request headers
verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcio_spark import functions as WF


def validators_table(records: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-url cache validators from archived responses: (url,
    last_fetch_ts, etag, last_modified) of the LATEST capture (max
    warc_ts; exact-timestamp ties resolve deterministically by the
    struct's remaining fields). The latest capture wins wholesale — if
    it carries no validators the url has none, even when an older
    capture did (stale validators must not produce false 304s)."""
    resp = records.filter(F.col("rec_type") == "response")
    cap = F.struct(
        F.col("warc_ts").alias("ts"),
        WF.header_get("http_headers", "ETag").alias("etag"),
        WF.header_get("http_headers", "Last-Modified").alias("lm"),
    )
    return (
        resp.select(F.col(url_col).alias("url"), cap.alias("_cap"))
        .groupBy("url")
        .agg(F.max("_cap").alias("_cap"))
        .select(
            "url",
            F.col("_cap.ts").alias("last_fetch_ts"),
            F.col("_cap.etag").alias("etag"),
            F.col("_cap.lm").alias("last_modified"),
        )
    )


def conditional_requests(due: DataFrame, validators: DataFrame,
                         url_col: str = "url") -> DataFrame:
    """Decorate due urls with the conditional request headers to send:
    ``if_none_match`` (stored ETag verbatim), ``if_modified_since``
    (stored Last-Modified verbatim), and ``revalidate`` — true when at
    least one validator exists (send the conditional GET), false for
    never-seen-or-validator-less urls (plain GET). All ``due`` columns
    carry through."""
    v = validators.select(
        F.col("url").alias("_vurl"),
        F.col("etag").alias("if_none_match"),
        F.col("last_modified").alias("if_modified_since"),
    )
    j = due.join(v, due[url_col] == v["_vurl"], "left").drop("_vurl")
    return j.withColumn(
        "revalidate",
        F.col("if_none_match").isNotNull()
        | F.col("if_modified_since").isNotNull(),
    )


def not_modified_revisits(responses: DataFrame, validators: DataFrame,
                          url_col: str = "url") -> DataFrame:
    """Rewrite 304 Not Modified responses as revisit records with the
    ``server-not-modified`` WARC profile (the standard way a
    revalidating crawler archives an unchanged page): WARC-Refers-To-*
    point at the url's last stored capture from ``validators`` (the
    same table ``conditional_requests`` used). Non-304 records pass
    through untouched. A 304 whose url somehow lacks a validators row
    (pathological — the crawler only sends conditionals it has
    validators for) falls back to its own capture time.

    The 304 rewrite differs from digest dedup: the payload is already
    empty (304 has no body) and the profile asserts the SERVER's claim,
    not a digest match — so the block/payload digest headers are
    dropped rather than recomputed."""
    from warcio_spark.operators.dedup import _rewrite_flagged_revisits

    is304 = (F.col("rec_type") == "response") & (
        WF.statuscode("http_statusline") == 304)
    hit = responses.filter(is304)
    miss = responses.filter(~F.coalesce(is304, F.lit(False)))

    v = validators.select(
        F.col("url").alias("_vurl"),
        F.col("last_fetch_ts").alias("_vts"),
    )
    flagged = (
        hit.join(v, hit[url_col] == v["_vurl"], "left").drop("_vurl")
        .withColumn("_orig_url", F.col(url_col))
        .withColumn("_orig_ts", F.coalesce(F.col("_vts"), F.col("warc_ts")))
        .withColumn("_is_dup", F.lit(True))
    )
    rewritten = _rewrite_flagged_revisits(
        flagged, ["_orig_url", "_orig_ts", "_is_dup", "_vts"],
        profile=_SERVER_NOT_MODIFIED)
    return rewritten.unionByName(miss)


_SERVER_NOT_MODIFIED = (
    "http://netpreserve.org/warc/1.0/revisit/server-not-modified"
)
