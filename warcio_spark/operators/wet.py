"""WET / WAT derivations: Common-Crawl-style conversion (extracted text)
and metadata (JSON envelope) records derived from a parsed records table.

The reference library is the serialization substrate of the real WET/WAT
generators (they are warcio consumers: ArchiveIterator in, WARCWriter
out, one conversion/metadata record per response — see
warcio/archiveiterator.py + warcio/warcwriter.py for the record wire
contract our output must satisfy). Here the derivation is columnar:
every header/id/envelope column is a JVM expression, the only Arrow hop
is the WET text decode, and the output rows feed the same ``write_warc``
sink (S7) — WARC in, WET/WAT out, one distributed file-parallel plan
with no shuffle anywhere.

At 100 TB this is the shape you want: ingest is one mapInArrow pass per
WARC file, the derivation is whole-stage-codegen column work on that
pass's output, and the sink writes one .warc.gz per partition — the job
is embarrassingly parallel end to end, so throughput scales with
executors and the only cap is per-file gzip CPU.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcio_spark import functions as WF


def pseudo_uuid(*cols) -> Column:
    """Deterministic name-based record id (<urn:uuid:...> shape) from the
    md5 of the argument columns — the distributed analog of the pinned
    record ids the reference's own writer tests use
    (/root/reference/test/test_writer.py fixed-id fixtures): output must
    be reproducible run-to-run, so uuid4 is the wrong tool."""
    h = F.md5(F.concat_ws("|", *cols))
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12), F.lit(">"),
    )


def _derived(src: DataFrame, kind: str, content_type: str,
             payload: Column) -> DataFrame:
    """Writer-shaped rows for a derived record: deterministic id,
    refers-to, carried date/uri, no HTTP block, the given payload."""
    warc_date = WF.header_get(F.col("rec_headers"), "WARC-Date")
    return src.select(
        F.lit("warc").alias("format"),
        F.lit(kind).alias("rec_type"),
        F.array(
            F.struct(F.lit("WARC-Type").alias("name"), F.lit(kind).alias("value")),
            F.struct(
                F.lit("WARC-Record-ID").alias("name"),
                # filename+offset in the hash: the same source record can
                # appear in several WARC files (mirrors, recompressions) and
                # derived ids must stay globally unique within one corpus
                pseudo_uuid(
                    F.lit(kind), F.col("record_id"), F.col("url"),
                    F.col("filename"), F.col("offset").cast("string"),
                ).alias("value"),
            ),
            F.struct(F.lit("WARC-Refers-To").alias("name"), F.col("record_id").alias("value")),
            F.struct(F.lit("WARC-Target-URI").alias("name"), F.col("url").alias("value")),
            F.struct(F.lit("WARC-Date").alias("name"), warc_date.alias("value")),
        ).alias("rec_headers"),
        F.col("url"),
        F.lit(None).cast("string").alias("http_protocol"),
        F.lit(None).cast("string").alias("http_statusline"),
        F.lit(None).cast("array<struct<name:string,value:string>>").alias("http_headers"),
        F.lit(content_type).alias("content_type"),
        # length=NULL -> the serializer recomputes Content-Length and BOTH
        # digests from the new payload (the A5 recompute path), so carried
        # response digests can never leak into the derived record
        F.lit(None).cast("long").alias("length"),
        F.lit(None).cast("long").alias("payload_length"),
        payload.alias("payload"),
        F.col("filename"),
        F.col("offset"),
    )


def derive_wet(records: DataFrame) -> DataFrame:
    """Response records -> WET-style ``conversion`` records: the decoded
    text of each response body as a text/plain WARC record that refers
    back to the source record. Feed the result to ``write_warc``.

    Input is a ``read_warc(..., include_content=True)`` table; the decode
    (utf-8 / iso-8859-1 fallback, the reference's textual content path) is
    the single Arrow hop, applied AFTER the JVM-side response filter so
    only response bodies cross into python. The decoded text is kept as a
    ``wet_text`` column alongside the payload bytes so downstream text
    pipelines (dedup, quality, lang-id) run straight off the WET rows."""
    resp = records.filter(
        (F.col("rec_type") == "response") & F.col("content").isNotNull()
    ).withColumn("wet_text", WF.decode_text(F.col("content")))
    out = _derived(
        resp, "conversion", "text/plain", F.encode(F.col("wet_text"), "UTF-8")
    )
    return out.withColumn("wet_text", F.decode(F.col("payload"), "UTF-8"))


def derive_wat(records: DataFrame, include_links: bool = True) -> DataFrame:
    """Records -> WAT-style ``metadata`` records: a JSON envelope of the
    source record's WARC headers plus payload metadata — and, for
    response records, the page's extracted outlinks under
    ``Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links``
    (Common-Crawl WAT's link block: one ``{path: "A@/href", url, href}``
    entry per anchor, url resolved absolute, href as written) plus the
    ``HTML-Metadata.Head`` block (Title + Metas name/content pairs,
    links.py:head_struct — Common-Crawl WAT's head metadata). The
    header/payload envelope is fully JVM-side (``to_json`` over a
    struct); the link block adds the SAME one Arrow text-decode hop the
    WET path uses, then pure-codegen extraction (operators/links.py).
    ``include_links=False`` (or a records table read without content)
    skips it and emits the envelope-only WAT."""
    # WARC allows repeated header names (e.g. multiple WARC-Concurrent-To);
    # map_from_entries on a raw duplicate would throw DUPLICATED_MAP_KEY at
    # runtime. Collapse duplicates by joining their values in header order
    # (the HTTP list-header convention), all in codegen.
    hdrs = F.col("rec_headers")
    dedup_entries = F.transform(
        F.array_distinct(F.transform(hdrs, lambda h: h["name"])),
        lambda n: F.struct(
            n.alias("key"),
            F.array_join(
                F.transform(
                    F.filter(hdrs, lambda h: h["name"] == n),
                    lambda h: h["value"],
                ),
                ", ",
            ).alias("value"),
        ),
    )
    src = records.filter(
        F.col("rec_type").isin("response", "request", "revisit")
    )
    links = F.lit(None).cast(
        "array<struct<path:string,url:string,href:string>>"
    )
    head = F.lit(None).cast(
        "struct<title:string,"
        "metas:array<struct<pos:int,name:string,content:string>>>"
    )
    if include_links and "content" in records.columns:
        from warcio_spark.operators.links import head_struct, outlink_structs

        text = F.when(
            (F.col("rec_type") == "response") & F.col("content").isNotNull(),
            WF.decode_text(F.col("content")),
        )
        links = F.when(
            text.isNotNull(),
            F.transform(
                outlink_structs(F.col("url"), text),
                lambda e: F.struct(
                    F.lit("A@/href").alias("path"),
                    e["url"].alias("url"),
                    e["href"].alias("href"),
                ),
            ),
        )
        head = F.when(text.isNotNull(), head_struct(text))
    src = src.withColumn(
        "_env",
        F.to_json(
            F.struct(
                F.struct(
                    F.map_from_entries(dedup_entries).alias(
                        "WARC-Header-Metadata"
                    ),
                    F.struct(
                        F.col("content_type").alias("Actual-Content-Type"),
                        F.col("length").alias("Content-Length"),
                        F.col("payload_length").alias("Payload-Length"),
                        F.col("http_statusline").alias("HTTP-Status"),
                        # null Links (non-response, no content, or links
                        # disabled) null the whole block so it vanishes
                        # from the JSON (ignoreNullFields) instead of
                        # leaving empty nested objects
                        F.when(
                            links.isNotNull() | head.isNotNull(),
                            F.struct(
                                F.struct(
                                    # Common-Crawl WAT Head block: Title +
                                    # Metas (name/content pairs); null
                                    # members vanish via ignoreNullFields
                                    F.when(
                                        head.isNotNull(),
                                        F.struct(
                                            head["title"].alias("Title"),
                                            F.when(
                                                F.size(head["metas"]) > 0,
                                                F.transform(
                                                    head["metas"],
                                                    lambda e: F.struct(
                                                        e["name"].alias("name"),
                                                        e["content"].alias(
                                                            "content"
                                                        ),
                                                    ),
                                                ),
                                            ).alias("Metas"),
                                        ),
                                    ).alias("Head"),
                                    links.alias("Links"),
                                ).alias("HTML-Metadata")
                            ),
                        ).alias("HTTP-Response-Metadata"),
                    ).alias("Payload-Metadata"),
                ).alias("Envelope")
            )
        ),
    )
    return _derived(
        src, "metadata", "application/json", F.encode(F.col("_env"), "UTF-8")
    )
