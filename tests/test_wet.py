"""WET/WAT derivation interop: our conversion/metadata records, written by
our sink, must be readable by the REFERENCE library with digest checks on,
and the WET text must equal the reference's own decode of each response."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

CORPUS = "/root/reference/test/data/example.warc.gz"


def _reference_responses(path):
    """(target_uri -> (record_id, decoded text)) straight from warcio."""
    from warcio.archiveiterator import ArchiveIterator

    out = {}
    with open(path, "rb") as f:
        for rec in ArchiveIterator(f):
            if rec.rec_type != "response":
                continue
            raw = rec.content_stream().read()
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                text = raw.decode("iso-8859-1")
            out[rec.rec_headers.get_header("WARC-Target-URI")] = (
                rec.rec_headers.get_header("WARC-Record-ID"),
                text,
            )
    return out


def test_wet_roundtrip_reference_reads_and_text_matches(spark, tmp_path):
    from warcio.archiveiterator import ArchiveIterator

    from warcio_spark.operators.wet import derive_wet
    from warcio_spark.operators.writer import write_warc
    from warcio_spark.sources import read_warc

    recs = read_warc(spark, CORPUS)
    wet = derive_wet(recs)
    out_dir = str(tmp_path / "wet")
    paths = write_warc(wet.repartition(1), out_dir, gzip=True)
    assert len(paths) == 1

    ref = _reference_responses(CORPUS)
    seen = {}
    with open(paths[0], "rb") as f:
        for rec in ArchiveIterator(f, check_digests="raise"):
            assert rec.rec_type == "conversion"
            assert rec.http_headers is None
            hdrs = rec.rec_headers
            assert hdrs.get_header("Content-Type") == "text/plain"
            # digest presence + the 'raise' mode above = digests verify
            assert hdrs.get_header("WARC-Block-Digest")
            uri = hdrs.get_header("WARC-Target-URI")
            seen[uri] = (
                hdrs.get_header("WARC-Refers-To"),
                rec.content_stream().read().decode("utf-8"),
                hdrs.get_header("WARC-Record-ID"),
            )
    assert set(seen) == set(ref)
    for uri, (refers_to, text, rid) in seen.items():
        assert refers_to == ref[uri][0]      # points at the source record
        assert text == ref[uri][1]           # byte-identical extracted text
        assert rid.startswith("<urn:uuid:") and rid.endswith(">")


def test_wet_record_ids_deterministic(spark, tmp_path):
    from warcio_spark.operators.wet import derive_wet
    from warcio_spark.sources import read_warc

    ids1 = sorted(
        r.rec_headers[1].value
        for r in derive_wet(read_warc(spark, CORPUS)).collect()
    )
    ids2 = sorted(
        r.rec_headers[1].value
        for r in derive_wet(read_warc(spark, CORPUS).repartition(7)).collect()
    )
    assert ids1 == ids2 and len(ids1) == len(set(ids1))


def test_wat_envelope_reference_readable(spark, tmp_path):
    from warcio.archiveiterator import ArchiveIterator

    from warcio_spark.operators.wet import derive_wat
    from warcio_spark.operators.writer import write_warc
    from warcio_spark.sources import read_warc

    recs = read_warc(spark, CORPUS)
    n_src = recs.filter(
        recs.rec_type.isin("response", "request", "revisit")
    ).count()
    out_dir = str(tmp_path / "wat")
    paths = write_warc(derive_wat(recs).repartition(1), out_dir, gzip=True)

    n = 0
    links_seen = []
    with open(paths[0], "rb") as f:
        for rec in ArchiveIterator(f, check_digests="raise"):
            assert rec.rec_type == "metadata"
            assert rec.rec_headers.get_header("Content-Type") == "application/json"
            env = json.loads(rec.content_stream().read().decode("utf-8"))["Envelope"]
            meta = env["WARC-Header-Metadata"]
            assert meta["WARC-Target-URI"] == rec.rec_headers.get_header(
                "WARC-Target-URI"
            )
            assert meta["WARC-Record-ID"] == rec.rec_headers.get_header(
                "WARC-Refers-To"
            )
            assert "Payload-Metadata" in env
            if meta.get("WARC-Type") == "response":
                html_meta = (
                    env["Payload-Metadata"]
                    .get("HTTP-Response-Metadata", {})
                    .get("HTML-Metadata")
                )
                if html_meta is not None:
                    links_seen.extend(
                        (meta["WARC-Target-URI"], e["url"])
                        for e in html_meta["Links"]
                    )
                    assert all(
                        e["url"].startswith(("http://", "https://"))
                        and e["path"] == "A@/href"
                        for e in html_meta["Links"]
                    )
            n += 1
    assert n == n_src

    # the Links blocks must agree with the frontier-side extractor over
    # the same corpus (resolved absolute urls, same pages)
    from warcio_spark import functions as WF
    from warcio_spark.operators.links import extract_outlinks

    resp = recs.filter(
        (recs.rec_type == "response") & recs.content.isNotNull()
    ).withColumn("__text", WF.decode_text(recs.content))
    want = sorted(
        (r.src_url, r.outlink)
        for r in extract_outlinks(
            resp, url_col="url", text_col="__text"
        ).select("src_url", "outlink").collect()
    )
    assert sorted(links_seen) == want and len(want) > 0


def test_wet_rows_feed_text_pipeline(spark):
    """WET rows carry wet_text so dedup/quality/lang-id run directly."""
    from pyspark.sql import functions as F

    from warcio_spark.operators.textstats import token_count
    from warcio_spark.operators.wet import derive_wet
    from warcio_spark.sources import read_warc

    wet = derive_wet(read_warc(spark, CORPUS))
    stats = wet.select("url", token_count("wet_text").alias("n_tokens"))
    rows = stats.collect()
    assert rows and all(r.n_tokens > 0 for r in rows)


def test_index_cdxj_lines(spark):
    """CDXJ lines: SURT urlkey + ts14 + json block over the reference
    corpus, and (urlkey, timestamp) sorts as the CDX merge order."""
    import json as _json

    from warcio_spark.operators.indexer import index_cdxj
    from warcio_spark.sources import read_warc

    recs = read_warc(spark, CORPUS, include_payload=False,
                     include_content=False)
    rows = index_cdxj(recs).collect()
    assert rows
    for r in rows:
        assert r.urlkey.split(")")[0].count(",") >= 1  # reversed host
        assert len(r.timestamp) == 14 and r.timestamp.isdigit()
        blk = _json.loads(r.block)
        assert blk["url"].lower().startswith("http")
        assert r.line == f"{r.urlkey} {r.timestamp} {r.block}"
    resp = [r for r in rows if '"mime":"text/html"' in r.block]
    assert any(r.urlkey.startswith("com,example)/") for r in resp)


def test_incremental_wet_factory(spark, tmp_path):
    """WARC-dir -> WET-table factory: the incremental ingest with
    derive_wet as the batch transform keeps exactly-once commits while
    landing conversion-shaped rows instead of raw records."""
    import shutil

    from warcio_spark.operators.wet import derive_wet
    from warcio_spark.sources.incremental import (
        ingest_warc_incremental,
        read_ingested_records,
    )

    wdir, sdir = str(tmp_path / "warcs"), str(tmp_path / "wet_state")
    os.makedirs(wdir)
    shutil.copy(CORPUS, wdir)
    r1 = ingest_warc_incremental(spark, wdir, sdir, transform=derive_wet)
    assert r1["batch"] == 1 and r1["n_records"] > 0
    shutil.copy("/root/reference/test/data/example.warc", wdir)
    r2 = ingest_warc_incremental(spark, wdir, sdir, transform=derive_wet)
    assert r2["batch"] == 2 and r2["new_files"] == 1

    wet = read_ingested_records(spark, sdir)
    rows = wet.collect()
    assert all(r.rec_type == "conversion" for r in rows)
    assert all(r.wet_text for r in rows)
    assert wet.count() == r1["n_records"] + r2["n_records"]
