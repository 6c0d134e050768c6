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
                    # Head may be present without Links (page with metas
                    # but no anchors) — ignoreNullFields drops null Links
                    blk = html_meta.get("Links") or []
                    links_seen.extend(
                        (meta["WARC-Target-URI"], e["url"]) for e in blk
                    )
                    assert all(
                        e["url"].startswith(("http://", "https://"))
                        and e["path"] == "A@/href"
                        for e in blk
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


def _headparser_oracle(text):
    """Independent Head extraction via html.parser (entities preserved —
    neither side decodes them): (title, [(name, content), ...]) for the
    region up to the first </head> (whole doc if none), mirroring
    links.py:head_struct's documented contract."""
    import re
    from html.parser import HTMLParser

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.title_parts = None
            self.title = None
            self.metas = []
            self.done = False

        def handle_starttag(self, tag, attrs):
            if self.done:
                return
            if tag == "title" and self.title is None:
                self.title_parts = []
            elif tag == "meta":
                a = dict(attrs)
                name = a.get("name") or a.get("property") or ""
                if name:
                    self.metas.append((name, a.get("content") or ""))

        def handle_data(self, data):
            if self.title_parts is not None and self.title is None:
                self.title_parts.append(data)

        def handle_entityref(self, name):
            if self.title_parts is not None and self.title is None:
                self.title_parts.append("&%s;" % name)

        def handle_charref(self, name):
            if self.title_parts is not None and self.title is None:
                self.title_parts.append("&#%s;" % name)

        def handle_endtag(self, tag):
            if tag == "title" and self.title_parts is not None:
                if self.title is None:
                    self.title = "".join(self.title_parts)
            elif tag == "head":
                self.done = True

    p = P()
    p.feed(text)
    p.close()
    title = p.title
    if title is not None:
        title = re.sub(r"\s+", " ", title).strip()[:512] or None
    return title, p.metas


def test_wat_head_block_matches_independent_parser(spark, tmp_path):
    """derive_wat's Head block (title + metas), read back through the
    REFERENCE library, equals an html.parser-based independent extraction
    over the reference's own decode of each response."""
    from warcio.archiveiterator import ArchiveIterator

    from warcio_spark.operators.wet import derive_wat
    from warcio_spark.operators.writer import write_warc
    from warcio_spark.sources import read_warc

    recs = read_warc(spark, CORPUS)
    out_dir = str(tmp_path / "wat_head")
    paths = write_warc(derive_wat(recs).repartition(1), out_dir, gzip=True)

    ref = _reference_responses(CORPUS)
    checked = 0
    with open(paths[0], "rb") as f:
        for rec in ArchiveIterator(f, check_digests="raise"):
            env = json.loads(
                rec.content_stream().read().decode("utf-8")
            )["Envelope"]
            meta = env["WARC-Header-Metadata"]
            if meta.get("WARC-Type") != "response":
                continue
            uri = meta["WARC-Target-URI"]
            if uri not in ref:
                continue
            head = (
                env["Payload-Metadata"]
                .get("HTTP-Response-Metadata", {})
                .get("HTML-Metadata", {})
                .get("Head")
            )
            want_title, want_metas = _headparser_oracle(ref[uri][1])
            got_title = (head or {}).get("Title")
            got_metas = [
                (m["name"], m["content"])
                for m in (head or {}).get("Metas") or []
            ]
            assert got_title == want_title, uri
            assert got_metas == want_metas, uri
            checked += 1
    assert checked > 0


def test_head_struct_edge_cases(spark):
    """Quote forms, charset-drop, empty-content keep, region fallback,
    meta + title caps — the unit contract of links.py:head_struct."""
    from pyspark.sql import functions as F

    from warcio_spark.operators.links import (
        MAX_METAS_PER_PAGE,
        MAX_TITLE_CHARS,
        head_struct,
    )

    rows = [
        # 0: everything before </head>; body meta excluded
        ("<head><title> A  B </title>"
         "<meta name=\"n1\" content=\"c 1\">"
         "<meta name='n2' content='c2'>"
         "<meta name=n3 content=c3>"
         "<meta charset=\"utf-8\">"
         "<meta property=\"og:t\" content=\"it's ok\">"
         "<meta name=\"e\" content=\"\">"
         "</head><meta name=\"body\" content=\"x\">",),
        # 1: no </head> -> whole doc scanned, body meta included
        ("<title>T</title><meta name=\"a\" content=\"1\">"
         "<body><meta name=\"b\" content=\"2\">",),
        # 2: meta cap + title cap
        ("<title>%s</title>%s" % (
            "x" * (MAX_TITLE_CHARS + 50),
            "".join('<meta name="m%d" content="v">' % i
                    for i in range(MAX_METAS_PER_PAGE + 8)),
        ),),
        # 3: no head at all
        ("<p>plain</p>",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [
        r.h.asDict(recursive=True)
        for r in df.select(head_struct(F.col("text")).alias("h")).collect()
    ]
    assert out[0]["title"] == "A B"
    assert [(m["name"], m["content"]) for m in out[0]["metas"]] == [
        ("n1", "c 1"), ("n2", "c2"), ("n3", "c3"),
        ("og:t", "it's ok"), ("e", ""),
    ]
    # pos counts ALL meta tags pre-name-filter: charset tag holds pos 3
    assert [m["pos"] for m in out[0]["metas"]] == [0, 1, 2, 4, 5]
    assert [(m["name"], m["content"]) for m in out[1]["metas"]] == [
        ("a", "1"), ("b", "2"),
    ]
    assert len(out[2]["title"]) == MAX_TITLE_CHARS
    assert len(out[2]["metas"]) == MAX_METAS_PER_PAGE
    assert out[3]["title"] is None and out[3]["metas"] == []
