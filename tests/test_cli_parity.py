"""CLI parity vs the reference CLI (runtime oracle, mirrors test/test_cli.py).

JSON lines are compared as parsed objects + key order (the reference writes
json.dumps with spaces, Spark's to_json is compact — same content)."""

import io
import json
import os
import sys

import pytest

CORPUS = "/root/reference/test/data"


def oracle_index_lines(warcio, inputs, fields):
    from warcio.indexer import Indexer

    out = io.StringIO()
    real_stdout = sys.stdout
    try:
        sys.stdout = out
        Indexer(fields, [os.path.join(CORPUS, f) for f in inputs], "-").process_all()
    finally:
        sys.stdout = real_stdout
    return [json.loads(l) for l in out.getvalue().splitlines() if l.strip()]


def run_cli(capsys, argv):
    from warcio_spark.cli import main

    code = main(argv)
    outerr = capsys.readouterr()
    return code, outerr.out


@pytest.mark.parametrize(
    "inputs,fields",
    [
        (["example.warc.gz", "example.arc.gz"], "offset,warc-type,warc-target-uri"),
        (["example.warc.gz"], "offset,length,filename,http:status,http:content-type"),
        (["example.warc", "example.warc.gz"], "warc-type,warc-target-uri,warc-date"),
    ],
)
def test_index_parity(spark, warcio, capsys, inputs, fields):
    want = oracle_index_lines(warcio, inputs, fields.split(","))
    code, out = run_cli(
        capsys,
        ["index", "-f", fields] + [os.path.join(CORPUS, f) for f in inputs],
    )
    assert code == 0
    got = [json.loads(l) for l in out.splitlines() if l.strip()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w
        assert list(g.keys()) == list(w.keys())  # field order preserved


def test_check_exit_codes(spark, capsys, tmp_path):
    code, out = run_cli(capsys, ["check", os.path.join(CORPUS, "example.warc")])
    assert code == 0
    # example-digest.warc ships a deliberately broken payload digest on
    # record 1 (test/test_archiveiterator.py:343-349) -> exit 1
    code, _ = run_cli(capsys, ["check", os.path.join(CORPUS, "example-digest.warc")])
    assert code == 1
    # mutilate a digest -> nonzero exit (the checker's OR-fold,
    # warcio/checker.py:19,29-30)
    with open(os.path.join(CORPUS, "example.warc"), "rb") as f:
        data = f.read()
    bad = data.replace(b"WARC-Payload-Digest: sha1:", b"WARC-Payload-Digest: sha1:111", 1)
    p = tmp_path / "bad.warc"
    p.write_bytes(bad)
    code, out = run_cli(capsys, ["check", str(p)])
    assert code == 1
    rep = [json.loads(l) for l in out.splitlines()]
    assert rep[0]["fail"] >= 1


def test_extract_payload(capsys, warcio):
    from warcio_spark.cli import main

    # response record of the chunked example sits at offset 405
    import contextlib

    buf = io.BytesIO()

    class _Cap:
        buffer = buf

        def write(self, s):
            pass

    real = sys.stdout
    try:
        sys.stdout = _Cap()
        code = main(["extract", "--payload",
                     os.path.join(CORPUS, "example-iana.org-chunked.warc"), "405"])
    finally:
        sys.stdout = real
    assert code == 0
    assert b"Internet Assigned Numbers Authority" in buf.getvalue()


def test_crawl_cli(spark, capsys, tmp_path):
    code, out = run_cli(
        capsys,
        ["crawl", "--seeds", "200", "--rounds", "2", "--state",
         str(tmp_path / "st")],
    )
    assert code == 0
    summary = json.loads(out.splitlines()[-1])
    assert summary["last_round"] == 2
    assert summary["rounds"][0]["n_scheduled"] > 0


def test_cli_ingest_incremental(tmp_path):
    """CLI ingest: first call covers the file, second is a no-op."""
    import json
    import shutil

    from warcio_spark.cli import main

    wdir = tmp_path / "w"
    wdir.mkdir()
    shutil.copy("/root/reference/test/data/example.warc.gz", wdir)
    state = str(tmp_path / "st")

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["ingest", str(wdir), "--state", state]) == 0
        assert main(["ingest", str(wdir), "--state", state]) == 0
    first, second = (json.loads(l) for l in buf.getvalue().strip().splitlines())
    assert first["n_records"] == 6 and first["batch"] == 1
    assert second["batch"] is None


def test_wet_cli_reference_readable(spark, capsys, tmp_path, warcio):
    """`wet` verb writes conversion records the reference library reads."""
    out_dir = str(tmp_path / "wet_out")
    code, out = run_cli(capsys, [
        "wet", os.path.join(CORPUS, "example.warc.gz"),
        "--output", out_dir, "--files", "1",
    ])
    assert code == 0
    paths = [l for l in out.splitlines() if l.strip()]
    assert len(paths) == 1
    from warcio.archiveiterator import ArchiveIterator

    with open(paths[0], "rb") as f:
        types = [r.rec_type for r in ArchiveIterator(f, check_digests="raise")]
    assert types and set(types) == {"conversion"}


def test_wat_cli_reference_readable(spark, capsys, tmp_path, warcio):
    """`wet --wat` writes WAT metadata records the reference reads; the
    response envelopes carry the HTML-Metadata Links block."""
    out_dir = str(tmp_path / "wat_out")
    code, out = run_cli(capsys, [
        "wet", os.path.join(CORPUS, "example.warc.gz"),
        "--output", out_dir, "--files", "1", "--wat",
    ])
    assert code == 0
    paths = [l for l in out.splitlines() if l.strip()]
    assert len(paths) == 1
    from warcio.archiveiterator import ArchiveIterator

    n_links = 0
    with open(paths[0], "rb") as f:
        for rec in ArchiveIterator(f, check_digests="raise"):
            assert rec.rec_type == "metadata"
            env = json.loads(rec.content_stream().read())["Envelope"]
            links = (
                env["Payload-Metadata"]
                .get("HTTP-Response-Metadata", {})
                .get("HTML-Metadata", {})
                .get("Links", [])
            )
            n_links += len(links)
    assert n_links > 0


def test_cdxj_cli_sorted_lines(spark, capsys):
    code, out = run_cli(capsys, [
        "cdxj", os.path.join(CORPUS, "example.warc.gz"),
    ])
    assert code == 0
    lines = [l for l in out.splitlines() if l.strip()]
    # CDX merge order is (urlkey, timestamp); same-second captures of the
    # same urlkey tie-break deterministically but not by whole-line sort.
    keys = [tuple(l.split(" ", 2)[:2]) for l in lines]
    assert keys and keys == sorted(keys)
    key, ts, block = lines[0].split(" ", 2)
    assert key.startswith("com,example)") and len(ts) == 14
    json.loads(block)


def test_cdx11_cli_classic_lines(spark, capsys):
    """--cdx11: classic 11-field Wayback lines, field-for-field equal to
    the CDXJ index over the same corpus (same capture set, same sources;
    only the rendering differs: '-' markers, bare-b32 digest, stripped
    mime)."""
    code, out = run_cli(capsys, [
        "cdxj", os.path.join(CORPUS, "example.warc.gz"), "--cdx11",
    ])
    assert code == 0
    lines = out.splitlines()
    assert lines[0] == " CDX N b a m s k r M S V g"
    body = [l for l in lines[1:] if l.strip()]
    assert body
    for l in body:
        toks = l.split(" ")
        assert len(toks) == 11 and all(toks)
        assert len(toks[1]) == 14 and toks[1].isdigit()
        assert toks[6] == "-" and toks[7] == "-"  # redirect, robotflags

    from warcio_spark.operators.indexer import index_cdx11, index_cdxj
    from warcio_spark.sources import read_warc

    recs = read_warc(spark, os.path.join(CORPUS, "example.warc.gz"),
                     include_payload=False, include_content=False)
    cdxj = {}
    for r in index_cdxj(recs).collect():
        blk = json.loads(r.block)
        cdxj[(r.urlkey, r.timestamp, blk.get("offset"))] = blk
    got = index_cdx11(recs).collect()
    assert len(got) == len(cdxj) == len(body)
    for r in got:
        toks = r.line.split(" ")
        blk = cdxj[(toks[0], toks[1], toks[9])]
        assert toks[2] == blk["url"]
        assert toks[3] == blk.get("mime", "-").replace(" ", "")
        assert toks[4] == blk.get("status", "-")
        digest = blk.get("digest")
        assert toks[5] == (digest.split(":")[-1] if digest else "-")
        assert toks[8] == blk.get("length", "-")
        assert toks[10] == blk.get("filename", "-")


def test_archive_cli_reference_readable(spark, capsys, tmp_path, warcio):
    """`archive` verb writes response records the reference reads with
    digests raised."""
    out_dir = str(tmp_path / "arch")
    code, out = run_cli(capsys, [
        "archive", "--pages", "40", "--output", out_dir, "--files", "1",
    ])
    assert code == 0
    paths = [l for l in out.splitlines() if l.strip()]
    assert len(paths) == 1
    from warcio.archiveiterator import ArchiveIterator

    with open(paths[0], "rb") as f:
        types = [r.rec_type for r in ArchiveIterator(f, check_digests="raise")]
    assert len(types) == 40 and set(types) == {"response"}


def test_crawl_archive_pipeline(spark, capsys, tmp_path, warcio):
    """crawl --pages --archive: the full pipeline — link-discovery crawl,
    then every fetched page archived as reference-readable WARC."""
    import glob

    from warcio.archiveiterator import ArchiveIterator

    code, out = run_cli(capsys, [
        "crawl", "--seeds", "40", "--pages", "200", "--rounds", "2",
        "--state", str(tmp_path / "st"), "--archive", str(tmp_path / "arch"),
    ])
    assert code == 0
    summary = json.loads(out.splitlines()[-1])
    assert summary["archived_files"] >= 1
    n = 0
    for p in glob.glob(str(tmp_path / "arch" / "*.warc.gz")):
        with open(p, "rb") as f:
            for rec in ArchiveIterator(f, check_digests="raise"):
                assert rec.rec_type == "response"
                n += 1
    assert 0 < n <= summary["rounds"][-1]["n_seen"]


def test_crawl_archive_wet_cdxj_pipeline(spark, capsys, tmp_path, warcio):
    """The composed Common-Crawl-style pipeline: link-discovery crawl ->
    WARC archive -> WET conversion records + CDXJ index, all
    reference-readable."""
    import glob

    from warcio.archiveiterator import ArchiveIterator

    code, out = run_cli(capsys, [
        "crawl", "--seeds", "40", "--pages", "200", "--rounds", "2",
        "--state", str(tmp_path / "st"), "--archive", str(tmp_path / "arch"),
    ])
    assert code == 0
    warcs = sorted(glob.glob(str(tmp_path / "arch" / "*.warc.gz")))
    assert warcs
    n_responses = 0
    for p in warcs:
        with open(p, "rb") as f:
            n_responses += sum(
                1 for r in ArchiveIterator(f) if r.rec_type == "response"
            )

    code, out = run_cli(capsys, [
        "wet", *warcs, "--output", str(tmp_path / "wet"), "--files", "1",
    ])
    assert code == 0
    wet_paths = [l for l in out.splitlines() if l.strip()]
    n_conversions = 0
    with open(wet_paths[0], "rb") as f:
        for rec in ArchiveIterator(f, check_digests="raise"):
            assert rec.rec_type == "conversion"
            n_conversions += 1
    assert n_conversions == n_responses > 0

    code, out = run_cli(capsys, ["cdxj", *warcs])
    assert code == 0
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == n_responses
    keys = [tuple(l.split(" ", 2)[:2]) for l in lines]
    assert keys == sorted(keys)


def test_cli_fetch_via_cdx11_index(spark, capsys, tmp_path, warcio):
    """classic-CDX round trip: cdxj --cdx11 -> fetch --cdx11. The reader
    must NULL out the header line and '-' markers and still carry exact
    byte ranges (length/offset/filename) for the targeted fetch."""
    import json as _json

    from warcio_spark.kernels.build import build_record, serialize_record

    adir = tmp_path / "arch"
    adir.mkdir()
    members = []
    for i in range(12):
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + b"<html>doc-%d</html>" % i)
        members.append(serialize_record(
            build_record(f"http://site{i % 2}.com/c/{i}", "response",
                         payload=body, record_id=f"<urn:uuid:c{i}>",
                         warc_date="2024-03-01T00:00:00Z"), gzip=True))
    (adir / "corpus.warc.gz").write_bytes(b"".join(members))

    code, out = run_cli(capsys, [
        "cdxj", str(adir / "corpus.warc.gz"), "--cdx11",
    ])
    assert code == 0
    assert out.splitlines()[0] == " CDX N b a m s k r M S V g"
    idx = tmp_path / "idx.cdx"
    idx.write_text(out)

    code, out = run_cli(capsys, [
        "fetch", "--index", str(idx), "--base", str(adir), "--cdx11",
        "--urlkey-prefix", "com,site1)",
    ])
    assert code == 0
    rows = [_json.loads(l) for l in out.strip().splitlines()]
    assert len(rows) == 6
    assert all(r["url"].startswith("http://site1.com/") for r in rows)


def test_cli_fetch_via_index(spark, capsys, tmp_path, warcio):
    """cdxj verb -> fetch verb round trip: index a corpus, fetch a
    filtered subset by byte range, re-archive it, and have the REFERENCE
    library read the fetched archive back."""
    import json as _json

    from warcio_spark.kernels.build import build_record, serialize_record

    adir = tmp_path / "arch"
    adir.mkdir()
    members = []
    for i in range(30):
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + b"<html>doc-%d</html>" % i)
        members.append(serialize_record(
            build_record(f"http://site{i % 3}.com/p/{i}", "response",
                         payload=body, record_id=f"<urn:uuid:f{i}>",
                         warc_date="2024-03-01T00:00:00Z"), gzip=True))
    (adir / "corpus.warc.gz").write_bytes(b"".join(members))

    code, out = run_cli(capsys, ["cdxj", str(adir / "corpus.warc.gz")])
    assert code == 0
    idx = tmp_path / "idx.cdxj"
    idx.write_text(out)

    # list mode, filtered to one site (10 of 30 captures)
    code, out = run_cli(capsys, [
        "fetch", "--index", str(idx), "--base", str(adir),
        "--urlkey-prefix", "com,site1)",
    ])
    assert code == 0
    rows = [_json.loads(l) for l in out.strip().splitlines()]
    assert len(rows) == 10
    assert all(r["url"].startswith("http://site1.com/") for r in rows)

    # archive mode: reference reads the re-archived subset back
    outdir = tmp_path / "subset"
    code, out = run_cli(capsys, [
        "fetch", "--index", str(idx), "--base", str(adir),
        "--urlkey-prefix", "com,site1)", "--output", str(outdir),
        "--files", "1",
    ])
    assert code == 0
    from warcio.archiveiterator import ArchiveIterator

    got = []
    for p in sorted(outdir.glob("*.warc.gz")):
        with open(p, "rb") as f:
            for rec in ArchiveIterator(f, check_digests="raise"):
                got.append(rec.rec_headers.get_header("WARC-Target-URI"))
    assert sorted(got) == sorted(r["url"] for r in rows)


def test_zipnum_cli_roundtrip_and_lookup(spark, capsys, tmp_path):
    """zipnum verb packs exactly the cdxj verb's lines; lookup returns
    the prefix-filtered subset in merge order."""
    out_dir = str(tmp_path / "cluster")
    warc = os.path.join(CORPUS, "example.warc.gz")
    code, cdxj_out = run_cli(capsys, ["cdxj", warc])
    assert code == 0
    want = sorted(l for l in cdxj_out.splitlines() if l.strip())

    code, _ = run_cli(
        capsys, ["zipnum", warc, "--out", out_dir, "--lines-per-block", "2"])
    assert code == 0
    assert os.path.exists(os.path.join(out_dir, "cluster.idx"))

    from warcio_spark.sources.zipnum import read_zipnum

    got = sorted(r["line"] for r in read_zipnum(spark, out_dir).collect())
    assert got == want

    prefix = want[0].split(" ", 1)[0].rsplit(")", 1)[0]
    code, lines = run_cli(capsys, ["lookup", out_dir, prefix])
    assert code == 0
    got_lookup = [l for l in lines.splitlines() if l.strip()]
    assert got_lookup == sorted(l for l in want if l.startswith(prefix))
    assert got_lookup


def test_lookup_cli_multi_cluster_merge(spark, capsys, tmp_path):
    """Several clusters = query-time merge (incremental indexing): the
    union of two half-corpus clusters answers prefix lookups exactly
    like one full cluster."""
    from pyspark.sql import functions as F

    from warcio_spark.operators.indexer import index_cdxj
    from warcio_spark.sources import read_warc

    warc = os.path.join(CORPUS, "example.warc.gz")
    lines = index_cdxj(read_warc(spark, warc, include_payload=False,
                                 include_content=False)).select("line")
    rows = sorted(r["line"] for r in lines.collect())
    half = len(rows) // 2
    from warcio_spark.sources.zipnum import write_zipnum

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    mk = lambda rs: spark.createDataFrame([(l,) for l in rs], ["line"])
    write_zipnum(mk(rows[:half]), a, lines_per_block=2, num_parts=1)
    write_zipnum(mk(rows[half:]), b, lines_per_block=2, num_parts=1)

    prefix = rows[0].split(" ", 1)[0].rsplit(")", 1)[0]
    code, out = run_cli(capsys, ["lookup", a, b, prefix])
    assert code == 0
    got = [l for l in out.splitlines() if l.strip()]
    assert got == sorted(l for l in rows if l.startswith(prefix))
    assert got


def test_lookup_cli_pagination(spark, capsys, tmp_path):
    """--show-num-pages / --page N --page-size M over one cluster:
    union of the pages equals the plain lookup; page count matches."""
    import json as _json

    from warcio_spark.operators.indexer import index_cdxj
    from warcio_spark.sources import read_warc
    from warcio_spark.sources.zipnum import write_zipnum

    warc = os.path.join(CORPUS, "example.warc.gz")
    lines = index_cdxj(read_warc(spark, warc, include_payload=False,
                                 include_content=False)).select("line")
    out_dir = str(tmp_path / "cluster")
    write_zipnum(lines, out_dir, lines_per_block=2, num_parts=2)

    prefix = ""
    code, out = run_cli(capsys, ["lookup", out_dir, prefix,
                                 "--show-num-pages", "--page-size", "2"])
    assert code == 0
    pages = _json.loads(out)["pages"]
    assert pages >= 1

    all_lines = []
    for p in range(pages):
        code, out = run_cli(capsys, ["lookup", out_dir, prefix,
                                     "--page", str(p), "--page-size", "2"])
        assert code == 0
        all_lines.extend(l for l in out.splitlines() if l.strip())
    code, plain = run_cli(capsys, ["lookup", out_dir, prefix])
    assert sorted(all_lines) == sorted(
        l for l in plain.splitlines() if l.strip())

    # pagination over two clusters is refused, not silently wrong
    code, _ = run_cli(capsys, ["lookup", out_dir, out_dir, prefix,
                               "--page", "0"])
    assert code == 2


def test_cdxq_cli_matches_library(spark, capsys, tmp_path):
    """cdxq verb == sources/cdxj.cdx_query over the same index file:
    same rows, server order, fl projection with '-' for NULL."""
    from pyspark.sql import functions as F

    from warcio_spark.operators.indexer import index_cdxj
    from warcio_spark.sources import read_warc
    from warcio_spark.sources.cdxj import cdx_query, parse_cdxj_lines

    warc = os.path.join(CORPUS, "example.warc.gz")
    lines = index_cdxj(read_warc(spark, warc, include_payload=False,
                                 include_content=False)).select("line")
    idx_path = str(tmp_path / "idx.cdxj")
    with open(idx_path, "w") as f:
        for r in lines.collect():
            f.write(r["line"] + "\n")

    argv = ["cdxq", idx_path, "--url", "http://example.com/",
            "--match-type", "domain", "--filter", "mime:text/.*",
            "--collapse", "digest"]
    code, out = run_cli(capsys, argv)
    assert code == 0
    got = [l for l in out.splitlines() if l.strip()]

    raw = spark.read.text(idx_path).withColumnRenamed("value", "line")
    typed = parse_cdxj_lines(raw, keep=("line",)).filter(
        F.col("urlkey").isNotNull())
    want = [
        r["line"] for r in cdx_query(
            typed, url="http://example.com/", match_type="domain",
            filters=["mime:text/.*"], collapse="digest",
        ).orderBy("urlkey", "timestamp", "url").collect()
    ]
    assert got == want
    assert got  # the corpus has text/* captures under example.com

    # fl projection prints space-joined values, NULL as '-'
    code, out = run_cli(capsys, argv + ["--fl", "timestamp,status,mime"])
    assert code == 0
    fl_lines = [l for l in out.splitlines() if l.strip()]
    assert len(fl_lines) == len(want)
    assert all(len(l.split(" ")) == 3 for l in fl_lines)


def test_diff_cli_summary_and_list(spark, capsys, tmp_path):
    """diff verb == sources/cdxj.capture_diff over the same index file:
    summary counts fold the per-url classification, --list lines match
    the library row-for-row."""
    from warcio_spark.sources.cdxj import capture_diff, parse_cdxj_lines

    caps = [
        ("com,a)/1", "20240105000000", "http://a/1", "D1"),
        ("com,a)/1", "20240210000000", "http://a/1", "D2"),
        ("com,a)/2", "20240110000000", "http://a/2", "S"),
        ("com,a)/2", "20240215000000", "http://a/2", "S"),
        ("com,a)/3", "20240112000000", "http://a/3", "G"),
        ("com,a)/4", "20240216000000", "http://a/4", "N"),
    ]
    idx_path = str(tmp_path / "idx.cdxj")
    with open(idx_path, "w") as f:
        for k, ts, url, dg in caps:
            f.write('%s %s {"url": "%s", "digest": "%s"}\n'
                    % (k, ts, url, dg))

    argv = ["diff", idx_path, "--a-from", "202401", "--a-to", "202401",
            "--b-from", "202402", "--b-to", "202402"]
    code, out = run_cli(capsys, argv)
    assert code == 0
    summary = dict((l.split("\t")[0], int(l.split("\t")[1]))
                   for l in out.splitlines() if l.strip())
    assert summary == {"added": 1, "gone": 1, "changed": 1,
                       "unchanged": 1}

    code, out = run_cli(capsys, argv + ["--list"])
    assert code == 0
    got = [l.split("\t") for l in out.splitlines() if l.strip()]

    raw = spark.read.text(idx_path).withColumnRenamed("value", "line")
    want = {r.urlkey: r for r in capture_diff(
        parse_cdxj_lines(raw), ("202401", "202401"),
        ("202402", "202402")).collect()}
    assert len(got) == len(want)
    for k, change, url, da, db in got:
        w = want[k]
        assert (change, url) == (w.change, w.url)
        assert da == (w.digest_a or "-") and db == (w.digest_b or "-")


def test_audit_cli_exit_and_verdicts(spark, capsys, tmp_path):
    """audit verb: DENY lines for violations, exit 1 when any url is
    denied and 0 when clean; unruled hosts pass."""
    rdir = tmp_path / "robots"
    rdir.mkdir()
    (rdir / "h1.com").write_bytes(
        b"User-agent: *\nDisallow: /secret\nAllow: /secret/ok\n")
    urls = tmp_path / "urls.txt"
    urls.write_text("http://h1.com/fine\n"
                    "http://h1.com/secret/x\n"
                    "http://h1.com/secret/ok/y\n"
                    "http://nowhere.net/a\n")

    argv = ["audit", str(urls), "--robots-dir", str(rdir)]
    code, out = run_cli(capsys, argv)
    assert code == 1  # a violation exists
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines == ["DENY\thttp://h1.com/secret/x"]

    code, out = run_cli(capsys, argv + ["--all"])
    assert code == 1
    verdicts = dict(l.split("\t")[::-1] for l in out.splitlines()
                    if l.strip())
    assert verdicts["http://h1.com/fine"] == "ALLOW"
    assert verdicts["http://h1.com/secret/ok/y"] == "ALLOW"
    assert verdicts["http://nowhere.net/a"] == "ALLOW"

    clean = tmp_path / "clean.txt"
    clean.write_text("http://h1.com/fine\n")
    code, out = run_cli(capsys, ["audit", str(clean),
                                 "--robots-dir", str(rdir)])
    assert code == 0 and out.strip() == ""
