"""Truncation audit (operators/checker.truncation_audit /
truncation_census): hand cases per class, reference-corpus oracle (the
reference library recomputes reason/declared/body per record), census
rollup, parallelism invariance."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.checker import truncation_audit, truncation_census

HAND_SCHEMA = (
    "record_id string, filename string, "
    "rec_headers array<struct<name:string,value:string>>, "
    "http_headers array<struct<name:string,value:string>>, "
    "payload_length long"
)


def _row(rid, trunc=None, cl=None, body=-1, fname="f.warc"):
    rec = [("WARC-Type", "response")]
    if trunc is not None:
        rec.append(("WARC-Truncated", trunc))
    http = [("Content-Type", "text/html")]
    if cl is not None:
        http.append(("Content-Length", cl))
    return (rid, fname, rec, http, body)


def _audit(spark, rows, parts=None):
    df = spark.createDataFrame(rows, HAND_SCHEMA)
    if parts:
        df = df.repartition(parts)
    return {
        r.record_id: (
            r.truncated_reason, r.declared_cl, r.body_length,
            r.deficit, r.trunc_status,
        )
        for r in truncation_audit(df).collect()
    }


def test_hand_cases(spark):
    rows = [
        _row("declared-len", trunc="length", cl="100", body=40),
        _row("declared-empty", trunc="", cl="100", body=100),
        _row("declared-case", trunc=" TIME ", cl=None, body=5),
        _row("silent", cl="100", body=40),
        _row("overlong", cl="10", body=15),
        _row("clean-exact", cl="10", body=10),
        _row("clean-chunked", cl=None, body=123),
        _row("clean-bad-cl", cl="abc", body=40),
        _row("clean-no-payload", cl="100", body=-1),
    ]
    got = _audit(spark, rows)
    assert got["declared-len"] == ("length", 100, 40, 60, "declared")
    assert got["declared-empty"] == ("unspecified", 100, 100, None, "declared")
    assert got["declared-case"] == ("time", None, 5, None, "declared")
    assert got["silent"] == (None, 100, 40, 60, "silent")
    assert got["overlong"] == (None, 10, 15, None, "overlong")
    assert got["clean-exact"] == (None, 10, 10, None, "clean")
    assert got["clean-chunked"] == (None, None, 123, None, "clean")
    assert got["clean-bad-cl"] == (None, None, 40, None, "clean")
    assert got["clean-no-payload"] == (None, 100, None, None, "clean")
    assert _audit(spark, rows, parts=5) == got


def test_census_rollup(spark):
    rows = [
        _row("a", cl="100", body=40),            # silent, deficit 60
        _row("b", cl="50", body=10),             # silent, deficit 40
        _row("c", trunc="length", cl="9", body=4),  # declared, deficit 5
        _row("d", cl="10", body=10),             # clean
        _row("e", cl=None, body=3, fname="g.warc"),  # clean, other file
    ]
    df = spark.createDataFrame(rows, HAND_SCHEMA)
    got = {
        (r.filename, r.trunc_status, r.truncated_reason):
            (r.n, r.bytes_missing)
        for r in truncation_census(df).collect()
    }
    assert got[("f.warc", "silent", None)] == (2, 100)
    assert got[("f.warc", "declared", "length")] == (1, 5)
    assert got[("f.warc", "clean", None)] == (1, None)
    assert got[("g.warc", "clean", None)] == (1, None)
    assert len(got) == 4


@pytest.mark.parametrize("fname", [
    "example.warc",
    "example-trunc.warc",
    "example-iana.org-chunked.warc",
    "example-resource.warc.gz",
])
def test_reference_corpus_oracle(spark, warcio, corpus_dir, fname):
    """The reference library recomputes (reason, declared_cl, body
    length) per record; our audit must agree record-for-record."""
    from warcio.archiveiterator import ArchiveIterator

    from warcio_spark.sources import read_warc

    path = os.path.join(corpus_dir, fname)
    want = {}
    with open(path, "rb") as fh:
        for rec in ArchiveIterator(fh):
            rid = rec.rec_headers.get_header("WARC-Record-ID")
            raw = rec.rec_headers.get_header("WARC-Truncated")
            reason = None
            if raw is not None:
                reason = raw.strip().lower() or "unspecified"
            cl = None
            if rec.http_headers is not None:
                v = rec.http_headers.get_header("Content-Length")
                if v is not None and v.strip().isdigit():
                    cl = int(v.strip())
            body = (
                len(rec.raw_stream.read())
                if rec.http_headers is not None else None
            )
            deficit = (
                cl - body
                if cl is not None and body is not None and cl > body
                else None
            )
            if reason is not None:
                status = "declared"
            elif deficit is not None:
                status = "silent"
            elif cl is not None and body is not None and body > cl:
                status = "overlong"
            else:
                status = "clean"
            want[rid] = (reason, cl, body, deficit, status)

    got = {
        r.record_id: (
            r.truncated_reason, r.declared_cl, r.body_length,
            r.deficit, r.trunc_status,
        )
        for r in truncation_audit(read_warc(spark, path)).collect()
    }
    assert got == want
