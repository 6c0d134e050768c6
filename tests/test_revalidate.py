"""Conditional-GET revalidation layer (plans/revalidate.py): validator
extraction, RFC 9110 verbatim echo, and 304 -> server-not-modified
revisit records the reference library reads back."""

import pytest
from pyspark.sql import functions as F

from warcio_spark.kernels.build import build_record, serialize_records
from warcio_spark.plans.revalidate import (
    conditional_requests,
    not_modified_revisits,
    validators_table,
)
from warcio_spark.sources import read_warc


def _resp(url, body, rid, date, headers=""):
    payload = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        + headers + "\r\n"
    ).encode() + body
    return build_record(url, "response", payload=payload,
                        record_id=rid, warc_date=date)


@pytest.fixture()
def archived(spark, tmp_path):
    recs = [
        # two captures of /a: the LATER one carries different validators
        _resp("http://h.com/a", b"v1", "<urn:uuid:a1>",
              "2024-01-01T00:00:00Z",
              'ETag: "old-etag"\r\nLast-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n'),
        _resp("http://h.com/a", b"v2", "<urn:uuid:a2>",
              "2024-02-01T00:00:00Z",
              'ETag: W/"new-etag"\r\n'),
        # /b: only Last-Modified
        _resp("http://h.com/b", b"bb", "<urn:uuid:b1>",
              "2024-01-15T00:00:00Z",
              "Last-Modified: Tue, 02 Jan 2024 03:04:05 GMT\r\n"),
        # /c: no validators at all
        _resp("http://h.com/c", b"cc", "<urn:uuid:c1>",
              "2024-01-20T00:00:00Z"),
        build_record("http://h.com/a", "request",
                     payload=b"GET /a HTTP/1.1\r\n\r\n",
                     record_id="<urn:uuid:rq>",
                     warc_date="2024-01-01T00:00:00Z"),
    ]
    p = tmp_path / "prev.warc.gz"
    p.write_bytes(serialize_records(recs, gzip=True))
    return read_warc(spark, str(p))


def test_validators_latest_capture_wins(spark, archived):
    got = {r.url: r for r in validators_table(archived).collect()}
    assert set(got) == {"http://h.com/a", "http://h.com/b", "http://h.com/c"}
    a = got["http://h.com/a"]
    # the 2024-02-01 capture wins wholesale: weak etag kept verbatim,
    # old capture's Last-Modified NOT inherited
    assert a.etag == 'W/"new-etag"'
    assert a.last_modified is None
    assert a.last_fetch_ts.year == 2024 and a.last_fetch_ts.month == 2
    b = got["http://h.com/b"]
    assert b.etag is None
    assert b.last_modified == "Tue, 02 Jan 2024 03:04:05 GMT"
    c = got["http://h.com/c"]
    assert c.etag is None and c.last_modified is None


def test_conditional_requests_echo_verbatim(spark, archived):
    vals = validators_table(archived)
    due = spark.createDataFrame(
        [("http://h.com/a", 1.0), ("http://h.com/b", 2.0),
         ("http://h.com/c", 3.0), ("http://h.com/never-seen", 4.0)],
        "url string, priority double")
    got = {r.url: r for r in conditional_requests(due, vals).collect()}
    assert got["http://h.com/a"].if_none_match == 'W/"new-etag"'
    assert got["http://h.com/a"].if_modified_since is None
    assert got["http://h.com/a"].revalidate is True
    assert got["http://h.com/b"].if_modified_since == \
        "Tue, 02 Jan 2024 03:04:05 GMT"
    assert got["http://h.com/b"].revalidate is True
    assert got["http://h.com/c"].revalidate is False
    assert got["http://h.com/never-seen"].revalidate is False
    assert got["http://h.com/never-seen"].priority == 4.0  # passthrough


def test_not_modified_revisits_through_reference(spark, archived, warcio,
                                                 tmp_path):
    from warcio.archiveiterator import ArchiveIterator

    from warcio_spark.operators.writer import write_warc

    vals = validators_table(archived)
    new = [
        build_record("http://h.com/a", "response",
                     payload=b'HTTP/1.1 304 Not Modified\r\nETag: W/"new-etag"\r\n\r\n',
                     record_id="<urn:uuid:n304>",
                     warc_date="2024-03-01T00:00:00Z"),
        _resp("http://h.com/d", b"fresh", "<urn:uuid:n200>",
              "2024-03-01T00:00:01Z"),
    ]
    p = tmp_path / "new.warc.gz"
    p.write_bytes(serialize_records(new, gzip=True))
    out = not_modified_revisits(read_warc(spark, str(p)), vals)
    types = {r.url: r.rec_type for r in out.collect()}
    assert types == {"http://h.com/a": "revisit",
                     "http://h.com/d": "response"}

    paths = write_warc(out.orderBy("offset"), str(tmp_path / "out"),
                       gzip=True, files=1)
    with open(paths[0], "rb") as f:
        got = {r.rec_headers.get_header("WARC-Target-URI"): r
               for r in ArchiveIterator(f, check_digests="raise")}
    rv = got["http://h.com/a"]
    assert rv.rec_type == "revisit"
    assert rv.rec_headers.get_header("WARC-Profile") == (
        "http://netpreserve.org/warc/1.0/revisit/server-not-modified")
    assert rv.rec_headers.get_header(
        "WARC-Refers-To-Target-URI") == "http://h.com/a"
    # refers-to date = the validators row's last capture (2024-02-01)
    assert rv.rec_headers.get_header(
        "WARC-Refers-To-Date") == "2024-02-01T00:00:00Z"
    assert got["http://h.com/d"].rec_type == "response"
