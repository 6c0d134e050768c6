"""Writer kernel vs the reference writer as a runtime oracle.

Records built/parsed by both sides with pinned record-id + date must
serialize to byte-identical WARC output (mirrors the golden-record strategy
of test/test_writer.py:22-32,544-600 without copying the golden strings).
"""

import io
import os

import pytest

from warcio_spark.kernels.build import (
    build_record,
    build_revisit_record,
    build_warcinfo_record,
    serialize_record,
)
from warcio_spark.kernels.parse import parse_warc_bytes

CORPUS = "/root/reference/test/data"

PINNED_ID = "<urn:uuid:12345678-feb0-11e6-8f83-68a86d1772ce>"
PINNED_DATE = "2000-01-01T00:00:00Z"


@pytest.fixture()
def oracle_writer(warcio, monkeypatch):
    """Reference writer with pinned id/date, like FixedTestRecordMixin."""
    from warcio.warcwriter import BufferWARCWriter

    def make(**kwargs):
        writer = BufferWARCWriter(gzip=False, **kwargs)
        monkeypatch.setattr(type(writer), "_make_warc_id", classmethod(lambda cls: PINNED_ID))
        monkeypatch.setattr(type(writer), "curr_warc_date", lambda self: PINNED_DATE)
        return writer

    return make


HTTP_RESP = (
    "HTTP/1.0",
    "200 OK",
    [("Content-Type", 'text/plain; charset="UTF-8"'), ("Custom-Header", "somevalue")],
)
BODY = b"some\ntext"


def test_response_record_bytes(oracle_writer):
    w = oracle_writer()
    from warcio.statusandheaders import StatusAndHeaders

    http = StatusAndHeaders("200 OK", list(HTTP_RESP[2]), protocol="HTTP/1.0")
    rec = w.create_warc_record(
        "http://example.com/", "response", payload=io.BytesIO(BODY),
        length=len(BODY), http_headers=http,
    )
    w.write_record(rec)
    oracle = w.get_contents()

    mine = serialize_record(
        build_record("http://example.com/", "response", payload=BODY,
                     http_headers=HTTP_RESP, record_id=PINNED_ID,
                     warc_date=PINNED_DATE)
    )
    assert mine == oracle


def test_request_record_bytes(oracle_writer):
    w = oracle_writer()
    from warcio.statusandheaders import StatusAndHeaders

    http = StatusAndHeaders(
        "GET / HTTP/1.0",
        [("User-Agent", "foo"), ("Host", "example.com")],
        is_http_request=True,
    )
    rec = w.create_warc_record("http://example.com/", "request", http_headers=http)
    w.write_record(rec)
    oracle = w.get_contents()

    mine = serialize_record(
        build_record(
            "http://example.com/", "request",
            http_headers=("GET", "/ HTTP/1.0",
                          [("User-Agent", "foo"), ("Host", "example.com")]),
            record_id=PINNED_ID, warc_date=PINNED_DATE,
        )
    )
    assert mine == oracle


def test_warcinfo_record_bytes(oracle_writer):
    info = {"software": "recorder lib", "format": "WARC File Format 1.0",
            "json-metadata": '{"foo": "bar"}'}
    w = oracle_writer()
    w.write_record(w.create_warcinfo_record("testfile.warc.gz", dict(info)))
    oracle = w.get_contents()

    mine = serialize_record(
        build_warcinfo_record("testfile.warc.gz", dict(info),
                              record_id=PINNED_ID, warc_date=PINNED_DATE)
    )
    assert mine == oracle


def test_revisit_record_bytes(oracle_writer):
    w = oracle_writer()
    rec = w.create_revisit_record(
        "http://example.com/", "sha1:B2LTWWPUOYAH7UIPQ7ZUPQ4VMBSVC36A",
        "http://example.com/foo", "1999-01-01T00:00:00Z",
    )
    w.write_record(rec)
    oracle = w.get_contents()

    mine = serialize_record(
        build_revisit_record(
            "http://example.com/", "sha1:B2LTWWPUOYAH7UIPQ7ZUPQ4VMBSVC36A",
            "http://example.com/foo", "1999-01-01T00:00:00Z",
            record_id=PINNED_ID, warc_date=PINNED_DATE,
        )
    )
    assert mine == oracle


def test_warc_1_1_micros_date(oracle_writer):
    w = oracle_writer(warc_version="1.1")
    rec = w.create_warc_record("http://example.com/", "resource",
                               payload=io.BytesIO(b"data"), length=4)
    w.write_record(rec)
    oracle = w.get_contents()
    mine = serialize_record(
        build_record("http://example.com/", "resource", payload=b"data",
                     warc_version="1.1", record_id=PINNED_ID,
                     warc_date=PINNED_DATE)
    )
    assert mine == oracle


def test_non_ascii_header_percent_encoding(oracle_writer):
    http = ("HTTP/1.0", "200 OK",
            [("Content-Disposition", 'attachment; filename="测试.txt"'),
             ("X-Plain", "préférence")])
    w = oracle_writer()
    from warcio.statusandheaders import StatusAndHeaders

    oracle_http = StatusAndHeaders("200 OK", list(http[2]), protocol="HTTP/1.0")
    rec = w.create_warc_record("http://example.com/", "response",
                               payload=io.BytesIO(BODY), length=len(BODY),
                               http_headers=oracle_http)
    w.write_record(rec)
    oracle = w.get_contents()
    mine = serialize_record(
        build_record("http://example.com/", "response", payload=BODY,
                     http_headers=http, record_id=PINNED_ID,
                     warc_date=PINNED_DATE)
    )
    assert mine == oracle


@pytest.mark.parametrize("fname", ["example.warc", "example.warc.gz",
                                   "example-resource.warc.gz",
                                   "example-digest.warc",
                                   "example-iana.org-chunked.warc"])
@pytest.mark.parametrize("gzip", [False, True])
def test_roundtrip_reserialize_matches_reference(warcio, fname, gzip):
    """parse -> serialize of a whole corpus file equals the reference's
    parse -> write for every record, including gzip member bytes."""
    from warcio.archiveiterator import ArchiveIterator
    from warcio.warcwriter import BufferWARCWriter

    with open(os.path.join(CORPUS, fname), "rb") as f:
        data = f.read()

    w = BufferWARCWriter(gzip=gzip)
    for record in ArchiveIterator(io.BytesIO(data)):
        w.write_record(record)
    oracle = w.get_contents()

    mine = b"".join(
        serialize_record(r, gzip=gzip)
        for r in parse_warc_bytes(data, filename=fname)["records"]
    )
    assert mine == oracle

    # and the reserialized bytes re-parse to the same records (identity)
    again = parse_warc_bytes(mine, filename=fname)
    assert again["error"] is None
    first = parse_warc_bytes(data, filename=fname)
    assert [r["rec_type"] for r in again["records"]] == [
        r["rec_type"] for r in first["records"]
    ]
    assert [r["content"] for r in again["records"]] == [
        r["content"] for r in first["records"]
    ]
