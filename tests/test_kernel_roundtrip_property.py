"""Property-based round-trip: parse(serialize(record)) == record for random
records, and serialize(parse(bytes)) is stable — the engine's
parse∘serialize identity invariant (mirrors test/test_writer.py:827-845)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from warcio_spark.kernels.build import build_record, serialize_record, serialize_records
from warcio_spark.kernels.parse import parse_warc_bytes

PINNED_ID = "<urn:uuid:00000000-0000-0000-0000-0000000000aa>"
PINNED_DATE = "2024-06-01T00:00:00Z"

header_name = st.text(
    alphabet=string.ascii_letters + "-", min_size=1, max_size=20
).filter(lambda s: s.strip("-") == s)
header_value = st.text(
    alphabet=string.ascii_letters + string.digits + " ;=/.,+\"'()[]",
    min_size=0, max_size=60,
).map(str.strip)

http_headers = st.lists(st.tuples(header_name, header_value), max_size=8)
payload_bytes = st.binary(max_size=4096)


@settings(max_examples=120, deadline=None)
@given(
    body=payload_bytes,
    hdrs=http_headers,
    status=st.sampled_from(["200 OK", "404 Not Found", "301 Moved"]),
    gzip=st.booleans(),
    path=st.text(alphabet=string.ascii_lowercase + string.digits + "/", max_size=30),
)
def test_response_roundtrip(body, hdrs, status, gzip, path):
    url = "http://example.com/" + path
    # drop headers the serializer itself manages
    hdrs = [
        (n, v) for n, v in hdrs
        if n.lower() not in ("content-length", "transfer-encoding",
                             "content-encoding")
    ]
    rec = build_record(
        url, "response", payload=body,
        http_headers=("HTTP/1.1", status, hdrs),
        record_id=PINNED_ID, warc_date=PINNED_DATE,
    )
    blob = serialize_record(rec, gzip=gzip)
    out = parse_warc_bytes(blob, filename="t", check_digests=True)
    assert out["error"] is None
    assert len(out["records"]) == 1
    got = out["records"][0]
    assert got["rec_type"] == "response"
    assert got["url"] == url.replace(" ", "%20")
    assert got["payload"] == body
    assert got["content"] == body
    assert got["http_statusline"] == status
    assert got["digest_ok"] in (True, None)  # None only if no digests -> never
    assert got["digest_ok"] is True
    # second serialize is byte-stable (idempotent fixpoint)
    blob2 = serialize_record(got, gzip=gzip)
    assert parse_warc_bytes(blob2)["records"][0]["payload"] == body


@settings(max_examples=60, deadline=None)
@given(
    bodies=st.lists(payload_bytes, min_size=1, max_size=6),
    gzip=st.booleans(),
)
def test_multi_record_file_roundtrip(bodies, gzip):
    recs = [
        build_record(
            "http://h{0}.example.com/x".format(i), "resource", payload=b,
            record_id=PINNED_ID, warc_date=PINNED_DATE,
        )
        for i, b in enumerate(bodies)
    ]
    blob = serialize_records(recs, gzip=gzip)
    out = parse_warc_bytes(blob, filename="multi", check_digests=True)
    assert out["error"] is None
    assert [r["payload"] for r in out["records"]] == bodies
    assert all(r["digest_ok"] for r in out["records"])
    if gzip:
        # member offsets are compressed-file offsets; re-parse from each
        # offset must land on the same record (splittability)
        for want, rec in zip(bodies, out["records"]):
            sub = parse_warc_bytes(blob, start_offset=rec["offset"], max_records=1)
            assert sub["records"][0]["payload"] == want


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=2000))
def test_parser_never_crashes_on_garbage(data):
    out = parse_warc_bytes(data, filename="garbage", check_digests=True)
    assert isinstance(out["records"], list)
    assert out["err_count"] >= 0
