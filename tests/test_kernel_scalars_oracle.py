"""Scalar kernels (timestamps, digests, codecs) vs the reference oracle."""

import random
import string

from warcio_spark.kernels import chrono, digests, payload, textcodec


def test_ts14_padding_clamping(warcio):
    """The doctest table at warcio/timeutils.py:225-316 is the spec."""
    from warcio import timeutils

    cases = [
        "2014122609501011", "20141226095010", "2014122609501", "201412260950",
        "20141226095", "2014122609", "201412260", "20141226", "2014122",
        "201410", "20141", "2014", "201", "20", "2", "3", "",
        "20131709005601", "40001965252477", "2010abc", "201002abc",
        "00000000000000", "99999999999999", "20200230121212",
    ]
    for ts in cases:
        assert chrono.ts14_to_datetime(ts) == timeutils.timestamp_to_datetime(ts), ts
        assert chrono.ts14_to_iso(ts) == timeutils.timestamp_to_iso_date(ts), ts
        assert chrono.ts14_to_sec(ts) == timeutils.timestamp_to_sec(ts), ts


def test_iso_fractional_seconds(warcio):
    from warcio import timeutils

    cases = [
        "2013-12-26T10:11:12Z", "2013-12-26T10:11:12.456789Z",
        "2013-12-26T10:11:12.30Z", "2013-12-26T10:11:12.00001Z",
        "2013-12-26T10:11:12.000001Z", "2013-12-26T10:11:12.0000001Z",
        "2013-12-26T10:11:12.000000Z", "2013-12-26T10:11:12",
    ]
    for s in cases:
        assert chrono.iso_to_datetime(s) == timeutils.iso_date_to_datetime(s), s
        assert chrono.iso_to_ts14(s) == timeutils.iso_date_to_timestamp(s), s


def test_http_dates(warcio):
    from warcio import timeutils

    for s in ["Thu, 26 Dec 2013 09:50:10 GMT", "Sun, 26 Jan 2014 20:08:04 GMT"]:
        assert chrono.http_date_to_ts14(s) == timeutils.http_date_to_timestamp(s)
    for ts in ["20131226095000", "20140126200804", "2014"]:
        assert chrono.ts14_to_http_date(ts) == timeutils.timestamp_to_http_date(ts)
    assert chrono.sec_to_ts14(1388051410) == timeutils.sec_to_timestamp(1388051410)


def test_digest_b32(warcio):
    from warcio.utils import Digester

    rng = random.Random(42)
    for _ in range(50):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000)))
        for algo in ("sha1", "md5", "sha256"):
            d = Digester(algo)
            d.update(data)
            assert digests.digest_b32(data, algo) == str(d)


def test_digest_rfc3548_compare(warcio):
    import base64
    import hashlib

    data = b"hello warc"
    raw = hashlib.sha1(data).digest()
    b32 = "sha1:" + base64.b32encode(raw).decode()
    for claimed in (
        b32,
        "sha1:" + raw.hex().upper(),
        "sha1:" + base64.b64encode(raw).decode(),
        "sha1:" + base64.urlsafe_b64encode(raw).decode(),
    ):
        ok, problem = digests.verify_payload(data, claimed)
        assert ok is True, claimed
    ok, _ = digests.verify_payload(b"other", b32)
    assert ok is False


def test_decode_fallback(warcio):
    from warcio.statusandheaders import StatusAndHeadersParser

    cases = [b"plain ascii\r\n", "héllo".encode("utf-8"), "héllo".encode("iso-8859-1"),
             b"\xff\xfe mixed \xc3"]
    for raw in cases:
        assert textcodec.decode_fallback(raw) == StatusAndHeadersParser.decode_header(raw)


def test_percent_encode_headers(warcio):
    from warcio.statusandheaders import StatusAndHeaders

    header_sets = [
        [("Content-Disposition", 'attachment; filename="испытание.doc"')],
        [("X-Utf8", "préférence"), ("Plain", "ok")],
        [("Content-Disposition", "attachment; filename*=UTF-8''%D8%AA%D8%AC.doc")],
        [("Semi", "a;b=çdé;f=g")],
    ]
    for hdrs in header_sets:
        sah = StatusAndHeaders("200 OK", [tuple(h) for h in hdrs], protocol="HTTP/1.0")
        sah.percent_encode_non_ascii_headers()
        assert textcodec.percent_encode_non_ascii_headers(hdrs) == sah.headers, hdrs


def test_chunk_roundtrip_random(warcio):
    """Random chunked encodings decode identically to the reference reader."""
    import io

    from warcio.bufferedreaders import ChunkedDataReader

    rng = random.Random(7)
    for _ in range(30):
        parts = [
            "".join(rng.choice(string.ascii_letters) for _ in range(rng.randrange(1, 500))).encode()
            for _ in range(rng.randrange(1, 8))
        ]
        enc = b"".join(b"%x\r\n%s\r\n" % (len(p), p) for p in parts) + b"0\r\n\r\n"
        # sometimes corrupt it
        mode = rng.randrange(4)
        if mode == 1:
            enc = enc[: len(enc) // 2]  # cut off
        elif mode == 2:
            enc = b"zz" + enc  # bad first header
        elif mode == 3:
            enc = enc.replace(b"\r\n", b"\n", 1)  # bad terminator somewhere
        oracle = ChunkedDataReader(io.BytesIO(enc)).read()
        mine, _, _ = payload.dechunk_ex(enc)
        assert mine == oracle, (mode, enc[:80])


def test_gzip_member_split_roundtrip(warcio):
    rng = random.Random(3)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4000)))
             for _ in range(10)]
    data = b"".join(payload.gzip_member_compress(b) for b in blobs)
    members = payload.split_gzip_members(data)
    assert [m[2] for m in members] == blobs
    assert members[0][0] == 0
    assert sum(m[1] for m in members) == len(data)
