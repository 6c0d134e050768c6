"""Record building + WARC serialization kernels.

Batch re-expression of the reference's writer path
(warcio/recordbuilder.py:82-213 + warcio/warcwriter.py:41-127): a record is a
plain dict (same shape the parser emits), the serializer returns the exact
bytes a WARC file would contain — one gzip member per record when gzip=True.
Round-trip identity parse(serialize(x)) == x is the engine invariant
(mirrors test/test_writer.py:827-845).
"""

from __future__ import annotations

from datetime import datetime, timezone

from .chrono import datetime_to_iso
from .digests import digest_b32
from .parse import (
    HTTP_REC_TYPES,
    HTTP_SCHEMES,
    HTTP_VERBS,
    HTTP_VERSIONS,
    _Cursor,
    _parse_status_headers,
    header_get,
    header_replace,
    make_record_id,
)
from .payload import gzip_member_compress
from .textcodec import percent_encode_non_ascii_headers

WARC_1_0 = "WARC/1.0"
WARC_1_1 = "WARC/1.1"

DEFAULT_CONTENT_TYPES = {
    "warcinfo": "application/warc-fields",
    "response": "application/http; msgtype=response",
    "revisit": "application/http; msgtype=response",
    "request": "application/http; msgtype=request",
    "metadata": "application/warc-fields",
}
FALLBACK_CONTENT_TYPE = "application/warc-record"
NO_PAYLOAD_DIGEST_TYPES = ("warcinfo", "revisit")

REVISIT_PROFILE_1_0 = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
REVISIT_PROFILE_1_1 = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def _headers_block_str(protocol, statusline, headers, header_filter=None):
    """Serialize protocol/status/headers to the wire string
    (warcio/statusandheaders.py:143-163)."""
    s = protocol or ""
    if s and statusline:
        s += " "
    if statusline:
        s += statusline
    if s:
        s += "\r\n"
    for h in headers:
        if header_filter:
            h = header_filter(h)
            if not h:
                continue
        s += ": ".join(h) + "\r\n"
    return s


def http_headers_buffer(http, header_filter=None) -> bytes:
    """ascii wire bytes of an http header block, %-encoding non-ascii values
    per RFC 8187/5987 on demand (warcio/statusandheaders.py:168-208)."""
    protocol, statusline, headers = http
    s = _headers_block_str(protocol, statusline, headers, header_filter)
    try:
        raw = s.encode("ascii")
    except (UnicodeEncodeError, UnicodeDecodeError):
        headers = percent_encode_non_ascii_headers(headers)
        raw = _headers_block_str(protocol, statusline, headers, header_filter).encode("ascii")
    return raw + b"\r\n"


def warc_headers_bytes(protocol, headers) -> bytes:
    """WARC header block — utf-8 allowed per spec (warcio/warcwriter.py:89-91)."""
    return _headers_block_str(protocol, "", headers).encode("utf-8") + b"\r\n"


def parse_http_from_payload(rec_type, uri, payload, length):
    """Auto-parse http headers out of a payload, mirroring the loader gating
    (warcio/recordloader.py:173-200). Returns (http|None, consumed)."""
    if length == 0 or rec_type not in HTTP_REC_TYPES:
        return None, 0
    if not uri or not uri.startswith(HTTP_SCHEMES):
        return None, 0
    cur = _Cursor(payload)
    prefixes = HTTP_VERBS if rec_type == "request" else HTTP_VERSIONS
    try:
        block = _parse_status_headers(cur, None, prefixes, False)
    except EOFError:
        return None, 0
    return (block["protocol"], block["statusline"], block["headers"]), cur.pos


def build_record(uri, rec_type, payload=b"", warc_headers=None,
                 warc_headers_dict=None, http_headers=None,
                 warc_content_type="", warc_version=None,
                 record_id=None, warc_date=None):
    """Build a record dict ready for serialization.

    ``http_headers`` is (protocol, statusline, headers) or None — when None
    and a payload is given, http headers are parsed out of the payload like
    the reference builder (warcio/recordbuilder.py:92-96). ``record_id`` /
    ``warc_date`` pin the synthesized values for deterministic output (the
    reference tests pin them the same way, test/test_writer.py:22-32).
    """
    version = warc_version or WARC_1_0
    if not version.startswith("WARC/"):
        version = "WARC/" + str(version)

    consumed = 0
    if payload and http_headers is None:
        http_headers, consumed = parse_http_from_payload(
            rec_type, uri, payload, len(payload)
        )
    body = payload[consumed:] if consumed else (payload or b"")

    if warc_headers is None:
        warc_headers = list((warc_headers_dict or {}).items())
        header_replace(warc_headers, "WARC-Type", rec_type)
        if header_get(warc_headers, "WARC-Record-ID") is None:
            warc_headers.append(("WARC-Record-ID", record_id or make_record_id()))
        if uri:
            header_replace(warc_headers, "WARC-Target-URI", uri)
        if header_get(warc_headers, "WARC-Date") is None:
            if warc_date is None:
                warc_date = datetime_to_iso(
                    datetime.now(timezone.utc).replace(tzinfo=None),
                    use_micros=(version >= WARC_1_1),
                )
            warc_headers.append(("WARC-Date", warc_date))
    else:
        warc_headers = list(warc_headers)

    if not warc_content_type:
        warc_content_type = header_get(warc_headers, "Content-Type") or (
            DEFAULT_CONTENT_TYPES.get(rec_type, FALLBACK_CONTENT_TYPE)
        )

    rec = {
        "format": "warc",
        "rec_type": rec_type,
        "warc_protocol": version,
        "rec_headers": warc_headers,
        "url": uri,
        "http_protocol": http_headers[0] if http_headers else None,
        "http_statusline": http_headers[1] if http_headers else None,
        "http_headers": http_headers[2] if http_headers else None,
        "content_type": warc_content_type,
        "length": len(body) + consumed if payload is not None else 0,
        "payload_length": len(body),
        "payload": body,
    }
    _ensure_digests(rec, block=False)
    return rec


def build_revisit_record(uri, digest, refers_to_uri, refers_to_date,
                         http_headers=None, warc_headers_dict=None,
                         warc_version=None, record_id=None, warc_date=None):
    """Revisit record pointing at a prior capture — the dedup emit
    (warcio/recordbuilder.py:62-80)."""
    assert digest, "digest can not be empty"
    rec = build_record(uri, "revisit", http_headers=http_headers,
                       warc_headers_dict=warc_headers_dict,
                       warc_version=warc_version, record_id=record_id,
                       warc_date=warc_date)
    profile = (REVISIT_PROFILE_1_1 if rec["warc_protocol"] == WARC_1_1
               else REVISIT_PROFILE_1_0)
    rec["rec_headers"].append(("WARC-Profile", profile))
    rec["rec_headers"].append(("WARC-Refers-To-Target-URI", refers_to_uri))
    rec["rec_headers"].append(("WARC-Refers-To-Date", refers_to_date))
    rec["rec_headers"].append(("WARC-Payload-Digest", digest))
    return rec


def build_warcinfo_record(filename, info, warc_version=None, record_id=None,
                          warc_date=None):
    """warcinfo record with 'name: value' fields payload
    (warcio/recordbuilder.py:38-60)."""
    warc_headers = [("WARC-Type", "warcinfo"),
                    ("WARC-Record-ID", record_id or make_record_id())]
    if filename:
        warc_headers.append(("WARC-Filename", filename))
    version = warc_version or WARC_1_0
    if not version.startswith("WARC/"):
        version = "WARC/" + str(version)
    if warc_date is None:
        warc_date = datetime_to_iso(datetime.now(timezone.utc).replace(tzinfo=None),
                                    use_micros=(version >= WARC_1_1))
    warc_headers.append(("WARC-Date", warc_date))
    payload = b"".join(
        "{0}: {1}\r\n".format(n, v).encode("utf-8") for n, v in info.items() if v
    )
    return build_record("", "warcinfo", payload=payload,
                        warc_headers=warc_headers, warc_version=version)


def _header_remove(headers, name):
    """Remove all headers with the given name, case-insensitive
    (warcio/statusandheaders.py:64-75)."""
    low = name.lower()
    for i in range(len(headers) - 1, -1, -1):
        if headers[i][0].lower() == low:
            del headers[i]


def _ensure_digests(rec, block=True, payload=True, header_filter=None):
    """Add WARC-Payload-Digest / WARC-Block-Digest when missing
    (warcio/recordbuilder.py:158-213). Payload digest added before block."""
    hdrs = rec["rec_headers"]
    if block and header_get(hdrs, "WARC-Block-Digest"):
        block = False
    if payload and (
        header_get(hdrs, "WARC-Payload-Digest")
        or rec["rec_type"] in NO_PAYLOAD_DIGEST_TYPES
    ):
        payload = False
    if not block and not payload:
        return

    body = rec.get("payload") or b""
    if payload:
        hdrs.append(("WARC-Payload-Digest", digest_b32(body)))
    if block:
        buff = b""
        if rec.get("http_headers") is not None:
            buff = http_headers_buffer(
                (rec["http_protocol"], rec["http_statusline"], rec["http_headers"]),
                header_filter,
            )
        hdrs.append(("WARC-Block-Digest", digest_b32(buff + body)))


def serialize_record(rec, gzip=False, header_filter=None) -> bytes:
    """Serialize one record dict to WARC wire bytes
    (warcio/warcwriter.py:41-109). With gzip=True the record becomes a single
    gzip member so the output concatenation stays splittable."""
    rec = dict(rec)
    rec["rec_headers"] = list(rec["rec_headers"])
    hdrs = rec["rec_headers"]
    body = rec.get("payload") or b""

    http = None
    headers_buff = b""
    if rec.get("http_headers") is not None:
        http = (rec["http_protocol"], rec["http_statusline"], rec["http_headers"])
        headers_buff = http_headers_buffer(http, header_filter)

    length = rec.get("length")
    payload_length = rec.get("payload_length")
    if payload_length is None or payload_length < 0:
        payload_length = len(body)

    if length is None:
        # unknown Content-Length: drop stale digests + Content-Type and
        # recompute everything (warcio/warcwriter.py:48-60)
        _header_remove(hdrs, "WARC-Block-Digest")
        if rec["rec_type"] != "revisit":
            _header_remove(hdrs, "WARC-Payload-Digest")
        # Content-Type header dropped so the recomputed one lands in a
        # consistent position; rec["content_type"] re-adds it below
        _header_remove(hdrs, "Content-Type")
        _ensure_digests(rec, block=True, payload=True, header_filter=header_filter)
        length = payload_length
    else:
        _ensure_digests(rec, block=True, payload=True, header_filter=header_filter)

    if rec.get("content_type") is not None:
        header_replace(hdrs, "Content-Type", rec["content_type"])

    headers_only = rec["rec_type"] == "revisit"

    if http is not None and payload_length >= 0:
        length = len(headers_buff) + (0 if headers_only else payload_length)
    header_replace(hdrs, "Content-Length", str(length))

    out = bytearray()
    out += warc_headers_bytes(rec.get("warc_protocol") or WARC_1_0, hdrs)
    out += headers_buff
    if not headers_only:
        out += body
    out += b"\r\n\r\n"
    raw = bytes(out)
    return gzip_member_compress(raw) if gzip else raw


def serialize_records(records, gzip=False, header_filter=None) -> bytes:
    return b"".join(serialize_record(r, gzip, header_filter) for r in records)
