"""Kernel parser vs the reference library as a runtime oracle.

Every archive in the reference's own test corpus is parsed by BOTH warcio
(imported from /root/reference, full-read mode) and our batch kernel; record
types, member offsets/lengths, headers, digest outcomes and — critically —
the extracted content bytes must match byte-for-byte (BASELINE.json:6,15).
"""

import io
import os

import pytest

from warcio_spark.kernels.parse import parse_warc_bytes

CORPUS = "/root/reference/test/data"
ALL_FILES = sorted(
    f for f in os.listdir(CORPUS) if os.path.isfile(os.path.join(CORPUS, f))
)


def oracle_parse(warcio, data, **kwargs):
    """Run the reference ArchiveIterator full-read; mirror its error behavior."""
    from warcio.archiveiterator import ArchiveIterator
    from warcio.exceptions import ArchiveLoadFailed

    out = {"records": [], "err_count": 0, "error": None}
    fh = io.BytesIO(data)
    it = ArchiveIterator(fh, **kwargs)
    try:
        for record in it:
            content = record.content_stream().read()
            rec = {
                "format": record.format,
                "rec_type": record.rec_type,
                "rec_headers": list(record.rec_headers.headers),
                "url": record.rec_headers.get_header("WARC-Target-URI")
                if record.format == "warc"
                else record.rec_headers.get_header("uri"),
                "http_statusline": record.http_headers.statusline
                if record.http_headers
                else None,
                "http_protocol": record.http_headers.protocol
                if record.http_headers
                else None,
                "http_headers": list(record.http_headers.headers)
                if record.http_headers
                else None,
                "content_type": record.content_type,
                "length": record.length,
                "payload_length": record.payload_length,
                "content": content,
                "digest_ok": record.digest_checker.passed,
                "n_digest_problems": len(record.digest_checker.problems),
                "offset": it.get_record_offset(),
                "rec_length": it.get_record_length(),
            }
            out["records"].append(rec)
    except ArchiveLoadFailed as e:
        out["error"] = str(e)
    out["err_count"] = it.err_count
    return out


def assert_same(mine, oracle, name, field_subset=None):
    assert (mine["error"] is None) == (oracle["error"] is None), (
        f"{name}: error mismatch mine={mine['error']!r} oracle={oracle['error']!r}"
    )
    assert mine["err_count"] == oracle["err_count"], f"{name}: err_count"
    assert len(mine["records"]) == len(oracle["records"]), (
        f"{name}: record count {len(mine['records'])} vs {len(oracle['records'])}"
        f" mine_types={[r['rec_type'] for r in mine['records']]}"
        f" oracle_types={[r['rec_type'] for r in oracle['records']]}"
    )
    fields = field_subset or [
        "format", "rec_type", "rec_headers", "url", "http_statusline",
        "http_protocol", "http_headers", "content_type", "length",
        "payload_length", "content", "digest_ok", "offset", "rec_length",
    ]
    if oracle["error"] is not None:
        # on invalid-gzip files the reference's member offset arithmetic is
        # meaningless (negative lengths) — compare the parsed fields only
        fields = [f for f in fields if f not in ("offset", "rec_length")]
    for i, (m, o) in enumerate(zip(mine["records"], oracle["records"])):
        for f in fields:
            assert m[f] == o[f], (
                f"{name} record {i} ({o['rec_type']}): field {f!r}\n"
                f"  mine:   {m[f]!r}\n  oracle: {o[f]!r}"
            )


@pytest.mark.parametrize("fname", ALL_FILES)
def test_corpus_parity(warcio, fname):
    with open(os.path.join(CORPUS, fname), "rb") as f:
        data = f.read()
    oracle = oracle_parse(warcio, data)
    mine = parse_warc_bytes(data, filename=fname)
    assert_same(mine, oracle, fname)


@pytest.mark.parametrize("fname", ALL_FILES)
def test_corpus_parity_digests(warcio, fname):
    with open(os.path.join(CORPUS, fname), "rb") as f:
        data = f.read()
    oracle = oracle_parse(warcio, data, check_digests=True)
    mine = parse_warc_bytes(data, filename=fname, check_digests=True)
    assert_same(mine, oracle, fname)


@pytest.mark.parametrize("fname", ["example.arc", "example.arc.gz"])
def test_arc2warc_parity(warcio, fname):
    with open(os.path.join(CORPUS, fname), "rb") as f:
        data = f.read()
    oracle = oracle_parse(warcio, data, arc2warc=True)
    mine = parse_warc_bytes(data, filename=fname, arc2warc=True)
    # WARC-Record-ID is synthesized (uuid4 in the reference, deterministic
    # uuid5 here) — compare everything except the id-bearing header lists.
    assert_same(
        mine, oracle, fname,
        field_subset=["format", "rec_type", "url", "content_type", "length",
                      "payload_length", "content", "offset", "rec_length"],
    )
    for m, o in zip(mine["records"], oracle["records"]):
        m_hdrs = [(n, v) for n, v in m["rec_headers"] if n != "WARC-Record-ID"]
        o_hdrs = [(n, v) for n, v in o["rec_headers"] if n != "WARC-Record-ID"]
        assert m_hdrs == o_hdrs


def test_known_format_mismatch(warcio):
    """WARC-pinned parse of an ARC (and vice versa) must fail like the
    reference's WARCIterator/ARCIterator (warcio/archiveiterator.py:274-284)."""
    with open(os.path.join(CORPUS, "example.arc.gz"), "rb") as f:
        arc = f.read()
    with open(os.path.join(CORPUS, "example.warc.gz"), "rb") as f:
        warc = f.read()
    assert parse_warc_bytes(arc, known_format="warc")["error"] is not None
    assert parse_warc_bytes(warc, known_format="arc")["error"] is not None


def test_offset_seek(warcio):
    """Mid-file offset parse = the reference's seek-to-offset extraction."""
    fname = "example-iana.org-chunked.warc"
    with open(os.path.join(CORPUS, fname), "rb") as f:
        data = f.read()
    full = parse_warc_bytes(data, filename=fname)
    offsets = [r["offset"] for r in full["records"]]
    assert offsets == [0, 405, 8379]
    sub = parse_warc_bytes(data, filename=fname, start_offset=405)
    assert [r["rec_type"] for r in sub["records"]] == ["response", "request"]
    assert sub["records"][0]["content"] == full["records"][1]["content"]


def test_digest_mutilation_modes(warcio):
    """Corrupted digests: value corruption fails the record, unknown algo is
    a problem; 'raise' mode aborts (test/test_archiveiterator.py:291-341)."""
    with open(os.path.join(CORPUS, "example.warc"), "rb") as f:
        contents = f.read()

    for needle in (b"WARC-Block-Digest: sha1:", b"WARC-Payload-Digest: sha1:"):
        # unknown algo
        mutated = contents.replace(needle, needle.replace(b"sha1", b"xxx1"), 1)
        oracle = oracle_parse(warcio, mutated, check_digests=True)
        mine = parse_warc_bytes(mutated, check_digests=True)
        assert_same(mine, oracle, f"xxx-algo:{needle}")
        assert any(r["digest_ok"] is False for r in mine["records"])
        # corrupted value
        idx = contents.find(needle) + len(needle)
        mutated = contents.replace(
            needle + contents[idx : idx + 3], needle + b"111", 1
        )
        oracle = oracle_parse(warcio, mutated, check_digests=True)
        mine = parse_warc_bytes(mutated, check_digests=True)
        assert_same(mine, oracle, f"bad-value:{needle}")
        assert any(r["digest_ok"] is False for r in mine["records"])
        # raise mode stops the file
        mine_raise = parse_warc_bytes(mutated, check_digests="raise")
        assert mine_raise["error"] is not None


def test_header_fields_fast_path_matches_slow():
    """_read_header_fields' block-at-once fast tier vs the per-line slow
    tier: identical (headers, bytes_consumed, cursor) on every block
    shape, including the ones that must BAIL to the slow tier (interior
    whitespace-only line, leading blank, no terminator, invalid utf-8,
    mixed LF-line/CRLF-blank endings)."""
    from warcio_spark.kernels.parse import (
        _Cursor,
        _read_header_fields,
    )
    from warcio_spark.kernels.textcodec import decode_fallback

    def fold(lines):
        # the ORIGINAL fold loop, verbatim — independent of the engine's
        # _fold_header_lines so its no-fold fast path is also under test
        headers = []
        i = 0
        while i < len(lines):
            line = lines[i]
            i += 1
            parts = line.split(":", 1)
            if len(parts) == 2:
                name = parts[0].rstrip(" \t")
                value = parts[1].lstrip()
            else:
                name, value = parts[0], None
            while i < len(lines) and lines[i][:1] in (" ", "\t"):
                if value is not None:
                    value += lines[i]
                i += 1
            if value is not None:
                headers.append((name, value))
        return headers

    def slow(data, pos):
        # the original per-line loop, verbatim
        n = len(data)
        start = pos
        lines = []
        while pos < n:
            nl = data.find(b"\n", pos)
            stop = nl + 1 if nl != -1 else n
            line = decode_fallback(data[pos:stop]).rstrip()
            pos = stop
            if not line:
                break
            lines.append(line)
        return fold(lines), pos - start, pos

    blocks = [
        b"A: 1\r\nB: 2\r\n\r\nBODY",
        b"A: 1\nB: 2\n\nBODY",
        b"A: 1\r\nB: 2\r\n\r\n",                      # terminator at end
        b"A: 1\r\n  folded\r\nB: 2\r\n\r\nx",          # continuation fold
        b"A: 1\r\n\t tab-folded\r\n\r\nx",
        b"A: 1\r\n   \r\nB: 2\r\n\r\nx",               # ws-only line = blank
        b"\r\nA: 1\r\n\r\n",                            # leading blank
        b"\nA: 1\n\n",
        b"A: 1\r\nB: 2",                                # no terminator (EOF)
        b"A: 1\r\nB: 2\r\n",                            # EOF after last line
        b"",                                            # empty stream
        b"A: caf\xc3\xa9\r\nB: 2\r\n\r\nx",            # valid utf-8
        b"A: caf\xe9\r\nB: 2\r\n\r\nx",                # latin-1 byte
        b"A: 1\nB: 2\r\n\r\nx",                        # mixed endings
        b"A: 1\n\r\nx",                                # LF line, CRLF blank
        b"NoColonLine\r\nA: 1\r\n\r\nx",               # value-less line
        b"A:\r\nB: 2\r\n\r\nx",                        # empty value
        b"A: 1\r\nB: 2\n\nC: 3\r\n\r\nx",              # LFLF before CRLFCRLF
        b" lead-space: v\r\nA: 1\r\n\r\nx",            # starts with fold char
        b"A: 1\r\nB: tr\xf8\xbbash\r\n\r\nx",          # invalid utf-8 block
        b"A:\r\n  folded-onto-empty\r\n\r\nx",         # fold onto empty value
        b"NoColon\r\n  fold-after-no-colon\r\nB: 2\r\n\r\nx",
        b"A: 1\r\n\tx\r\n  y\r\nB: 2\r\n\r\nx",        # multi-line fold run
    ]
    for blob in blocks:
        for prefix in (b"", b"PRE\r\n\r\n"):
            data = prefix + blob
            pos = len(prefix)
            want_headers, want_total, want_pos = slow(data, pos)
            cur = _Cursor(data, pos)
            got_headers, got_total = _read_header_fields(cur)
            assert (got_headers, got_total, cur.pos) == (
                want_headers, want_total, want_pos
            ), blob
