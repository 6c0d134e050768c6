"""MIME sniffing (operators/checker.py:sniff_mime): WHATWG-style
magic-byte detection vs the declared Content-Type header.

The reference trusts the declared header outright
(/root/reference/warcio/recordloader.py:223-235); this operator is the
hygiene audit that finds where that trust is misplaced. Cases below pin
every rule family: magic prefixes, RIFF form types, whitespace-skipped
case-insensitive markup tags, the NUL binary/text split, parameter
stripping and alias folding on the declared side, and Python's own
``mimetypes``-adjacent sanity via stdlib-constructed payloads."""

import gzip
import io
import struct
import zipfile

import pytest
from pyspark.sql import functions as F

from warcio_spark.operators.checker import sniff_mime


def _sniff(spark, rows):
    """rows: list of (payload bytes, declared str) -> list of Row."""
    df = spark.createDataFrame(
        [(i, bytearray(p), c) for i, (p, c) in enumerate(rows)],
        "id INT, payload BINARY, content_type STRING",
    )
    out = sniff_mime(df).orderBy("id").collect()
    return [(r.sniffed_mime, r.declared_norm, r.mismatch) for r in out]


# --- magic prefixes -------------------------------------------------------

CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"x" * 20, "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"GIF87a....", "image/gif"),
    (b"GIF89a....", "image/gif"),
    (b"%PDF-1.4\n%", "application/pdf"),
    (b"PK\x03\x04rest", "application/zip"),
    (b"PK\x05\x06rest", "application/zip"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
]


def test_magic_prefixes(spark):
    out = _sniff(spark, [(p, m) for p, m in CASES])
    for (sniffed, declared, mismatch), (_, want) in zip(out, CASES):
        assert sniffed == want
        assert not mismatch


def test_real_gzip_and_zip_bytes(spark):
    """Payloads produced by the stdlib, not hand-written magic."""
    gz = gzip.compress(b"hello world")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "hi")
    out = _sniff(spark, [(gz, "application/gzip"),
                         (buf.getvalue(), "application/zip")])
    assert out[0][0] == "application/gzip"
    assert out[1][0] == "application/zip"
    assert not out[0][2] and not out[1][2]


def test_real_wav_header(spark):
    """A minimal but structurally valid RIFF/WAVE header."""
    body = b"fmt " + struct.pack("<I", 16) + b"\x00" * 16
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out = _sniff(spark, [(wav, "audio/wav")])
    assert out[0][0] == "audio/wav"


# --- markup tags ----------------------------------------------------------

def test_html_tags_case_insensitive_with_whitespace(spark):
    rows = [
        (b"<!DOCTYPE html><html>", "text/html"),
        (b"<!doctype HTML><html>", "text/html"),
        (b"\r\n\t  <HtMl lang=en>", "text/html"),
        (b"<head><title>t</title>", "text/html"),
        (b"\n<script>var x;</script>", "text/html"),
        (b"<?xml version='1.0'?>", "text/xml"),
        (b"  <?XML version='1.0'?>", "text/xml"),
        (b"<svg xmlns='...'>", "image/svg+xml"),
        (b'{"k": 1}', "application/json"),
        (b"[1, 2, 3]", "application/json"),
    ]
    out = _sniff(spark, rows)
    for (sniffed, _, mismatch), (_, want) in zip(out, rows):
        assert sniffed == want
        assert not mismatch


def test_tag_must_lead_after_whitespace_only(spark):
    # '<html' buried mid-window is NOT a match — anchor is real
    out = _sniff(spark, [(b"hello <html>", "text/plain")])
    assert out[0][0] == "text/plain"


# --- binary/text split ----------------------------------------------------

def test_nul_byte_means_octet_stream(spark):
    out = _sniff(spark, [
        (b"plain ascii text", "text/plain"),
        (b"plain\x00binary", "text/plain"),
    ])
    assert out[0][0] == "text/plain" and not out[0][2]
    assert out[1][0] == "application/octet-stream" and out[1][2]


def test_nul_beyond_window_is_not_seen(spark):
    # the sniff window is 64 bytes; a NUL at byte 100 doesn't flip it
    out = _sniff(spark, [(b"a" * 100 + b"\x00", "text/plain")])
    assert out[0][0] == "text/plain"


# --- declared-side normalization -------------------------------------------

def test_declared_normalization_and_aliases(spark):
    rows = [
        (b"<html>", "TEXT/HTML; charset=UTF-8"),       # case + params
        (b"<html>", "application/xhtml+xml"),          # alias folds
        (b"\xff\xd8\xff\xe0", "image/jpg"),            # alias folds
        (b"<?xml?>", "application/xml"),               # alias folds
        (b'{"a":1}', "text/json; charset=utf-8"),      # alias + params
    ]
    out = _sniff(spark, rows)
    assert [r[1] for r in out] == [
        "text/html", "text/html", "image/jpeg", "text/xml",
        "application/json",
    ]
    assert not any(r[2] for r in out)


def test_mismatch_flags_lying_headers(spark):
    rows = [
        (b"\x89PNG\r\n\x1a\n data", "text/html"),
        (b"<!DOCTYPE html><p>", "image/png"),
        (b"GIF89a...", "image/gif"),
    ]
    out = _sniff(spark, rows)
    assert [r[2] for r in out] == [True, True, False]


def test_precedence_magic_beats_tags(spark):
    # gzip bytes that happen to be followed by '<html' — magic wins
    out = _sniff(spark, [(b"\x1f\x8b\x08<html>", "application/gzip")])
    assert out[0][0] == "application/gzip"


def test_empty_payload_is_text_plain(spark):
    out = _sniff(spark, [(b"", "text/plain")])
    assert out[0][0] == "text/plain" and not out[0][2]


# --- plan shape -------------------------------------------------------------

def test_sniff_plan_is_pure_codegen(spark):
    """No Python hop, no shuffle, and the stage keeps whole-stage
    codegen (the rule ladder is sized to stay under janino limits)."""
    df = spark.createDataFrame(
        [(1, bytearray(b"<html>"), "text/html")],
        "id INT, payload BINARY, content_type STRING",
    )
    plan = sniff_mime(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # '*(n)' marks a whole-stage-codegen stage in the executed plan
    assert "*(1)" in plan
