"""Compression-ratio quality signal (operators/textstats.
compression_stats): python-zlib oracle, repetitive-vs-prose separation,
NULL/empty contract, parallelism invariance."""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.textstats import compression_stats


def _run(spark, rows, parts=None, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if parts:
        df = df.repartition(parts)
    return {
        r.doc_id: (r.raw_len, r.zlib_len, r.compress_ratio, r.repetitive)
        for r in compression_stats(df, **kw).collect()
    }


def _oracle(rows, thresh=0.35):
    out = {}
    for i, s in rows:
        if s is None:
            out[i] = (None, None, None, None)
            continue
        raw = len(s.encode("utf-8"))
        zl = len(zlib.compress(s.encode("utf-8"), 6))
        ratio = round(zl / raw, 6) if raw > 0 else None
        out[i] = (raw, zl, ratio, ratio < thresh if ratio is not None
                  else None)
    return out


def test_python_zlib_oracle(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog. " * 3),
        (2, "spam " * 400),
        (3, ""),
        (4, None),
        (5, "naïve — unicode ✓ bytes " * 10),
        (6, "x"),
    ]
    want = _oracle(rows)
    got = _run(spark, rows)
    assert got == want
    assert _run(spark, rows, parts=4) == want


def test_repetitive_vs_prose_separation(spark):
    prose = (
        "It was the best of times, it was the worst of times, it was the "
        "age of wisdom, it was the age of foolishness, it was the epoch "
        "of belief, it was the epoch of incredulity, every author brings "
        "different words and sentence shapes to a page of real writing."
    )
    spun = "buy cheap widgets best price " * 50
    got = _run(spark, [(1, prose), (2, spun)])
    assert got[1][3] is False and got[1][2] > 0.35
    assert got[2][3] is True and got[2][2] < 0.1


def test_threshold_param(spark):
    rows = [(1, "moderately repetitive text " * 20)]
    loose = _run(spark, rows, repetitive_below=0.9)[1]
    strict = _run(spark, rows, repetitive_below=0.01)[1]
    assert loose[3] is True and strict[3] is False
    assert loose[2] == strict[2]
