"""Parked/soft-404 host census (operators/domains.host_content_census):
hand universes per flag path, a Python counter oracle, NULL-text
hashing, and parallelism invariance."""

import hashlib
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.domains import host_content_census


def _oracle(rows, min_pages, thr, thin_bytes):
    by = defaultdict(list)
    for h, t in rows:
        by[h].append(t if t is not None else "")
    out = {}
    for h, texts in by.items():
        c = Counter(hashlib.md5(t.encode()).hexdigest() for t in texts)
        n, top = len(texts), max(c.values())
        thin = sum(1 for t in texts if len(t.encode()) < thin_bytes)
        out[h] = (n, len(c), top, round(top / n, 9), round(thin / n, 9),
                  n >= min_pages and top / n >= thr)
    return out


def _run(spark, rows, parts=None, **kw):
    df = spark.createDataFrame(rows, "host string, text string")
    if parts:
        df = df.repartition(parts)
    return {r.host: (r.n_pages, r.n_distinct, r.top_cnt,
                     round(r.top_share, 9), round(r.thin_share, 9),
                     r.parked)
            for r in host_content_census(df, **kw).collect()}


def test_hand_cases(spark):
    rows = (
        # parked: 30 urls, one registrar lander body
        [("parked.ex", "buy this domain")] * 30
        # soft-404 farm: 25 pages, 20 share the error body (0.8 >= thr)
        + [("soft.ex", "404 not found")] * 20
        + [("soft.ex", "real page %d" % i * 60) for i in range(5)]
        # healthy: every body distinct and long
        + [("ok.ex", ("content %d " % i) * 80) for i in range(25)]
        # tiny host, identical content, under min_pages -> unjudged
        + [("tiny.ex", "same")] * 3
        # NULL text hashes as empty body
        + [("null.ex", None)] * 21
    )
    got = _run(spark, rows, min_pages=20, top_share_threshold=0.8,
               thin_bytes=64)
    assert got["parked.ex"] == (30, 1, 30, 1.0, 1.0, True)
    assert got["soft.ex"] == (25, 6, 20, 0.8, 0.8, True)
    assert got["ok.ex"][5] is False and got["ok.ex"][1] == 25
    assert got["ok.ex"][4] == 0.0  # all bodies >= 64 bytes
    assert got["tiny.ex"] == (3, 1, 3, 1.0, 1.0, False)
    assert got["null.ex"] == (21, 1, 21, 1.0, 1.0, True)


def test_thin_is_bytes_not_chars(spark):
    # 40 CJK chars = 120 UTF-8 bytes: thin at 64 chars would misfire,
    # thin_bytes=64 must NOT count it; the 30-byte ASCII body must.
    rows = [("cjk.ex", "文" * 40)] * 3 + [("thin.ex", "x" * 30)] * 3
    got = _run(spark, rows, min_pages=2, top_share_threshold=0.9,
               thin_bytes=64)
    assert got["cjk.ex"][4] == 0.0
    assert got["thin.ex"][4] == 1.0


def test_matches_python_oracle_pseudorandom(spark):
    rows = []
    for i in range(600):
        h = "h%d.ex" % (i % 13)
        t = (None if i % 29 == 0
             else "shared body" if (i * 7) % 10 < 4
             else "page %d body %s" % (i, "x" * (i % 90)))
        rows.append((h, t))
    exp = _oracle(rows, 10, 0.35, 40)
    got = _run(spark, rows, min_pages=10, top_share_threshold=0.35,
               thin_bytes=40)
    assert got == exp


def test_parallelism_invariance(spark):
    rows = [("h%d.ex" % (i % 5), "b%d" % (i % 7)) for i in range(200)]
    a = _run(spark, rows, min_pages=5, top_share_threshold=0.3)
    b = _run(spark, rows, parts=16, min_pages=5, top_share_threshold=0.3)
    assert a == b
