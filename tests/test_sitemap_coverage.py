"""Sitemap coverage gap (operators/links.sitemap_coverage): hand cases
per direction, duplicate-url collapse, no-sitemap NULL coverage, python
oracle over a randomized universe, parallelism invariance."""

import os
import sys
from collections import defaultdict
from urllib.parse import urlsplit

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.links import sitemap_coverage


def _run(spark, fetched, listed, parts=None):
    f = spark.createDataFrame([(u,) for u in fetched], "url string")
    ls = spark.createDataFrame([(u,) for u in listed], "url string")
    if parts:
        f, ls = f.repartition(parts), ls.repartition(parts)
    return {
        r.host: (r.n_fetched, r.n_listed, r.n_both,
                 r.fetched_unlisted, r.listed_unfetched, r.coverage)
        for r in sitemap_coverage(f, ls).collect()
    }


def _oracle(fetched, listed):
    fs, lss = set(fetched), set(listed)
    hosts = defaultdict(lambda: [0, 0, 0])
    for u in fs | lss:
        h = urlsplit(u).hostname
        hosts[h][0] += u in fs
        hosts[h][1] += u in lss
        hosts[h][2] += u in fs and u in lss
    return {
        h: (f, l, b, f - b, l - b,
            round(b / l, 6) if l > 0 else None)
        for h, (f, l, b) in hosts.items()
    }


def test_hand_cases(spark):
    fetched = [
        "http://a.ex/1", "http://a.ex/2", "http://a.ex/2",  # dup collapses
        "http://a.ex/extra",
        "http://nomap.ex/x",
    ]
    listed = [
        "http://a.ex/1", "http://a.ex/2", "http://a.ex/never",
        "http://ghost.ex/only-listed",
    ]
    got = _run(spark, fetched, listed)
    assert got["a.ex"] == (3, 3, 2, 1, 1, round(2 / 3, 6))
    # fetched with no sitemap: coverage NULL (no claim to measure)
    assert got["nomap.ex"] == (1, 0, 0, 1, 0, None)
    # listed but never fetched at all
    assert got["ghost.ex"] == (0, 1, 0, 0, 1, 0.0)
    assert len(got) == 3


def test_python_oracle_randomized(spark):
    import random

    rng = random.Random(55)
    pool = ["http://h%d.ex/p%d" % (i % 9, i) for i in range(120)]
    fetched = [rng.choice(pool) for _ in range(150)]
    listed = [rng.choice(pool) for _ in range(100)]
    want = _oracle(fetched, listed)
    assert _run(spark, fetched, listed) == want
    assert _run(spark, fetched, listed, parts=7) == want
