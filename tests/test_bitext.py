"""Bitext candidate mining (operators/bitext.bitext_candidates): hand
cases per gate, reciprocal-pair collapse, python oracle over a
randomized universe, parallelism invariance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.bitext import bitext_candidates

EDGE_SCHEMA = "src_url string, hreflang string, alternate string"
PAGE_SCHEMA = "url string, lang string, n_chars long"


def _run(spark, edges, pages, parts=None, **kw):
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    p = spark.createDataFrame(pages, PAGE_SCHEMA)
    if parts:
        e, p = e.repartition(parts), p.repartition(parts)
    return {
        (r.url_a, r.url_b): (
            r.lang_a, r.lang_b, r.declared_lang, r.len_ratio,
            r.lang_agrees, r.candidate,
        )
        for r in bitext_candidates(e, p, **kw).collect()
    }


def test_hand_cases(spark):
    edges = [
        # clean reciprocal en<->fr pair, comparable lengths
        ("http://ex/en", "fr", "http://ex/fr"),
        ("http://ex/fr", "en", "http://ex/en"),
        # one-directional edge, declared regional subtag de-AT
        ("http://ex/en", "de-AT", "http://ex/de"),
        # declared lang contradicts the fetched lang of the target
        ("http://ex/en", "es", "http://ex/wrong"),
        # length-incomparable pair (10 vs 100 chars)
        ("http://ex/en", "it", "http://ex/stub"),
        # same fetched language both sides (mirror, not translation)
        ("http://ex/en", "en-GB", "http://ex/mirror"),
        # x-default edge: dropped
        ("http://ex/en", "x-default", "http://ex/"),
        # self edge: dropped
        ("http://ex/en", "en", "http://ex/en"),
        # alternate never fetched: silently out
        ("http://ex/en", "nl", "http://ex/nl-missing"),
    ]
    pages = [
        ("http://ex/en", "en", 100),
        ("http://ex/fr", "fr", 90),
        ("http://ex/de", "de", 60),
        ("http://ex/wrong", "pt", 100),
        ("http://ex/stub", "it", 10),
        ("http://ex/mirror", "en", 100),
        ("http://ex/", "en", 5),
    ]
    got = _run(spark, edges, pages)
    assert got[("http://ex/en", "http://ex/fr")] == (
        "en", "fr", "en", 0.9, True, True)
    assert got[("http://ex/de", "http://ex/en")] == (
        "de", "en", "de-AT", 0.6, True, True)
    assert got[("http://ex/en", "http://ex/wrong")] == (
        "en", "pt", "es", 1.0, False, False)
    assert got[("http://ex/en", "http://ex/stub")] == (
        "en", "it", "it", 0.1, True, False)
    assert got[("http://ex/en", "http://ex/mirror")] == (
        "en", "en", "en-GB", 1.0, True, False)
    assert ("http://ex/", "http://ex/en") not in got
    assert ("http://ex/en", "http://ex/en") not in got
    assert len(got) == 5


def test_reciprocal_conjunction(spark):
    # A->B declared wrongly, B->A declared right: candidate AND-folds
    # to false even though one direction passes
    edges = [
        ("http://x/a", "sv", "http://x/b"),
        ("http://x/b", "en", "http://x/a"),
    ]
    pages = [("http://x/a", "en", 50), ("http://x/b", "fi", 50)]
    got = _run(spark, edges, pages)
    assert got[("http://x/a", "http://x/b")] == (
        "en", "fi", "en", 1.0, False, False)


def _oracle(edges, pages, min_ratio=0.5):
    facts = {u: (lg, n) for u, lg, n in pages}
    out = {}
    for src, hl, alt in edges:
        if hl == "x-default" or alt is None or src == alt:
            continue
        if src not in facts or alt not in facts:
            continue
        (sl, sc), (dl, dc) = facts[src], facts[alt]
        agree = dl == hl.split("-")[0]
        a, b = sorted([src, alt])
        la, ca = facts[a][0], facts[a][1]
        lb, cb = facts[b][0], facts[b][1]
        ratio = round(min(ca, cb) / max(ca, cb), 6) if max(ca, cb) > 0 else 0.0
        cand = (sl != dl) and ratio >= min_ratio and agree
        prev = out.get((a, b))
        row = (la, lb, hl, ratio, agree, cand)
        if prev is None:
            out[(a, b)] = row
        else:
            out[(a, b)] = (
                la, lb, min(prev[2], hl), ratio,
                prev[4] and agree, prev[5] and cand,
            )
    return out


def test_python_oracle_randomized(spark):
    import random

    rng = random.Random(99)
    langs = ["en", "fr", "de", "es", "it", "pt"]
    pages = [
        ("http://u%d.ex/p" % i, rng.choice(langs), rng.randrange(0, 200))
        for i in range(60)
    ]
    urls = [u for u, _, _ in pages] + ["http://unfetched.ex/p"]
    edges = []
    for _ in range(300):
        s, a = rng.choice(urls), rng.choice(urls)
        hl = rng.choice(langs + ["x-default", "de-AT", "en-GB"])
        edges.append((s, hl, a))
    want = _oracle(edges, pages)
    assert _run(spark, edges, pages) == want
    assert _run(spark, edges, pages, parts=7) == want
