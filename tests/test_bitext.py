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


# ---------------------------------------------------------------------------
# Stage 2: Gale-Church sentence alignment


def _oracle_gc(lens_a, lens_b):
    """Independent DP: memoized recursion (the engine iterates forward);
    ties resolve by (cost, bead order) minimization — same contract,
    different mechanics."""
    import functools
    import math

    from warcio_spark.operators.bitext import GC_BEADS, GC_C, GC_MIN_P, GC_S2

    def match(la, lb):
        if la == 0 and lb == 0:
            return 0.0
        mean = (la + lb / GC_C) / 2.0
        delta = (lb - la * GC_C) / math.sqrt(mean * GC_S2)
        return -100.0 * math.log(
            max(math.erfc(abs(delta) / math.sqrt(2.0)), GC_MIN_P)
        )

    @functools.lru_cache(maxsize=None)
    def best(i, j):
        # returns (cost, beads-from-here) aligning suffixes a[i:], b[j:]
        if i == len(lens_a) and j == len(lens_b):
            return 0.0, ()
        cands = []
        for k, (da, db, pen) in enumerate(GC_BEADS):
            ii, jj = i + da, j + db
            if ii > len(lens_a) or jj > len(lens_b):
                continue
            step = pen + match(sum(lens_a[i:ii]), sum(lens_b[j:jj]))
            rest, tail = best(ii, jj)
            cands.append((step + rest, k, ((i, j, da, db),) + tail))
        c, _, beads = min(cands, key=lambda t: (t[0], t[1]))
        return c, beads

    return best(0, 0)[1]


def test_align_sentences_matches_dp_oracle(spark):
    """Engine beads == the memoized-recursion oracle over a deterministic
    multi-shape universe (equal counts, insertions, merges, empty sides)."""
    import random

    from warcio_spark.operators.bitext import align_sentences, gc_match_cost, GC_BEADS

    rng = random.Random(42)
    rows = []
    for p in range(60):
        na, nb = rng.randint(0, 9), rng.randint(0, 9)
        sa = ["a" * rng.randint(1, 120) for _ in range(na)]
        sb = ["b" * rng.randint(1, 120) for _ in range(nb)]
        rows.append((f"http://a.ex/{p}", f"http://b.ex/{p}", sa, sb))
    df = spark.createDataFrame(
        rows,
        "url_a string, url_b string, sents_a array<string>, "
        "sents_b array<string>",
    )
    got = {}
    for r in align_sentences(df).collect():
        da, db = map(int, r.bead.split("-"))
        got.setdefault(r.url_a, []).append(
            (r.a_lo, r.b_lo, da, db, r.sent_a, r.sent_b, r.cost)
        )
    pen = {(da, db): p for da, db, p in GC_BEADS}
    for ua, ub, sa, sb in rows:
        lens_a, lens_b = [len(s) for s in sa], [len(s) for s in sb]
        want = []
        for i, j, da, db in _oracle_gc(tuple(lens_a), tuple(lens_b)):
            want.append((
                i, j, da, db,
                " ".join(sa[i:i + da]), " ".join(sb[j:j + db]),
                round(pen[(da, db)] + gc_match_cost(
                    sum(lens_a[i:i + da]), sum(lens_b[j:j + db])), 6),
            ))
        assert sorted(got.get(ua, [])) == sorted(want), (ua, sa, sb)


def test_align_sentences_shapes(spark):
    """Pinned behaviors: equal-length twin pages align 1-1 throughout; an
    extra sentence gets ABSORBED by a 1-2 expansion rather than a 0-1
    insertion (450 + the 0-vs-len mismatch always beats 440 + a mild
    expansion — insertions under the GC priors fire only where no
    neighbor can absorb); two short sentences against their concatenation
    prefer the 2-1 merge; an empty side yields all-deletion beads."""
    from warcio_spark.operators.bitext import align_sentences

    s40, s80 = "x" * 40, "y" * 80
    rows = [
        ("p1a", "p1b", [s40, s80, s40], [s40, s80, s40]),
        ("p2a", "p2b", [s40, s80], [s40, "z" * 300, s80]),
        ("p3a", "p3b", [s40, s40], [s40 + " " + s40]),
        ("p4a", "p4b", [s40, s80], []),
    ]
    df = spark.createDataFrame(
        rows,
        "url_a string, url_b string, sents_a array<string>, "
        "sents_b array<string>",
    )
    beads = {}
    for r in align_sentences(df).collect():
        beads.setdefault(r.url_a, []).append((r.a_lo, r.b_lo, r.bead))
    assert sorted(beads["p1a"]) == [(0, 0, "1-1"), (1, 1, "1-1"),
                                    (2, 2, "1-1")]
    assert sorted(beads["p2a"]) == [(0, 0, "1-1"), (1, 1, "1-2")]
    assert sorted(beads["p3a"]) == [(0, 0, "2-1")]
    assert sorted(beads["p4a"]) == [(0, 0, "1-0"), (1, 0, "1-0")]


def test_split_sentences_contract(spark):
    """JVM splitter: terminal punctuation + whitespace boundaries, trim,
    empties dropped, cap enforced."""
    from warcio_spark.operators.bitext import (
        MAX_SENTS_PER_PAGE,
        split_sentences,
    )

    from pyspark.sql import functions as F

    long_text = " ".join(f"s{i}." for i in range(MAX_SENTS_PER_PAGE + 10))
    df = spark.createDataFrame(
        [("One two. Three!  Four? No-split,here. trailing",),
         ("",), (long_text,)],
        "text string",
    )
    got = [r.s for r in df.select(split_sentences("text").alias("s")).collect()]
    assert got[0] == ["One two.", "Three!", "Four?", "No-split,here.",
                      "trailing"]
    assert got[1] == []
    assert len(got[2]) == MAX_SENTS_PER_PAGE
