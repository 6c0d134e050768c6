"""Duplicate-span detection/removal (operators/spans.py).

Python-reference oracle: a direct per-corpus reimplementation with
dict/set token math — every Spark result is compared field-exact
against it on deterministic corpora, plus hand-checked fixtures for
the merge/strip edge cases.
"""

import pyspark.sql.functions as F
import pytest

from warcio_spark.operators.spans import (
    dup_gram_spans,
    dup_span_stats,
    gram_positions,
    strip_dup_spans,
)


def _py_oracle(rows, n, min_docs):
    """Reference implementation over [(doc_id, text)] -> per-doc dict."""
    toks = {i: t.split() for i, t in rows}
    grams = {}  # gram -> set of doc_ids
    pos = {}  # doc_id -> [(pos, gram)]
    for i, ts in toks.items():
        pos[i] = []
        for p in range(len(ts) - n + 1):
            g = " ".join(ts[p : p + n])
            grams.setdefault(g, set()).add(i)
            pos[i].append((p + 1, g))
    dup = {g for g, ids in grams.items() if len(ids) >= min_docs}
    out = {}
    for i, ts in toks.items():
        hit = sorted(p for p, g in pos[i] if g in dup)
        spans = []
        for p in hit:
            if spans and p - spans[-1][1] <= n:
                spans[-1] = (spans[-1][0], p, spans[-1][2] + 1)
            else:
                spans.append((p, p, 1))
        merged = [(s, e + n - 1, c) for s, e, c in spans]
        covered = set()
        for s, e, _ in merged:
            covered.update(range(s, e + 1))
        out[i] = {
            "n_tokens": len(ts),
            "n_dup_grams": len(hit),
            "n_spans": len(merged),
            "dup_tokens": sum(e - s + 1 for s, e, _ in merged),
            "spans": [(s, e) for s, e, _ in merged],
            "clean": " ".join(
                t for j, t in enumerate(ts, 1) if j not in covered
            ),
        }
    return out


BOILER = "all rights reserved contact the site administrator for details"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma " + BOILER + " delta epsilon"),
        (2, "zeta eta theta " + BOILER + " iota kappa"),
        (3, "unique text with no shared passages at all here today"),
        (4, BOILER),  # doc that IS the boilerplate
        (5, "short doc"),  # shorter than n
        (6, ""),  # empty
        # internal-only repetition: phrase repeats inside ONE doc only
        (7, "solo repeat phrase one two three four five six seven eight"
            " solo repeat phrase one two three four five six seven eight"),
        # two separated boilerplate copies in one doc -> two spans
        (8, BOILER + " middle words that are certainly unique here "
            + BOILER),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return rows, df


N = 5


def test_stats_match_python_oracle(corpus, spark):
    rows, df = corpus
    want = _py_oracle(rows, N, 2)
    got = {
        r["doc_id"]: r.asDict()
        for r in dup_span_stats(df, n=N).collect()
    }
    assert set(got) == set(want)
    for i, w in want.items():
        g = got[i]
        assert g["n_tokens"] == w["n_tokens"], i
        assert g["n_dup_grams"] == w["n_dup_grams"], i
        assert g["n_spans"] == w["n_spans"], i
        assert g["dup_tokens"] == w["dup_tokens"], i
        assert g["dup_ratio"] == pytest.approx(
            round(w["dup_tokens"] / max(w["n_tokens"], 1), 4)
        ), i


def test_spans_match_python_oracle(corpus, spark):
    rows, df = corpus
    want = _py_oracle(rows, N, 2)
    got = {}
    for r in dup_gram_spans(df, n=N).collect():
        got.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    for i in got:
        got[i].sort()
    assert got == {i: w["spans"] for i, w in want.items() if w["spans"]}


def test_strip_matches_python_oracle(corpus, spark):
    rows, df = corpus
    want = _py_oracle(rows, N, 2)
    got = {
        r["doc_id"]: r["text_clean"]
        for r in strip_dup_spans(df, n=N).collect()
    }
    for i, w in want.items():
        assert got[i] == w["clean"], i


def test_internal_repetition_not_flagged(corpus, spark):
    _, df = corpus
    stats = {
        r["doc_id"]: r["n_dup_grams"]
        for r in dup_span_stats(df, n=N).collect()
    }
    assert stats[7] == 0  # repeats only within one doc -> clean
    assert stats[3] == 0  # genuinely unique
    assert stats[5] == 0 and stats[6] == 0  # too short / empty
    assert stats[4] > 0  # the boilerplate doc itself is covered


def test_two_separated_spans(corpus, spark):
    _, df = corpus
    spans = sorted(
        (r["start"], r["end"])
        for r in dup_gram_spans(df, n=N).filter(F.col("doc_id") == 8).collect()
    )
    assert len(spans) == 2
    # 9-token boilerplate at both ends of a 25-token doc
    assert spans[0] == (1, 9) and spans[1] == (17, 25)


def test_min_docs_threshold(corpus, spark):
    rows, df = corpus
    # raising min_docs above the boilerplate's 4-doc support clears it
    assert dup_gram_spans(df, n=N, min_docs=5).count() == 0
    want = _py_oracle(rows, N, 3)
    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_stats(df, n=N, min_docs=3).collect()
    }
    assert got == {i: w["dup_tokens"] for i, w in want.items()}


def test_gram_positions_shape(corpus, spark):
    _, df = corpus
    g = gram_positions(df, n=N)
    assert g.columns == ["doc_id", "pos", "g"]
    one = g.filter(F.col("doc_id") == 4)
    # 9 boilerplate tokens, n=5 -> 5 grams at pos 1..5
    assert sorted(r["pos"] for r in one.collect()) == [1, 2, 3, 4, 5]


def test_clean_doc_roundtrips_to_token_join(corpus, spark):
    _, df = corpus
    r = (
        strip_dup_spans(df, n=N)
        .filter(F.col("doc_id") == 3)
        .select("text", "text_clean")
        .first()
    )
    assert r["text_clean"] == " ".join(r["text"].split())
