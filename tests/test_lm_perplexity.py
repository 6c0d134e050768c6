"""Bigram-LM perplexity (textstats.bigram_lm / lm_perplexity) vs a
direct Python oracle."""

import math

import pytest

ALPHA = 0.4


def _py_lm(texts):
    bigrams = {}
    prefix = {}
    vocab = set()
    for t in texts:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    for (a, b), c in bigrams.items():
        prefix[a] = prefix.get(a, 0) + c
        vocab.update((a, b))
    v = len(vocab)
    return {
        (a, b): math.log2((c + ALPHA) / (prefix[a] + ALPHA * v))
        for (a, b), c in bigrams.items()
    }


def _py_ppl(lm, text):
    toks = text.split()
    bgs = list(zip(toks, toks[1:]))
    if not bgs:
        return (0, None)
    floor = min(lm.values())
    lps = [lm.get(bg, floor) for bg in bgs]
    return (len(bgs), round(2 ** (-sum(lps) / len(lps)), 4))


TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat ate the fish"),
    (4, "one"),
    (5, ""),
]


@pytest.fixture(scope="module")
def lm_and_docs(spark):
    from warcio_spark.operators.textstats import bigram_lm

    docs = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    return bigram_lm(docs), docs


def test_lm_logps_match_oracle(lm_and_docs):
    lm, _ = lm_and_docs
    want = _py_lm([t for _, t in TRAIN])
    got = {(r["w1"], r["w2"]): r["logp"] for r in lm.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_self_perplexity_matches_oracle(lm_and_docs, spark):
    from warcio_spark.operators.textstats import lm_perplexity

    lm, docs = lm_and_docs
    want = {i: _py_ppl(_py_lm([t for _, t in TRAIN]), t) for i, t in TRAIN}
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in lm_perplexity(docs, lm).collect()
    }
    assert got == want
    # short docs score NULL, never crash
    assert got[4] == (0, None) and got[5] == (0, None)


def test_heldout_unseen_bigrams_use_floor(lm_and_docs, spark):
    from warcio_spark.operators.textstats import lm_perplexity

    lm, _ = lm_and_docs
    held = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quantum flux")],
        ["doc_id", "text"],
    )
    want_lm = _py_lm([t for _, t in TRAIN])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in lm_perplexity(held, lm).collect()
    }
    assert got[10] == _py_ppl(want_lm, "the cat sat")
    assert got[11] == _py_ppl(want_lm, "zebra quantum flux")
    # all-unseen doc scores exactly the floor perplexity
    assert got[11][1] == round(2 ** -min(want_lm.values()), 4)
    # fluent text under the model is less perplexing than gibberish
    assert got[10][1] < got[11][1]


def test_broadcast_variant_identical(lm_and_docs, spark):
    from warcio_spark.operators.textstats import lm_perplexity

    lm, docs = lm_and_docs
    a = sorted(map(tuple, lm_perplexity(docs, lm).collect()))
    b = sorted(
        map(tuple, lm_perplexity(docs, lm, broadcast_lm=True).collect())
    )
    assert a == b
