"""DSIR importance weights (textstats.dsir_weights) and CCNet
perplexity buckets (textstats.perplexity_buckets) vs direct Python
oracles.

Reference context: warcio has no data-curation layer; these are the
LLM-pipeline operators the survey's training-data section calls for
(DSIR: Xie et al. 2023 importance resampling; buckets: CCNet's
head/middle/tail quality split), built on the same hashed-feature and
bigram-LM primitives the quality_classifier / lm_perplexity queries
already oracle.
"""

import hashlib
import math

import pytest

LAM = 0.5
B = 256


def _bucket(f):
    return hashlib.md5(f.encode()).hexdigest()[:2]


def _features(text):
    toks = text.split()
    feats = [_bucket(t) for t in toks]
    feats += [_bucket(a + " " + b) for a, b in zip(toks, toks[1:])]
    return feats


def _py_dsir(rows, target_ids):
    raw, tgt = {}, {}
    for doc_id, text in rows:
        for f in _features(text):
            raw[f] = raw.get(f, 0) + 1
            if doc_id in target_ids:
                tgt[f] = tgt.get(f, 0) + 1
    raw_tot = sum(raw.values())
    tgt_tot = sum(tgt.values())
    out = {}
    for doc_id, text in rows:
        feats = _features(text)
        if not feats:
            out[doc_id] = (0, None)
            continue
        w = sum(
            math.log(tgt.get(f, 0) + LAM)
            - math.log(tgt_tot + LAM * B)
            - math.log(raw[f] + LAM)
            + math.log(raw_tot + LAM * B)
            for f in feats
        )
        out[doc_id] = (len(feats), round(w, 4))
    return out


DOCS = [
    (1, "quantum physics lecture notes on entanglement"),
    (2, "quantum computing and physics of qubits"),
    (3, "buy cheap pills online best price pills"),
    (4, "cheap cheap cheap discount pills online"),
    (5, "physics of the quantum vacuum entanglement notes"),
    (6, "one"),
    (7, ""),
]
TARGET_IDS = {1, 2}


@pytest.fixture(scope="module")
def dsir(spark):
    from pyspark.sql import functions as F

    from warcio_spark.operators.textstats import dsir_weights

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return dsir_weights(docs, F.col("doc_id").isin(*TARGET_IDS))


def test_dsir_matches_python_oracle(dsir):
    want = _py_dsir(DOCS, TARGET_IDS)
    got = {r["doc_id"]: (r["n_feats"], r["dsir_w"]) for r in dsir.collect()}
    assert got == want


def test_dsir_targetlike_outranks_spam(dsir):
    got = {r["doc_id"]: r["dsir_w"] for r in dsir.collect()}
    # doc 5 shares the target vocabulary, docs 3/4 do not: the importance
    # weight must rank 5 above both spam docs.
    assert got[5] > got[3]
    assert got[5] > got[4]


def test_dsir_empty_doc_contract(dsir):
    rows = {r["doc_id"]: r for r in dsir.collect()}
    assert rows[7]["n_feats"] == 0 and rows[7]["dsir_w"] is None
    # single-token doc: one unigram feature, no bigram
    assert rows[6]["n_feats"] == 1


def test_dsir_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from warcio_spark.operators.textstats import dsir_weights

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    one = dsir_weights(
        docs.coalesce(1), F.col("doc_id").isin(*TARGET_IDS))
    many = dsir_weights(
        docs.repartition(7), F.col("doc_id").isin(*TARGET_IDS))
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect()))


PPL_DOCS = [
    # lang A: docs 1-2 fluent (low ppl), 3 weird (high ppl)
    (1, "a", "the cat sat on the mat the cat sat on the mat"),
    (2, "a", "the cat sat on the mat the dog sat on the mat"),
    (3, "a", "zqx kjv wpm qqq zzz xxy vvk jjq mmz ppx"),
    (4, "a", "the cat sat on the mat"),
    (5, "a", "one"),
    # lang B: its own distribution
    (6, "b", "der hund lief durch den wald der hund lief"),
    (7, "b", "der hund lief durch den wald und den park"),
    (8, "b", "qwe rty uio pas dfg hjk"),
]


@pytest.fixture(scope="module")
def buckets(spark):
    from warcio_spark.operators.textstats import (bigram_lm,
                                                  perplexity_buckets)

    docs = spark.createDataFrame(PPL_DOCS, ["doc_id", "lang", "text"])
    return {r["doc_id"]: r for r in
            perplexity_buckets(docs, bigram_lm(docs)).collect()}


def test_buckets_unscored_contract(buckets):
    assert buckets[5]["bucket"] == "unscored"
    assert buckets[5]["z"] is None and buckets[5]["ppl"] is None


def test_buckets_outlier_lands_in_tail(buckets):
    # the gibberish docs sit far above their language mean
    assert buckets[3]["bucket"] == "tail"
    assert buckets[8]["bucket"] == "tail"


def test_buckets_z_is_per_language(buckets):
    # z is computed within each language's own distribution: both
    # languages' scored z values average ~0 independently
    for lang in ("a", "b"):
        zs = [r["z"] for r in buckets.values()
              if r["lang"] == lang and r["z"] is not None]
        assert abs(sum(zs)) < 0.01 * len(zs)


def test_buckets_match_python_z(buckets):
    by_lang = {}
    for r in buckets.values():
        if r["ppl"] is not None:
            by_lang.setdefault(r["lang"], []).append(r["ppl"])
    for r in buckets.values():
        if r["ppl"] is None:
            continue
        vals = by_lang[r["lang"]]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
        z = (r["ppl"] - mu) / sd if sd > 0 else 0.0
        assert r["z"] == pytest.approx(round(z, 4), abs=1e-4)
        want = ("head" if round(z, 4) <= -0.4307
                else "tail" if round(z, 4) >= 0.4307 else "middle")
        assert r["bucket"] == want
