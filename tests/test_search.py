"""BM25 search (operators/search.py) vs a direct Python oracle."""

import math

import pytest

from warcio_spark.operators.search import bm25_scores, bm25_topk


def _py_bm25(rows, q, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in q}
    out = {}
    for i, ts in toks.items():
        score, matched = 0.0, 0
        for t in q:
            tf = ts.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(ts) / avgdl)
            )
        if matched:
            out[i] = (matched, round(score, 4))
    return out


ROWS = [
    (1, "spark shuffle join broadcast join join"),
    (2, "spark scan filter project"),
    (3, "unrelated words entirely different content"),
    (4, "join"),
    (5, "broadcast broadcast broadcast spark"),
    (6, ""),
]
Q = ["join", "broadcast", "missingterm"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_scores_match_python_oracle(docs, spark):
    want = _py_bm25(ROWS, Q)
    got = {
        r["doc_id"]: (r["n_matched_terms"], r["score"])
        for r in bm25_scores(docs, Q).collect()
    }
    assert got == want


def test_only_matching_docs_returned(docs, spark):
    ids = {r["doc_id"] for r in bm25_scores(docs, Q).collect()}
    assert ids == {1, 4, 5}


def test_topk_order_and_ties(docs, spark):
    top = bm25_topk(docs, Q, k=2).collect()
    want = _py_bm25(ROWS, Q)
    order = sorted(want, key=lambda i: (-want[i][1], i))
    assert [r["doc_id"] for r in top] == order[:2]


def test_term_frequency_saturation(docs, spark):
    """BM25's tf saturation at b=0 (length norm off): tripled term
    beats single occurrence but by less than 3x (k1 damping)."""
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join"], b=0.0).collect()
    }
    assert got[1] > got[4]  # tf=3 beats tf=1
    assert got[1] < 3 * got[4]  # saturated, not linear
    # and with full length norm the short doc 4 wins instead
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join"]).collect()
    }
    assert full[4] > full[1]


def test_empty_query_raises(docs, spark):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_custom_k1_b(docs, spark):
    want = _py_bm25(ROWS, Q, k1=2.0, b=0.0)
    got = {
        r["doc_id"]: (r["n_matched_terms"], r["score"])
        for r in bm25_scores(docs, Q, k1=2.0, b=0.0).collect()
    }
    assert got == want


def test_indexed_matches_inline(docs, spark, tmp_path):
    """write_bm25_index + bm25_topk_indexed reproduce bm25_topk exactly
    (same formula, rounding, tie-break) from the materialized postings."""
    from warcio_spark.operators.search import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path, n_buckets=8)
    want = bm25_topk(docs, Q, k=10).collect()
    got = bm25_topk_indexed(spark, path, Q, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_indexed_prunes_partitions(docs, spark, tmp_path):
    """The term set's bucket ids land as a PartitionFilters predicate:
    the postings scan reads only the query's bucket directories."""
    from warcio_spark.operators.search import (
        _term_bucket,
        bm25_topk_indexed,
        write_bm25_index,
    )

    import re

    path = str(tmp_path / "bm25p")
    write_bm25_index(docs, path, n_buckets=8)
    plan = (bm25_topk_indexed(spark, path, Q, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    want = sorted({_term_bucket(t, 8) for t in Q})
    # the partition filter must be an IN over EXACTLY the query buckets
    m = re.search(r"PartitionFilters: \[.*?bucket#\d+ IN \(([0-9,]+)\)",
                  plan)
    assert m, plan
    got = sorted(int(b) for b in m.group(1).split(","))
    assert got == want, (got, want)
    # and the term predicate pushes into the pruned files' row groups
    assert re.search(r"PushedFilters: \[.*In\(term", plan), plan


def test_index_bucket_expression_matches_python(docs, spark, tmp_path):
    """The writer's crc32 bucket column equals the driver-side python
    twin for every term in the corpus (java.util.zip.CRC32 == zlib)."""
    from pyspark.sql import functions as F

    from warcio_spark.operators.search import _term_bucket

    terms = (docs.select(F.explode(F.split("text", r"\s+")).alias("t"))
             .filter(F.col("t") != "").distinct())
    rows = terms.select(
        "t", F.pmod(F.crc32(F.col("t").cast("binary")), F.lit(8))
        .cast("int").alias("b")).collect()
    assert rows and all(_term_bucket(r["t"], 8) == r["b"] for r in rows)
