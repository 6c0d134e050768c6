"""chunk_documents (operators/pipeline.py) vs a direct Python oracle."""

import math

import pytest

from warcio_spark.operators.pipeline import chunk_documents


def _py_chunks(text, chunk, overlap):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return []
    stride = chunk - overlap
    nc = max(1, math.ceil((n - overlap) / stride))
    return [
        (i, len(toks[i * stride:i * stride + chunk]),
         " ".join(toks[i * stride:i * stride + chunk]))
        for i in range(nc)
    ]


ROWS = [
    (1, " ".join(f"w{i}" for i in range(20))),   # multiple chunks
    (2, "a b c"),                                  # shorter than one chunk
    (3, ""),                                       # empty -> no rows
    (4, " ".join(f"w{i}" for i in range(8))),     # exactly one chunk
    (5, " ".join(f"w{i}" for i in range(9))),     # one token over
]


@pytest.mark.parametrize("chunk,overlap", [(8, 2), (8, 0), (5, 4)])
def test_chunks_match_python_oracle(spark, chunk, overlap):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {}
    for r in chunk_documents(docs, chunk, overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
        )
    for i, t in ROWS:
        assert sorted(got.get(i, [])) == _py_chunks(t, chunk, overlap), (
            i, chunk, overlap
        )


def test_every_token_covered(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    rows = chunk_documents(docs, 8, 3).collect()
    for i, t in ROWS:
        toks = t.split()
        covered = set()
        for r in rows:
            if r["doc_id"] == i:
                covered.update(r["chunk"].split())
        assert covered == set(toks)


def test_bad_overlap_raises(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, 8, 8)
    with pytest.raises(ValueError):
        chunk_documents(docs, 8, -1)
