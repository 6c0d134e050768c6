"""Content-defined chunking (FastCDC-style gear hash): boundary clamps,
edit locality, and the block-level shared-chunk stats."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warcio_spark.operators.dedup import (_cdc_boundaries, cdc_chunk_hashes,
                                          cdc_shared_chunks)


def test_cdc_boundaries_clamped_and_deterministic():
    data = ("lorem ipsum dolor sit amet consectetur " * 50).encode()
    cuts = _cdc_boundaries(data, 32, 256)
    assert cuts == _cdc_boundaries(data, 32, 256)
    assert cuts[-1] == len(data)
    starts = [0] + cuts[:-1]
    # every chunk but the final remainder respects [min_len, max_len]
    for s, e in zip(starts[:-1], cuts[:-1]):
        assert 32 <= e - s <= 256, (s, e)
    assert cuts[-1] - starts[-1] <= 256
    assert _cdc_boundaries(b"", 32, 256) == []
    short = _cdc_boundaries(b"tiny", 32, 256)
    assert short == [4]


def test_cdc_edit_locality():
    """A tail edit must not disturb the prefix cuts (content-defined, not
    offset-defined); an inserted middle region re-synchronizes after it."""
    import random

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    r = random.Random(1)
    base = " ".join(r.choice(words) + str(r.randrange(1000))
                    for _ in range(200)).encode()
    cuts_a = _cdc_boundaries(base, 32, 256)
    cuts_b = _cdc_boundaries(base + b"A COMPLETELY NEW TAIL", 32, 256)
    assert cuts_a[:-1] == cuts_b[: len(cuts_a) - 1]
    # offset shift: prepend 13 bytes; cut POSITIONS shift but re-sync so
    # most chunk CONTENT (hence hashes) is preserved
    shifted = b"0123456789abc" + base
    cuts_c = _cdc_boundaries(shifted, 32, 256)
    chunks_a = {base[s:e] for s, e in zip([0] + cuts_a[:-1], cuts_a)}
    chunks_c = {shifted[s:e] for s, e in zip([0] + cuts_c[:-1], cuts_c)}
    assert len(chunks_a & chunks_c) >= len(chunks_a) * 0.7


def test_cdc_shared_chunks_planted(spark):
    import random

    rng = random.Random(42)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()

    def doc(seed, n=200):
        r = random.Random(seed)
        return " ".join(r.choice(words) + str(r.randrange(1000))
                        for _ in range(n))

    a = doc(1)
    rows = [
        (1, a),
        (2, a),                          # exact copy: everything shared
        (3, doc(3)),                     # unrelated
        (4, doc(4) + " " + a + " " + doc(5)),  # embeds A wholesale
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cdc_shared_chunks(df).collect()}
    assert out[1].shared_ratio == 1.0 and out[2].shared_ratio == 1.0
    assert out[3].n_shared == 0
    # the embedded copy shares most of A's interior chunks
    assert out[4].n_shared >= out[1].n_chunks * 0.6
    # determinism across partitionings
    again = sorted(map(tuple, cdc_shared_chunks(df.repartition(7)).collect()))
    assert again == sorted(map(tuple, cdc_shared_chunks(df).collect()))


def test_cdc_chunk_hashes_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "x")],
                               "doc_id long, text string")
    got = {r.doc_id: r.ch for r in
           df.select("doc_id", cdc_chunk_hashes("text").alias("ch")).collect()}
    assert got[1] is None and got[2] == [] and len(got[3]) == 1


def test_cdc_shared_chunks_single_arrow_node(spark):
    """The chunking UDF must run ONCE: plain explode's implicit
    size()>0 filter re-inlines the UDF below the projection (two
    ArrowEvalPython nodes = corpus chunked twice); the explode_outer +
    post-Generate null-drop formulation pins it to one."""
    import re

    df = spark.createDataFrame([(1, "x " * 100)], "doc_id long, text string")
    plan = cdc_shared_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1, plan
