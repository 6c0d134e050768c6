"""plans.prefix global prefix sums + pipeline.shard_assignment vs
brute-force Python oracles, including partitioning invariance (the
property the two-phase design exists for)."""

import random

import pytest
from pyspark.sql import functions as F

from warcio_spark.operators.pipeline import shard_assignment, shard_sizes
from warcio_spark.plans.prefix import with_global_cumsum, with_global_row_number


def _frame(spark, rows, parts):
    return spark.createDataFrame(rows, ["k", "v"]).repartition(parts)


def test_cumsum_matches_bruteforce_any_partitioning(spark):
    rng = random.Random(7)
    rows = [(k, rng.randrange(0, 50)) for k in rng.sample(range(10_000), 400)]
    expect_incl = {}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        expect_incl[k] = acc
    for nparts, inparts in ((1, 1), (3, 5), (8, 2)):
        tracker = []
        out = with_global_cumsum(
            _frame(spark, rows, inparts), "k", "v", "cum",
            num_partitions=nparts, persist_tracker=tracker,
        )
        got = {r["k"]: r["cum"] for r in out.collect()}
        assert got == expect_incl, f"nparts={nparts}"
        for c in tracker:
            c.unpersist()


def test_cumsum_exclusive_first_row_zero(spark):
    rows = [(3, 10), (1, 5), (2, 7)]
    out = with_global_cumsum(
        _frame(spark, rows, 2), "k", "v", "before", exclusive=True,
        num_partitions=2,
    )
    assert {r["k"]: r["before"] for r in out.collect()} == {1: 0, 2: 5, 3: 12}


def test_row_number_dense_zero_based(spark):
    rows = [(k, 0) for k in (50, 10, 40, 20, 30)]
    out = with_global_row_number(
        _frame(spark, rows, 3), "k", "rn", num_partitions=4
    )
    assert {r["k"]: r["rn"] for r in out.collect()} == {
        10: 0, 20: 1, 30: 2, 40: 3, 50: 4
    }
    assert "rn" in out.columns and "__prefix_one" not in out.columns


def test_shard_assignment_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randrange(1, 30))))
        for i in rng.sample(range(5_000), 300)
    ]
    budget = 100
    acc, expect = 0, {}
    for i, text in sorted(rows):
        n = len(text.split())
        expect[i] = (n, acc, acc // budget)
        acc += n
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(6)
    tracker = []
    out = shard_assignment(docs, budget, persist_tracker=tracker)
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens_before"], r["shard_id"])
        for r in out.collect()
    }
    assert got == expect
    # every shard except possibly the last lands within one max-doc of
    # the budget either side (start-offset packing: a straddling doc
    # counts wholly toward the shard where it starts)
    sizes = {r["shard_id"]: r["n_tokens"] for r in shard_sizes(out).collect()}
    max_doc = max(n for n, _, _ in expect.values())
    last = max(sizes)
    for sid, tok in sizes.items():
        if sid != last:
            assert budget - max_doc < tok < budget + max_doc
    for c in tracker:
        c.unpersist()


def test_shard_assignment_rejects_bad_budget(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        shard_assignment(docs, 0)
