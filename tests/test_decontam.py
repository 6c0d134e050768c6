"""Benchmark decontamination (operators/decontam.py): planted-overlap
semantics, short-doc edge, and the broadcast-semi-join plan shape.
The full value-level contract is oracled by the driver's `decontaminate`
entry against DuckDB at sf0.01."""

from pyspark.sql import functions as F

from warcio_spark.operators.decontam import decontaminate, gram_hashes

_BENCH = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
# shares the 8-gram "beta gamma ... iota" with _BENCH
_DIRTY = "prefix beta gamma delta epsilon zeta eta theta iota suffix tail"
_CLEAN = "one two three four five six seven eight nine ten eleven twelve"
_SHORT = "too few tokens"


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_planted_overlap_flagged(spark):
    docs = _df(spark, [(1, _DIRTY), (2, _CLEAN), (3, _SHORT)])
    bench = _df(spark, [(100, _BENCH)])
    out = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["n_shared_ngrams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_shared_ngrams"] == 0
    # a doc below n tokens has no grams and must still appear, clean
    assert not out[3]["contaminated"] and out[3]["n_shared_ngrams"] == 0


def test_n_parameter_widens_matches(spark):
    docs = _df(spark, [(1, _DIRTY)])
    bench = _df(spark, [(100, _BENCH)])
    # at n=3 the shared window "beta..iota" yields many distinct 3-grams
    n3 = decontaminate(docs, bench, n=3).collect()[0]["n_shared_ngrams"]
    n8 = decontaminate(docs, bench, n=8).collect()[0]["n_shared_ngrams"]
    assert n3 > n8 == 1


def test_self_match_when_benchmark_in_corpus(spark):
    docs = _df(spark, [(1, _BENCH), (2, _CLEAN)])
    bench = _df(spark, [(100, _BENCH)])
    out = {r["doc_id"]: r["contaminated"] for r in
           decontaminate(docs, bench).collect()}
    assert out[1] and not out[2]


def test_gram_hashes_count_and_determinism(spark):
    df = _df(spark, [(1, _BENCH)]).select(
        F.size(gram_hashes("text", 8)).alias("n"),
        gram_hashes("text", 8)[0].alias("first"),
    )
    row = df.collect()[0]
    assert row["n"] == 3  # 10 tokens -> 3 eight-grams
    import hashlib
    expect = hashlib.md5(
        " ".join(_BENCH.split()[0:8]).encode()).hexdigest()
    assert row["first"] == expect


def test_broadcast_semi_join_plan(spark):
    import contextlib
    import io

    docs = _df(spark, [(1, _DIRTY), (2, _CLEAN)])
    bench = _df(spark, [(100, _BENCH)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate(docs, bench).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
