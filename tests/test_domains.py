"""Domain-level curation (operators/domains): registered-domain
extraction, per-domain stats semantics (NULL scores), and the
site-level filter gates."""

import contextlib
import io

from pyspark.sql import functions as F

from warcio_spark.operators.domains import (
    domain_stats,
    filter_by_domain_stats,
    registered_domain,
)

CASES = [
    ("a.b.example.com", "example.com"),
    ("example.com", "example.com"),
    ("www.bbc.co.uk", "bbc.co.uk"),
    ("bbc.co.uk", "bbc.co.uk"),
    ("co.uk", "co.uk"),                 # the suffix itself: no registrable
    ("x.y.smh.com.au", "smh.com.au"),
    ("localhost", "localhost"),
    ("deep.a.b.c.example.org", "example.org"),
]


def test_registered_domain(spark):
    df = spark.createDataFrame(CASES, ["host", "want"])
    got = df.select("want",
                    registered_domain(F.col("host")).alias("got")).collect()
    for r in got:
        assert r.got == r.want


def test_domain_stats_null_scores(spark):
    rows = [("a.com", 1.0), ("a.com", 3.0), ("a.com", None),
            ("b.com", -1.0)]
    df = spark.createDataFrame(rows, ["domain", "score"])
    got = {r.domain: r for r in
           domain_stats(df, low_threshold=0.0).collect()}
    a = got["a.com"]
    # NULL counts toward n_docs but toward no score statistic
    assert a.n_docs == 3 and a.mean_score == 2.0
    assert a.min_score == 1.0 and a.max_score == 3.0 and a.frac_low == 0.0
    b = got["b.com"]
    assert b.n_docs == 1 and b.frac_low == 1.0


def test_filter_by_domain_stats_gates(spark):
    docs = spark.createDataFrame(
        [(i, d, s) for i, (d, s) in enumerate([
            ("good.com", 5.0), ("good.com", 6.0), ("good.com", 7.0),
            ("bad.com", 0.1), ("bad.com", 0.2), ("bad.com", 0.3),
            ("tiny.com", 0.0),          # below min_docs: unjudged, kept
        ])], ["doc_id", "domain", "score"])
    stats = domain_stats(docs, low_threshold=1.0)
    kept = filter_by_domain_stats(
        docs, stats, min_docs=2, min_mean=1.0)
    doms = sorted({r.domain for r in kept.collect()})
    assert doms == ["good.com", "tiny.com"]
    # docs whose domain has NO stats row at all are kept too
    extra = spark.createDataFrame([(99, "absent.com", 1.0)],
                                  ["doc_id", "domain", "score"])
    kept2 = filter_by_domain_stats(docs.unionByName(extra), stats,
                                   min_docs=2, min_mean=1.0)
    assert "absent.com" in {r.domain for r in kept2.collect()}
    # frac_low gate: good.com has frac_low 0, passes; with a harsh gate
    # everything judged dies but tiny stays
    kept3 = filter_by_domain_stats(
        docs, stats, min_docs=2, min_mean=0.0, max_frac_low=-0.1)
    assert sorted({r.domain for r in kept3.collect()}) == ["tiny.com"]


def test_filter_plan_broadcasts_stats(spark):
    docs = spark.createDataFrame(
        [(1, "a.com", 1.0)], ["doc_id", "domain", "score"])
    stats = domain_stats(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filter_by_domain_stats(docs, stats, min_mean=0.0).explain(
            "formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
