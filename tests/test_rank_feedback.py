"""Graph→frontier feedback: rank-proportional host budgets and
rank-boosted candidate priority (plans/frontier.rank_host_budgets /
rank_boosted_candidates) — hand-computed expectations, degenerate-score
behavior, composition with the real host_rank output, and
parallelism-invariance (independent of the DuckDB contract oracle)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warcio_spark.plans.frontier import (rank_boosted_candidates,
                                         rank_host_budgets)


def _scores(spark, rows):
    return spark.createDataFrame(rows, "host string, rank double")


def test_rank_host_budgets_hand_computed(spark):
    scores = _scores(spark, [("a.ex", 3.0), ("b.ex", 1.0),
                             ("c.ex", 0.0), ("d.ex", None)])
    got = {r.host: r.host_budget for r in rank_host_budgets(
        scores, 100, min_budget=2, max_budget=60).collect()}
    # sum of positive scores = 4: a -> ceil(75) capped at 60,
    # b -> ceil(25), zero/NULL -> min trickle
    assert got == {"a.ex": 60, "b.ex": 25, "c.ex": 2, "d.ex": 2}


def test_rank_host_budgets_degenerate_all_zero(spark):
    scores = _scores(spark, [("a.ex", 0.0), ("b.ex", None)])
    got = {r.host: r.host_budget for r in rank_host_budgets(
        scores, 100, min_budget=3).collect()}
    assert got == {"a.ex": 3, "b.ex": 3}


def _cands(spark):
    return spark.createDataFrame(
        [("http://a.ex/1", "a.ex", 5.0, 1),
         ("http://b.ex/1", "b.ex", 5.0, 2),
         ("http://z.ex/1", "z.ex", 5.0, 3)],
        "url string, host string, priority double, seq long")


def test_rank_boosted_candidates_hand_computed(spark):
    scores = _scores(spark, [("a.ex", 4.0), ("b.ex", 2.0)])
    rows = {r.url: r for r in rank_boosted_candidates(
        _cands(spark), scores, alpha=10.0).collect()}
    assert rows["http://a.ex/1"].rank_boost == 10.0
    assert rows["http://a.ex/1"].priority == 15.0
    assert rows["http://b.ex/1"].rank_boost == 5.0
    assert rows["http://b.ex/1"].priority == 10.0
    # host the score table has no opinion on: boost 0, priority stands
    assert rows["http://z.ex/1"].rank_boost == 0.0
    assert rows["http://z.ex/1"].priority == 5.0
    # schema passes through untouched apart from the rewrite + audit col
    assert set(rows["http://a.ex/1"].asDict()) == {
        "url", "host", "priority", "seq", "rank_boost"}


def test_rank_boosted_candidates_degenerate_scores(spark):
    scores = _scores(spark, [("a.ex", 0.0), ("b.ex", -1.0)])
    rows = rank_boosted_candidates(_cands(spark), scores).collect()
    assert all(r.rank_boost == 0.0 and r.priority == 5.0 for r in rows)


def test_composes_with_host_rank_output(spark):
    """End-to-end over the real graph layer: a hub-heavy link table ->
    host_rank -> boosted candidates order the ranked host first among
    equal base priorities; budgets favor it proportionally."""
    from warcio_spark.plans.graph import host_graph, host_rank

    links = spark.createDataFrame(
        [("http://u%d.ex/p" % i, "http://hub.ex/x") for i in range(6)]
        + [("http://u0.ex/p", "http://side.ex/y")],
        "page_url string, outlink string")
    ranks = host_rank(host_graph(links), iterations=2)
    assert set(ranks.columns) == {"host", "rank"}

    cands = spark.createDataFrame(
        [("http://hub.ex/next", "hub.ex", 1.0, 1),
         ("http://side.ex/next", "side.ex", 1.0, 2)],
        "url string, host string, priority double, seq long")
    boosted = rank_boosted_candidates(cands, ranks, alpha=10.0)
    ordered = [r.host for r in boosted.orderBy(
        F.desc("priority"), F.asc("seq")).collect()]
    assert ordered[0] == "hub.ex"

    budgets = {r.host: r.host_budget for r in rank_host_budgets(
        ranks, 100, max_budget=90).collect()}
    assert budgets["hub.ex"] > budgets["side.ex"]


def test_parallelism_invariance(spark):
    scores = _scores(spark, [("h%d.ex" % i, float(i % 7)) for i in
                             range(40)])
    cands = spark.createDataFrame(
        [("http://h%d.ex/p%d" % (i % 40, i), "h%d.ex" % (i % 40),
          float(i % 13), i) for i in range(200)],
        "url string, host string, priority double, seq long")

    def run(sc, ca):
        b = {r.host: r.host_budget
             for r in rank_host_budgets(sc, 500).collect()}
        p = {r.url: (r.priority, r.rank_boost)
             for r in rank_boosted_candidates(ca, sc).collect()}
        return b, p

    one = run(scores.coalesce(1), cands.coalesce(1))
    many = run(scores.repartition(8), cands.repartition(16))
    assert one == many
