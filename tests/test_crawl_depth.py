"""BFS crawl-depth (plans/graph.crawl_depth): brute-force Python-BFS
oracle on random-ish deterministic graphs, hand cases for horizon
truncation / unreachable nodes / cycles, and parallelism invariance."""

import os
import sys
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.graph import crawl_depth


def _bfs_oracle(edges, seeds, max_depth):
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    depth = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if depth[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    return depth


def _run(spark, edges, seeds, max_depth):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "url string")
    return {r.url: r.depth for r in
            crawl_depth(e, s, max_depth=max_depth).collect()}


def test_hand_case_chain_cycle_unreachable(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"),   # cycle back to seed
             ("c", "d"), ("x", "y")]               # x/y unreachable
    got = _run(spark, edges, ["a"], 6)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_horizon_truncates_long_chain(spark):
    edges = [("n%d" % i, "n%d" % (i + 1)) for i in range(20)]
    got = _run(spark, edges, ["n0"], 4)
    assert got == {"n%d" % i: i for i in range(5)}  # 0..4 only


def test_multi_seed_min_depth_wins(spark):
    # d reachable at depth 3 from a but depth 1 from the second seed
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("s2", "d")]
    got = _run(spark, edges, ["a", "s2"], 6)
    assert got["d"] == 1 and got["a"] == 0 and got["s2"] == 0


def test_matches_bfs_oracle_on_pseudorandom_graph(spark):
    n = 120
    edges = []
    for i in range(n):
        edges.append(("u%d" % i, "u%d" % ((i * 7 + 3) % n)))
        if i % 3 == 0:
            edges.append(("u%d" % i, "u%d" % ((i * 13 + 1) % n)))
    seeds = ["u0", "u97"]
    exp = _bfs_oracle(edges, seeds, 5)
    got = _run(spark, edges, seeds, 5)
    assert got == exp


def test_parallelism_invariance(spark):
    edges = [("u%d" % i, "u%d" % ((i * 7 + 3) % 80)) for i in range(80)]
    e1 = spark.createDataFrame(edges, "src string, dst string").coalesce(1)
    e8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    s = spark.createDataFrame([("u0",)], "url string")
    one = {r.url: r.depth for r in crawl_depth(e1, s, max_depth=7).collect()}
    many = {r.url: r.depth for r in crawl_depth(e8, s, max_depth=7).collect()}
    assert one == many


def test_empty_seed_list(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([], "url string")
    assert crawl_depth(e, s).count() == 0
