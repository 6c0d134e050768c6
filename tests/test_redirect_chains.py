"""Redirect-chain resolution (plans/graph.resolve_chains): hand-built
chains/loops/caps, a brute-force Python pointer-walker oracle over a
pseudorandom graph, fork determinism, and parallelism invariance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.graph import resolve_chains


def _oracle(edges, max_hops):
    # deterministic fork collapse first, like the operator
    m = {}
    for s, d in edges:
        m[s] = max(m.get(s, d), d)
    out = {}
    for s in m:
        cur, hops = m[s], 1
        while cur in m and hops <= max_hops:
            cur, hops = m[cur], hops + 1
        if cur not in m and hops <= max_hops:
            out[s] = (cur, hops, False)
        else:
            out[s] = (None, None, True)
    return out


def _run(spark, edges, max_hops, parts=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    if parts:
        df = df.repartition(parts)
    return {r.url: (r.final_url, r.hops, r.unresolved)
            for r in resolve_chains(df, max_hops=max_hops).collect()}


def test_hand_cases(spark):
    edges = [
        # plain 3-hop chain a->b->c->z (z terminal)
        ("a", "b"), ("b", "c"), ("c", "z"),
        # 2-cycle
        ("p", "q"), ("q", "p"),
        # self-redirect
        ("s", "s"),
        # chain INTO the cycle
        ("r", "p"),
        # fork: f observed redirecting to two targets -> max wins
        ("f", "t1"), ("f", "t2"),
    ]
    got = _run(spark, edges, max_hops=8)
    assert got["a"] == ("z", 3, False)
    assert got["b"] == ("z", 2, False)
    assert got["c"] == ("z", 1, False)
    assert got["p"] == (None, None, True)
    assert got["q"] == (None, None, True)
    assert got["s"] == (None, None, True)
    assert got["r"] == (None, None, True)
    assert got["f"] == ("t2", 1, False)
    assert len(got) == 8  # one row per SOURCE url, terminals absent


def test_hop_cap_boundary(spark):
    # chain of exactly 5 hops: n0->n1->...->n5 (n5 terminal)
    edges = [("n%d" % i, "n%d" % (i + 1)) for i in range(5)]
    at_cap = _run(spark, edges, max_hops=5)
    assert at_cap["n0"] == ("n5", 5, False)
    below = _run(spark, edges, max_hops=4)
    assert below["n0"] == (None, None, True)   # 5 hops > cap 4
    assert below["n1"] == ("n5", 4, False)     # 4 hops == cap


def test_matches_python_oracle_pseudorandom(spark):
    # pseudorandom pointer graph: chains, merges, a few planted cycles
    edges = []
    for i in range(500):
        if i % 11 == 0:
            continue  # terminals
        d = (i * 37 + 13) % 500
        edges.append(("u%d" % i, "u%d" % d))
    for b in (660, 770):  # planted 3-cycles in a separate namespace
        edges += [("c%da" % b, "c%db" % b), ("c%db" % b, "c%dc" % b),
                  ("c%dc" % b, "c%da" % b)]
    for mh in (3, 16):
        exp = {k: v for k, v in _oracle(edges, mh).items()}
        got = _run(spark, edges, mh)
        assert got == exp, "max_hops=%d" % mh


def test_null_edges_dropped(spark):
    # NULL targets (unparseable Location) are not pointers: the source
    # drops from the output instead of claiming a resolved NULL final;
    # upstream chains terminate AT the url whose pointer was null-dropped
    edges = [("a", None), ("b", "a"), (None, "x"), ("c", "z")]
    got = _run(spark, edges, max_hops=8)
    assert set(got) == {"b", "c"}
    assert got["b"] == ("a", 1, False)   # a is terminal once its edge drops
    assert got["c"] == ("z", 1, False)
    for final, hops, unresolved in got.values():
        assert unresolved or final is not None


def test_parallelism_invariance(spark):
    edges = [("u%d" % i, "u%d" % ((i * 7 + 3) % 200))
             for i in range(200) if i % 9]
    assert _run(spark, edges, 12) == _run(spark, edges, 12, parts=16)
