"""Link-farm reciprocity census (plans/graph.link_reciprocity):
hand-built ring/organic/sink cases, a python oracle, self-loop and
multiplicity handling, parallelism invariance."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.graph import link_reciprocity


def _oracle(edges, min_out, thr):
    es = {(s, t) for s, t in edges if s != t}
    out = defaultdict(set)
    inn = defaultdict(set)
    for s, t in es:
        out[s].add(t)
        inn[t].add(s)
    hosts = set(out) | set(inn)
    res = {}
    for h in hosts:
        o, i = len(out[h]), len(inn[h])
        r = sum(1 for t in out[h] if (t, h) in es)
        rec = round(r / o, 8) if o else None
        res[h] = (o, i, r, rec,
                  o >= min_out and rec is not None and rec >= thr)
    return res


def _run(spark, edges, parts=None, **kw):
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    if parts:
        df = df.repartition(parts)
    return {r.host: (r.out_hosts, r.in_hosts, r.reciprocal_hosts,
                     r.reciprocity, r.farm)
            for r in link_reciprocity(df, **kw).collect()}


def test_hand_cases(spark):
    ring = ["f%d.ex" % i for i in range(6)]
    edges = []
    # farm ring: every pair mutual (6 hosts, out=5, reciprocity 1.0)
    for a in ring:
        for b in ring:
            if a != b:
                edges.append((a, b))
    # organic: hub links 5 targets, none link back
    edges += [("hub.ex", "t%d.ex" % i) for i in range(5)]
    # one mutual pair below min_out -> not a farm
    edges += [("pair-a.ex", "pair-b.ex"), ("pair-b.ex", "pair-a.ex")]
    # self-loop dropped; duplicate edge collapsed
    edges += [("hub.ex", "hub.ex"), ("hub.ex", "t0.ex")]
    got = _run(spark, edges, min_out=5, farm_threshold=0.6)
    for h in ring:
        assert got[h] == (5, 5, 5, 1.0, True)
    assert got["hub.ex"] == (5, 0, 0, 0.0, False)
    assert got["t0.ex"] == (0, 1, 0, None, False)  # sink: NULL reciprocity
    assert got["pair-a.ex"] == (1, 1, 1, 1.0, False)  # under min_out


def test_matches_python_oracle_pseudorandom(spark):
    edges = []
    for i in range(800):
        s = "h%d.ex" % (i % 19)
        t = "h%d.ex" % ((i * 7 + 3) % 19)
        edges.append((s, t))
    exp = _oracle(edges, 3, 0.5)
    got = _run(spark, edges, min_out=3, farm_threshold=0.5)
    assert got == exp


def test_parallelism_invariance(spark):
    edges = [("h%d.ex" % (i % 11), "h%d.ex" % ((i * 5 + 1) % 11))
             for i in range(300)]
    assert (_run(spark, edges, min_out=2, farm_threshold=0.4)
            == _run(spark, edges, parts=16, min_out=2, farm_threshold=0.4))
