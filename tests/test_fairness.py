"""Crawl fairness report (plans/fairness.fetch_fairness): closed-form
hand cases (even, monopoly, known Gini), python oracle over a skewed
randomized universe, empty-log contract, parallelism invariance."""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.fairness import fetch_fairness


def _run(spark, hosts, parts=None):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    if parts:
        df = df.repartition(parts)
    rows = fetch_fairness(df).collect()
    if not rows:
        return None
    r = rows[0]
    return (r.n_hosts, r.total_fetches, r.gini, r.hhi, r.max_share)


def _oracle(hosts):
    c = Counter(hosts)
    xs = sorted(c.values())
    n, s = len(xs), sum(xs)
    w = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2.0 * w / (n * s) - (n + 1) / n
    hhi = sum(x * x for x in xs) / (s * s)
    return (n, s, round(gini, 6), round(hhi, 6), round(max(xs) / s, 6))


def test_even_distribution(spark):
    hosts = [f"h{i}.ex" for i in range(10)] * 7
    got = _run(spark, hosts)
    assert got == (10, 70, 0.0, round(1 / 10, 6), round(7 / 70, 6))


def test_monopoly(spark):
    # 1 host with all but n-1 fetches: gini -> (n-1)/n * (1 - n/total)ish;
    # just pin against the closed-form oracle
    hosts = ["big.ex"] * 96 + ["a.ex", "b.ex", "c.ex", "d.ex"]
    assert _run(spark, hosts) == _oracle(hosts)
    got = _run(spark, hosts)
    assert got[2] > 0.7 and got[4] == 0.96


def test_two_hosts_known_gini(spark):
    # counts (1, 3): ranks 1,2 -> G = 2*(1*1+2*3)/(2*4) - 3/2 = 0.25
    hosts = ["a.ex", "b.ex", "b.ex", "b.ex"]
    got = _run(spark, hosts)
    assert got == (2, 4, 0.25, round((1 + 9) / 16, 6), 0.75)


def test_empty_log(spark):
    assert _run(spark, []) is None


def test_python_oracle_randomized_skew(spark):
    import random

    rng = random.Random(7)
    hosts = []
    for i in range(400):
        # Zipf-flavored: host k appears ~ 1/k
        k = min(int(1.0 / max(rng.random(), 1e-6)), 60)
        hosts.append("h%d.ex" % k)
    want = _oracle(hosts)
    assert _run(spark, hosts) == want
    assert _run(spark, hosts, parts=7) == want
