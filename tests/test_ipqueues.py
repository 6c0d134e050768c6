"""Queue-by-IP politeness (plans/ipqueues.ip_queue_budget): hand cases
per merge path, default-delay fallback, python oracle over a randomized
universe, parallelism invariance."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.ipqueues import ip_queue_budget

STATS_SCHEMA = "host string, n_urls long, crawl_delay double"
RES_SCHEMA = "host string, ip string"


def _run(spark, stats, res, parts=None, **kw):
    s = spark.createDataFrame(stats, STATS_SCHEMA)
    r = spark.createDataFrame(res, RES_SCHEMA)
    if parts:
        s = s.repartition(parts)
    return {
        row.queue_key: (
            row.n_hosts, row.n_urls, row.delay_s, row.eta_s,
            list(row.hosts_preview),
        )
        for row in ip_queue_budget(s, r, **kw).collect()
    }


def test_hand_cases(spark):
    stats = [
        # three vhosts on one box: queues merge, strictest delay wins
        ("a.farm.ex", 10, 1.0),
        ("b.farm.ex", 20, 5.0),
        ("c.farm.ex", 5, None),  # NULL delay -> default
        # lone resolved host
        ("solo.ex", 3, 2.0),
        # unresolved host keeps a private queue
        ("dark.ex", 7, 4.0),
        # resolved to NULL ip == unresolved
        ("nullip.ex", 2, None),
    ]
    res = [
        ("a.farm.ex", "10.0.0.1"),
        ("b.farm.ex", "10.0.0.1"),
        ("c.farm.ex", "10.0.0.1"),
        ("solo.ex", "10.0.0.2"),
        ("nullip.ex", None),
    ]
    got = _run(spark, stats, res, default_delay=1.5)
    assert got["ip:10.0.0.1"] == (
        3, 35, 5.0, 34 * 5.0, ["a.farm.ex", "b.farm.ex", "c.farm.ex"])
    assert got["ip:10.0.0.2"] == (1, 3, 2.0, 4.0, ["solo.ex"])
    assert got["host:dark.ex"] == (1, 7, 4.0, 24.0, ["dark.ex"])
    assert got["host:nullip.ex"] == (1, 2, 1.5, 1.5, ["nullip.ex"])
    assert len(got) == 4


def test_single_url_queue_zero_eta(spark):
    got = _run(spark, [("one.ex", 1, 9.0)], [("one.ex", "10.1.1.1")])
    assert got["ip:10.1.1.1"] == (1, 1, 9.0, 0.0, ["one.ex"])


def _oracle(stats, res, default=1.0):
    ip = {h: a for h, a in res if a is not None}
    by = defaultdict(list)
    for h, n, d in stats:
        key = "ip:" + ip[h] if h in ip else "host:" + h
        by[key].append((h, n, d if d is not None else default))
    out = {}
    for key, rows in by.items():
        hosts = sorted({h for h, _, _ in rows})
        n = sum(r[1] for r in rows)
        delay = max(r[2] for r in rows)
        out[key] = (
            len(hosts), n, round(delay, 6),
            round(max(n - 1, 0) * delay, 6), hosts[:5],
        )
    return out


def test_python_oracle_randomized(spark):
    import random

    rng = random.Random(1234)
    stats, res = [], []
    for i in range(80):
        h = "h%d.ex" % i
        stats.append(
            (h, rng.randrange(0, 50),
             round(rng.uniform(0.5, 8.0), 3) if rng.random() < 0.8 else None)
        )
        if rng.random() < 0.7:
            res.append((h, "10.0.0.%d" % rng.randrange(1, 12)))
        elif rng.random() < 0.5:
            res.append((h, None))
    want = _oracle(stats, res)
    assert _run(spark, stats, res) == want
    assert _run(spark, stats, res, parts=7) == want
