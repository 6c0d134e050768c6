"""Change-rate estimation (plans/revalidate.change_rate_table): the
Cho & Garcia-Molina estimator over capture histories — hand-computed
cases, a python oracle, degenerate inputs, parallelism invariance."""

import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.revalidate import change_rate_table

TS = "2024%02d%02d000000"


def _oracle(rows):
    by = defaultdict(list)
    for k, ts, dig in rows:
        epoch = None  # computed below from ts14
        import datetime
        dt = datetime.datetime.strptime(ts, "%Y%m%d%H%M%S").replace(
            tzinfo=datetime.timezone.utc)
        by[k].append((int(dt.timestamp()), dig))
    out = {}
    for k, caps in by.items():
        caps.sort()
        n = len(caps)
        x = sum(1 for i in range(1, n) if caps[i][1] != caps[i - 1][1])
        span = caps[-1][0] - caps[0][0]
        if n > 1 and span > 0:
            mean_iv = span / (n - 1)
            rate = -math.log((n - x + 0.5) / (n + 0.5)) / mean_iv * 86400.0
            est = round(1.0 / rate, 6) if rate > 0 else None
            out[k] = (n, x, span, round(mean_iv, 4), round(rate, 8), est)
        else:
            out[k] = (n, x, span, None, None, None)
    return out


def _run(spark, rows, parts=None):
    df = spark.createDataFrame(
        rows, "urlkey string, timestamp string, digest string")
    if parts:
        df = df.repartition(parts)
    return {r.urlkey: (r.n_captures, r.n_changes, r.span_s,
                       r.mean_interval_s, r.change_rate_per_day,
                       r.est_interval_days)
            for r in change_rate_table(df).collect()}


def test_hand_cases(spark):
    day = lambda i: "202401%02d000000" % i  # noqa: E731
    rows = (
        # changes every capture: 4 captures daily, 3 changes
        [("hot)/", day(i + 1), "D%d" % i) for i in range(4)]
        # never changes: 4 captures, 0 changes -> rate 0, est NULL
        + [("cold)/", day(i + 1), "SAME") for i in range(4)]
        # single capture -> all NULL
        + [("one)/", day(1), "X")]
    )
    got = _run(spark, rows)
    n, x = 4, 3
    rate = -math.log((n - x + 0.5) / (n + 0.5)) / 86400.0 * 86400.0
    assert got["hot)/"] == (4, 3, 3 * 86400, 86400.0, round(rate, 8),
                            round(1 / rate, 6))
    assert got["cold)/"] == (4, 0, 3 * 86400, 86400.0, 0.0, None)
    assert got["one)/"] == (1, 0, 0, None, None, None)
    # the estimator de-biases upward: observed 3/3 intervals changed,
    # naive rate 1/day, corrected strictly above it
    assert got["hot)/"][4] > 1.0


def test_matches_python_oracle_pseudorandom(spark):
    rows = []
    for i in range(400):
        k = "u%d)/" % (i % 17)
        ts = "2024%02d%02d%02d0000" % (i % 12 + 1, i % 28 + 1, i % 24)
        dig = "D%d" % ((i * 7) % 5 // 2)
        rows.append((k, ts, dig))
    assert _run(spark, rows) == _oracle(rows)


def test_parallelism_invariance(spark):
    rows = [("u%d)/" % (i % 5), "202401%02d%02d0000" % (i % 28 + 1, i % 24),
             "D%d" % (i % 3)) for i in range(250)]
    assert _run(spark, rows) == _run(spark, rows, parts=16)
