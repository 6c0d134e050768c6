"""Per-host circuit breaker (plans/retry.host_circuit_breaker):
hand-computed streaks, a brute-force Python oracle, NULL-status and
never-succeeded paths, and parallelism invariance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.retry import host_circuit_breaker


def _oracle(rows, trip_after):
    out = {}
    by_host = {}
    for h, seq, st in rows:
        by_host.setdefault(h, []).append((seq, st))
    for h, evs in by_host.items():
        evs.sort()
        ok = [s for s, st in evs if st is not None and 200 <= st < 400]
        last_ok = max(ok) if ok else None
        trailing = sum(1 for s, _ in evs if last_ok is None or s > last_ok)
        fails = sum(1 for _, st in evs
                    if st is None or not (200 <= st < 400))
        out[h] = (len(evs), fails, last_ok, trailing,
                  trailing >= trip_after)
    return out


def _run(spark, rows, trip_after, parts=None):
    df = spark.createDataFrame(rows, "host string, seq long, status int")
    if parts:
        df = df.repartition(parts)
    return {r.host: (r.n_fetches, r.n_failures, r.last_ok_seq,
                     r.trailing_failures, r.tripped)
            for r in host_circuit_breaker(
                df, trip_after=trip_after).collect()}


def test_hand_cases(spark):
    rows = [
        # dead host: every attempt fails -> whole history is the streak
        ("dead.ex", 1, 503), ("dead.ex", 2, 500), ("dead.ex", 3, None),
        # recovered: failures BEFORE the last success don't count
        ("flaky.ex", 1, 500), ("flaky.ex", 2, 500), ("flaky.ex", 3, 200),
        ("flaky.ex", 4, 503),
        # healthy: latest attempt succeeded
        ("ok.ex", 1, 200), ("ok.ex", 2, 301),
        # 404 is a failure for the breaker (non-2xx/3xx), NULL too
        ("err.ex", 1, 404), ("err.ex", 2, None), ("err.ex", 3, 404),
    ]
    got = _run(spark, rows, trip_after=3)
    assert got["dead.ex"] == (3, 3, None, 3, True)
    assert got["flaky.ex"] == (4, 3, 3, 1, False)
    assert got["ok.ex"] == (2, 0, 2, 0, False)
    assert got["err.ex"] == (3, 3, None, 3, True)


def test_matches_python_oracle_pseudorandom(spark):
    rows = []
    for i in range(400):
        h = "h%d.ex" % (i % 11)
        st = (None if i % 17 == 0
              else 200 if (i * 31) % 10 < 6
              else 503 if i % 3 == 0 else 404)
        rows.append((h, i, st))
    exp = _oracle(rows, 4)
    got = _run(spark, rows, trip_after=4)
    assert got == exp


def test_parallelism_invariance(spark):
    rows = [("h%d.ex" % (i % 7), i, 200 if (i * 13) % 5 else 500)
            for i in range(300)]
    assert _run(spark, rows, 3) == _run(spark, rows, 3, parts=16)
