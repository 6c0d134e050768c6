"""Politeness compliance audit (plans/frontier.delay_compliance):
hand cases per path, tie-gap semantics, default-delay fallback,
python oracle, parallelism invariance."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.frontier import delay_compliance


def _oracle(log, delays, default):
    by = defaultdict(list)
    for h, ts in log:
        by[h].append(float(ts))
    d = dict(delays or [])
    out = {}
    for h, tss in by.items():
        tss.sort()
        req = d.get(h) if d.get(h) is not None else default
        gaps = [b - a for a, b in zip(tss, tss[1:])]
        viol = sum(1 for g in gaps if g < req)
        out[h] = (len(tss), req, min(gaps) if gaps else None, viol,
                  round(viol / len(gaps), 6) if gaps else None, viol == 0)
    return out


def _run(spark, log, delays, parts=None, **kw):
    f = spark.createDataFrame(log, "host string, fetch_ts double")
    d = (spark.createDataFrame(delays, "host string, crawl_delay double")
         if delays is not None else None)
    if parts:
        f = f.repartition(parts)
    return {r.host: (r.n_fetches, r.required_delay_s, r.min_gap_s,
                     r.n_violations, r.violation_rate, r.compliant)
            for r in delay_compliance(f, d, **kw).collect()}


def test_hand_cases(spark):
    log = (
        # compliant: gaps of exactly 5.0 against required 5.0
        [("ok.ex", 5.0 * i) for i in range(4)]
        # violator: one 2s gap among 5s gaps
        + [("bad.ex", 0.0), ("bad.ex", 5.0), ("bad.ex", 7.0),
           ("bad.ex", 12.0)]
        # same-second double fetch: gap 0 is a violation
        + [("dup.ex", 1.0), ("dup.ex", 1.0)]
        # host absent from the delay table -> default 1.0; gaps 2.0 ok
        + [("nodelay.ex", 0.0), ("nodelay.ex", 2.0)]
        # single fetch: no gaps, compliant, NULL min/rate
        + [("one.ex", 3.0)]
    )
    delays = [("ok.ex", 5.0), ("bad.ex", 5.0), ("dup.ex", 5.0)]
    got = _run(spark, log, delays, default_delay=1.0)
    assert got["ok.ex"] == (4, 5.0, 5.0, 0, 0.0, True)
    assert got["bad.ex"] == (4, 5.0, 2.0, 1, round(1 / 3, 6), False)
    assert got["dup.ex"] == (2, 5.0, 0.0, 1, 1.0, False)
    assert got["nodelay.ex"] == (2, 1.0, 2.0, 0, 0.0, True)
    assert got["one.ex"] == (1, 1.0, None, 0, None, True)


def test_no_delay_table(spark):
    log = [("a.ex", 0.0), ("a.ex", 0.5), ("a.ex", 2.0)]
    got = _run(spark, log, None, default_delay=1.0)
    assert got["a.ex"] == (3, 1.0, 0.5, 1, 0.5, False)


def test_matches_python_oracle_pseudorandom(spark):
    log = [("h%d.ex" % (i % 9), ((i * 7919) % 9973) / 7.0)
           for i in range(400)]
    delays = [("h%d.ex" % i, float(i % 4) + 0.5) for i in range(0, 9, 2)]
    exp = _oracle(log, delays, 2.0)
    got = _run(spark, log, delays, default_delay=2.0)
    assert got == exp


def test_parallelism_invariance(spark):
    log = [("h%d.ex" % (i % 5), float((i * 13) % 97)) for i in range(200)]
    delays = [("h0.ex", 3.0), ("h1.ex", 1.0)]
    assert (_run(spark, log, delays) == _run(spark, log, delays, parts=16))
