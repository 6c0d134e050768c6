"""Revisit-interval merge (plans/revalidate.recrawl_priors): changefreq
prior mapping, observed-wins override, multi-sitemap reduction,
no-observed operation, python oracle, parallelism invariance."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.revalidate import CHANGEFREQ_PRIOR_DAYS, recrawl_priors


def _oracle(entries, observed):
    by = defaultdict(list)
    for url, cf, pr in entries:
        by[url].append((cf, pr))
    obs = dict(observed or [])
    out = {}
    for url, rows in by.items():
        keyed = sorted(
            (CHANGEFREQ_PRIOR_DAYS.get(cf, 1e18) if cf else 1e18,
             cf if cf is not None else "~") for cf, _ in rows)
        cf = keyed[0][1]
        cf = None if cf == "~" else cf
        pris = [p for _, p in rows if p is not None]
        prior = min((CHANGEFREQ_PRIOR_DAYS[c] for c, _ in rows
                     if c in CHANGEFREQ_PRIOR_DAYS), default=None)
        o = obs.get(url)
        eff = o if o is not None else prior
        src = ("observed" if o is not None
               else "sitemap" if prior is not None else None)
        out[url] = (cf, max(pris) if pris else None, prior, o, eff, src)
    return out


def _run(spark, entries, observed, parts=None):
    e = spark.createDataFrame(
        entries, "loc string, changefreq string, priority double")
    o = None
    if observed is not None:
        o = spark.createDataFrame(
            observed, "urlkey string, est_interval_days double")
    if parts:
        e = e.repartition(parts)
    return {r.url: (r.changefreq, r.priority, r.prior_interval_days,
                    r.observed_interval_days, r.effective_interval_days,
                    r.interval_source)
            for r in recrawl_priors(e, o).collect()}


def test_hand_cases(spark):
    entries = [
        ("http://a/", "daily", 0.5),
        ("http://a/", "weekly", 0.9),     # daily wins, priority 0.9 wins
        ("http://b/", "never", None),      # claim carried, no prior
        ("http://c/", None, 0.3),          # no claim at all
        ("http://d/", "hourly", 0.1),
    ]
    observed = [("http://a/", 3.25), ("http://c/", 12.0)]
    got = _run(spark, entries, observed)
    assert got["http://a/"] == ("daily", 0.9, 1.0, 3.25, 3.25, "observed")
    assert got["http://b/"] == ("never", None, None, None, None, None)
    assert got["http://c/"] == (None, 0.3, None, 12.0, 12.0, "observed")
    assert got["http://d/"] == ("hourly", 0.1, 1.0 / 24, None, 1.0 / 24,
                                "sitemap")


def test_without_observed(spark):
    entries = [("http://a/", "monthly", 0.2)]
    got = _run(spark, entries, None)
    assert got["http://a/"] == ("monthly", 0.2, 30.0, None, 30.0, "sitemap")


def test_matches_python_oracle_pseudorandom(spark):
    freqs = [None, "always", "hourly", "daily", "weekly", "monthly",
             "yearly", "never"]
    entries = [("http://u%d/" % (i % 29), freqs[(i * 3) % 8],
                None if i % 7 == 0 else round((i % 10) / 10, 1))
               for i in range(300)]
    observed = [("http://u%d/" % i, float(i) + 0.5)
                for i in range(0, 29, 3)]
    assert _run(spark, entries, observed) == _oracle(entries, observed)


def test_parallelism_invariance(spark):
    entries = [("http://u%d/" % (i % 11), "daily" if i % 2 else "weekly",
                (i % 5) / 10) for i in range(200)]
    observed = [("http://u%d/" % i, 2.0) for i in range(0, 11, 2)]
    assert (_run(spark, entries, observed)
            == _run(spark, entries, observed, parts=16))
