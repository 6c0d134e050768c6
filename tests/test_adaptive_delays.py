"""Latency-adaptive politeness (plans/frontier.adaptive_crawl_delays)
against hand-computed per-host expectations."""

from warcio_spark.plans.frontier import adaptive_crawl_delays

LOG = [
    # fast host: p50=0.1 -> base 0.3 -> clamped up to min 1.0
    ("fast", 0.1, 200), ("fast", 0.1, 200), ("fast", 0.1, 200),
    # slow host: even count, interpolated p50=(2.0+4.0)/2=3.0 -> 9.0
    ("slow", 1.0, 200), ("slow", 2.0, 200),
    ("slow", 4.0, 200), ("slow", 9.0, 200),
    # monster host: 20s median -> 60 -> clamped to 30
    ("monster", 20.0, 200),
    # throttled host: p50=1.0 -> base 3.0, 2/4 throttle > 0.1 -> 6.0
    ("throttled", 1.0, 429), ("throttled", 1.0, 200),
    ("throttled", 1.0, 503), ("throttled", 1.0, 200),
    # throttled AND slow: base clamps to 30, penalty must NOT exceed it
    ("hotslow", 15.0, 429), ("hotslow", 15.0, 429),
    # no latency data at all: p50 NULL -> min_delay base (but its 503
    # share still applies the throttle penalty on top)
    ("dark", None, 200), ("dark", None, 503),
]


def test_adaptive_delays(spark):
    log = spark.createDataFrame(
        LOG, "host string, latency_s double, status int")
    got = {r.host: r for r in adaptive_crawl_delays(log).collect()}

    assert got["fast"].crawl_delay == 1.0  # min clamp
    assert got["slow"].p50_latency == 3.0  # interpolated even-count p50
    assert got["slow"].crawl_delay == 9.0
    assert got["monster"].crawl_delay == 30.0  # max clamp
    t = got["throttled"]
    assert t.throttle_rate == 0.5 and t.crawl_delay == 6.0
    assert got["hotslow"].crawl_delay == 30.0  # penalty re-clamped
    d = got["dark"]
    assert d.p50_latency is None and d.throttle_rate == 0.5
    assert d.crawl_delay == 2.0  # min_delay base x throttle penalty
    assert all(r.n_fetches > 0 for r in got.values())


def test_adaptive_delays_feed_politeness_budget(spark):
    """The output crawl_delay column composes with PolitenessConfig's
    budget expression (the slot-scheduling consumer)."""
    from pyspark.sql import functions as F

    from warcio_spark.plans.frontier import PolitenessConfig

    log = spark.createDataFrame(
        LOG, "host string, latency_s double, status int")
    cfg = PolitenessConfig(slot_seconds=60)
    out = adaptive_crawl_delays(log).select(
        "host", cfg.budget_expr(F.col("crawl_delay")).alias("budget"))
    budgets = {r.host: r.budget for r in out.collect()}
    assert budgets["fast"] == 60   # 60s slot / 1s delay
    assert budgets["slow"] == 6    # 60 / 9 -> floor
    assert budgets["monster"] == 2  # 60 / 30
