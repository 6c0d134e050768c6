"""Retry/backoff scheduling (plans/retry.py) vs a direct Python oracle,
plus hand-checked edge cases and composition with the crawl seed path.
"""

import pyspark.sql.functions as F
import pytest

from warcio_spark.plans.retry import retry_due, retry_report, status_class


def _py_oracle(log, as_of, max_attempts=4, base=2):
    def cls(s):
        if 200 <= s < 400:
            return "success"
        if s <= 0 or s in (408, 429) or 500 <= s < 600:
            return "retryable"
        return "permanent"

    by_url = {}
    for url, rnd, st in log:
        by_url.setdefault(url, []).append((rnd, cls(st)))
    out = {}
    for url, rows in by_url.items():
        rows.sort()
        last_round, last_class = rows[-1]
        succ = [r for r, c in rows if c == "success"]
        ls = max(succ) if succ else None
        n_fail = sum(
            1 for r, c in rows
            if c == "retryable" and (ls is None or r > ls)
        )
        nd = (
            last_round + min(base ** min(n_fail - 1, 30), 1024)
            if last_class == "retryable"
            else None
        )
        due = nd is not None and n_fail < max_attempts and as_of >= nd
        out[url] = (last_round, last_class, n_fail, nd, due)
    return out


LOG = [
    # plain transient failure, first retry due next round
    ("a", 10, 503),
    # two consecutive failures: backoff 2 -> due at 13
    ("b", 10, 500), ("b", 11, 502),
    # failed then succeeded: retry life over
    ("c", 1, 503), ("c", 2, 200),
    # succeeded then failed again: counter restarts at 1
    ("d", 1, 503), ("d", 2, 200), ("d", 5, 504),
    # permanent latest: dropped
    ("e", 3, 503), ("e", 4, 404),
    # exhausted: 4 retryable failures >= max_attempts
    ("f", 1, 500), ("f", 2, 500), ("f", 4, 500), ("f", 8, 500),
    # network-level failure convention
    ("g", 9, 0),
    # throttle statuses are retryable
    ("h", 9, 429), ("i", 9, 408),
    # success only
    ("j", 7, 301),
]


@pytest.fixture(scope="module")
def log_df(spark):
    return spark.createDataFrame(LOG, ["url_canon", "round", "status"])


@pytest.mark.parametrize("as_of", [10, 11, 13, 40])
def test_report_matches_python_oracle(log_df, spark, as_of):
    want = _py_oracle(LOG, as_of)
    got = {
        r["url_canon"]: (
            r["last_round"], r["last_class"], r["n_failures"],
            r["next_due_round"], r["due"],
        )
        for r in retry_report(log_df, as_of).collect()
    }
    assert got == want


def test_edge_semantics(log_df, spark):
    rep = {
        r["url_canon"]: r.asDict()
        for r in retry_report(log_df, 11).collect()
    }
    assert rep["a"]["due"] and rep["a"]["next_due_round"] == 11
    assert rep["b"]["next_due_round"] == 13 and not rep["b"]["due"]
    assert rep["c"]["last_class"] == "success" and not rep["c"]["due"]
    assert rep["d"]["n_failures"] == 1  # restarted after the success
    assert rep["d"]["next_due_round"] == 6 and rep["d"]["due"]
    assert rep["e"]["last_class"] == "permanent"
    assert rep["e"]["next_due_round"] is None and not rep["e"]["due"]
    assert rep["f"]["n_failures"] == 4 and not rep["f"]["due"]  # exhausted
    for u in ("g", "h", "i"):
        assert rep[u]["last_class"] == "retryable", u
    assert not rep["j"]["due"]


def test_due_set_and_backoff_progression(log_df, spark):
    due = lambda t: {
        r["url_canon"] for r in retry_due(log_df, t).collect()
    }
    assert due(10) == {"d", "g", "h", "i"}  # a due at 11, b at 13
    assert due(11) == {"a", "d", "g", "h", "i"}
    assert due(13) == {"a", "b", "d", "g", "h", "i"}
    # f never becomes due (exhausted), c/e/j never (ended)
    assert "f" not in due(10**6)


def test_status_class_expression(spark):
    rows = spark.range(1).select(
        status_class(F.lit(200)).alias("a"),
        status_class(F.lit(399)).alias("b"),
        status_class(F.lit(404)).alias("c"),
        status_class(F.lit(503)).alias("d"),
        status_class(F.lit(-1)).alias("e"),
    ).first()
    assert tuple(rows) == (
        "success", "success", "permanent", "retryable", "retryable"
    )


def test_backoff_cap(spark):
    log = [("x", r, 500) for r in range(40)]  # 40 consecutive failures
    df = spark.createDataFrame(log, ["url_canon", "round", "status"])
    r = retry_report(df, 10**6, max_attempts=100).first()
    assert r["n_failures"] == 40
    assert r["next_due_round"] == 39 + 1024  # capped, no overflow
    r2 = retry_report(df, 10**6, max_attempts=100, max_backoff=64).first()
    assert r2["next_due_round"] == 39 + 64


def test_due_rows_reenter_frontier(log_df, spark):
    """Composition: due urls re-enter the normal candidate path."""
    from warcio_spark.plans.frontier import with_frontier_keys

    due = retry_due(log_df, 11).select(
        F.concat(
            F.lit("http://retry.example.com/"), F.col("url_canon")
        ).alias("url"),
        F.lit(80.0).alias("priority"),
        F.col("n_failures").cast("long").alias("seq"),
    )
    keyed = with_frontier_keys(due)
    assert keyed.count() == 5
    assert "url_hash" in keyed.columns and "host" in keyed.columns


def test_retry_after_seconds(spark):
    """RFC 9110 Retry-After: delta-seconds and HTTP-date forms, clamping,
    absent/garbage -> NULL — vs email.utils as the date oracle."""
    import email.utils

    fetch_epoch = 1_700_000_000  # 2023-11-14 22:13:20 UTC
    date_future = email.utils.formatdate(fetch_epoch + 7200, usegmt=True)
    date_past = email.utils.formatdate(fetch_epoch - 500, usegmt=True)
    rows = [
        (0, [("Retry-After", "120")], 120),
        (1, [("retry-after", "  0 ")], 0),
        (2, [("Retry-After", date_future)], 7200),
        (3, [("Retry-After", date_past)], 0),       # past date clamps to 0
        (4, [("Retry-After", "soonish")], None),    # garbage
        (5, [("Server", "x")], None),               # absent
        (6, [("Retry-After", "-5")], None),         # negative not in grammar
    ]
    from warcio_spark.plans.retry import retry_after_seconds

    data = [
        (i, [{"name": n, "value": v} for n, v in hs])
        for i, hs, _ in rows
    ]
    df = spark.createDataFrame(
        data, "i int, headers array<struct<name:string,value:string>>")
    got = {r.i: r.s for r in df.select(
        "i", retry_after_seconds(
            "headers", F.lit(fetch_epoch)).alias("s")).collect()}
    for i, _, want in rows:
        assert got[i] == want, i


def test_retry_report_honors_server_delay(spark):
    """A 429's Retry-After (in rounds) floors the exponential backoff:
    the crawler may wait longer than asked, never less."""
    log = [
        # one failure, backoff would be +1, server asked 5 rounds
        ("a", 10, 429, 5),
        # three failures (backoff 4), latest server wish only 2 -> backoff
        ("b", 10, 500, None), ("b", 11, 500, None), ("b", 12, 503, 2),
        # delay rides ONLY the latest attempt: older wish ignored
        ("c", 10, 429, 9), ("c", 11, 503, None),
    ]
    df = spark.createDataFrame(
        log, "url_canon string, round long, status int, sd long")
    rep = {r.url_canon: (r.n_failures, r.next_due_round)
           for r in retry_report(df, 20, server_delay_col="sd").collect()}
    assert rep["a"] == (1, 15)   # max(1, 5)
    assert rep["b"] == (3, 16)   # max(4, 2)
    assert rep["c"] == (2, 13)   # max(2, 0-for-None)
    # without the column: pure backoff
    rep0 = {r.url_canon: r.next_due_round
            for r in retry_report(df.drop("sd"), 20).collect()}
    assert rep0["a"] == 11 and rep0["b"] == 16 and rep0["c"] == 13
