"""closest_captures — pywb CDX-server ``sort=closest`` replay-lookup
semantics (reference ecosystem: pywb cdx server query API; reference
analog /root/reference's indexes feed such lookups), checked against a
brute-force python oracle plus plan-shape assertions."""

import contextlib
import io
from datetime import datetime

import pytest

from warcio_spark.sources.cdxj import closest_captures, pad_ts14

CAPS = [
    # urlkey, ts14, url
    ("com,example)/", "20240101000000", "http://example.com/"),
    ("com,example)/", "20240601120000", "http://example.com/"),
    ("com,example)/", "20241231235959", "http://example.com/"),
    ("com,example)/a", "20240301000000", "http://example.com/a"),
    ("com,example)/a", "20240302000000", "http://example.com/a"),
    ("com,other)/", "20240701000000", "http://other.com/"),
    # malformed timestamp: never chosen
    ("com,example)/", "2024xx01", "http://example.com/"),
]


@pytest.fixture()
def index(spark):
    return spark.createDataFrame(CAPS, ["urlkey", "timestamp", "url"])


def _epoch(ts14):
    pad = "19700101000000"
    full = ts14 + pad[len(ts14):]
    try:
        return datetime.strptime(full, "%Y%m%d%H%M%S").timestamp()
    except ValueError:
        return None


def brute_closest(urlkey, req_ts, k):
    req = _epoch(req_ts)
    cands = []
    for uk, ts, url in CAPS:
        ep = _epoch(ts)
        if uk == urlkey and ep is not None:
            cands.append((abs(ep - req), ts, url))
    cands.sort()
    return cands[:k]


@pytest.mark.parametrize("req_ts,k", [
    ("20240530000000", 1),
    ("20240530000000", 3),
    ("20240101000001", 1),
    ("2024", 2),            # short request pads down to Jan 1 (pywb PAD_14_DOWN)
    ("202407", 1),
])
def test_matches_brute_force(spark, index, req_ts, k):
    reqs = spark.createDataFrame(
        [("com,example)/", req_ts)], ["urlkey", "req_ts"])
    got = (closest_captures(index, reqs, k=k)
           .orderBy("closest_rank")
           .select("timestamp", "url", "ts_diff_s", "closest_rank")
           .collect())
    want = brute_closest("com,example)/", req_ts, k)
    assert [(r.timestamp, r.url) for r in got] == [(t, u) for _, t, u in want]
    assert [r.ts_diff_s for r in got] == [int(d) for d, _, _ in want]
    assert [r.closest_rank for r in got] == list(range(1, len(want) + 1))


def test_exact_distance_tie_goes_to_earlier_capture(spark):
    idx = spark.createDataFrame(
        [("k)/", "20240101000000", "u"), ("k)/", "20240103000000", "u")],
        ["urlkey", "timestamp", "url"])
    reqs = spark.createDataFrame([("k)/", "20240102000000")],
                                 ["urlkey", "req_ts"])
    got = closest_captures(idx, reqs, k=1).collect()
    assert len(got) == 1 and got[0].timestamp == "20240101000000"


def test_multiple_requests_independent(spark, index):
    reqs = spark.createDataFrame(
        [("com,example)/", "20240601120000"),
         ("com,example)/a", "20240302000000"),
         ("com,other)/", "19990101000000"),
         ("com,missing)/", "20240101000000")],
        ["urlkey", "req_ts"])
    got = {(r.urlkey, r.req_ts): r.timestamp
           for r in closest_captures(index, reqs, k=1).collect()}
    assert got == {
        ("com,example)/", "20240601120000"): "20240601120000",
        ("com,example)/a", "20240302000000"): "20240302000000",
        ("com,other)/", "19990101000000"): "20240701000000",
    }


def test_malformed_capture_ts_never_chosen(spark, index):
    # request dead-on the malformed stamp's pad-down value
    reqs = spark.createDataFrame([("com,example)/", "20240101000000")],
                                 ["urlkey", "req_ts"])
    rows = closest_captures(index, reqs, k=10).collect()
    assert all(r.timestamp != "2024xx01" for r in rows)
    assert len(rows) == 3


def test_pad_ts14_is_pywb_template_fill(spark):
    import pyspark.sql.functions as F
    df = spark.range(1).select(
        pad_ts14(F.lit("2024")).alias("a"),
        pad_ts14(F.lit("20240615")).alias("b"),
        pad_ts14(F.lit("20240615123456")).alias("c"))
    r = df.collect()[0]
    assert (r.a, r.b, r.c) == (
        "20240101000000", "20240615000000", "20240615123456")


def test_plan_broadcast_join_and_group_limit(spark, index):
    reqs = spark.createDataFrame([("com,example)/", "20240601")],
                                 ["urlkey", "req_ts"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        closest_captures(index, reqs, k=1).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
