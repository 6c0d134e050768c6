"""Crawl-over-crawl diff (sources/cdxj.capture_diff) and link-rot
report (operators/links.link_rot) — hand-built fixtures covering every
classification class, plus plan-shape pins (one shuffle for the diff,
aggregate-before-join for link_rot)."""

from pyspark.sql import functions as F

from warcio_spark.operators.links import link_rot
from warcio_spark.sources.cdxj import capture_diff, capture_diff_summary

CAP_COLS = ["urlkey", "timestamp", "url", "digest"]

# urlkey u1: in both windows, digest changes (changed) — and the Feb
# window has TWO captures so latest-selection matters (D3 not D2).
# u2: both windows, same digest (unchanged). u3: Jan only (gone).
# u4: Feb only (added). u5: outside both windows entirely (absent).
# u6: both windows, NULL digests both sides (unchanged via null-safe eq).
CAPS = [
    ("com,a)/1", "20240105000000", "http://a/1?jan", "D1"),
    ("com,a)/1", "20240203000000", "http://a/1?feb1", "D2"),
    ("com,a)/1", "20240220000000", "http://a/1?feb2", "D3"),
    ("com,a)/2", "20240110000000", "http://a/2", "S"),
    ("com,a)/2", "20240210000000", "http://a/2", "S"),
    ("com,a)/3", "20240115000000", "http://a/3", "G"),
    ("com,a)/4", "20240215000000", "http://a/4", "N"),
    ("com,a)/5", "20231215000000", "http://a/5", "X"),
    ("com,a)/6", "20240120000000", "http://a/6", None),
    ("com,a)/6", "20240225000000", "http://a/6", None),
]

WIN_A = ("202401", "202401")
WIN_B = ("202402", "202402")


def test_capture_diff_classes(spark):
    idx = spark.createDataFrame(CAPS, CAP_COLS)
    out = {r.urlkey: r for r in
           capture_diff(idx, WIN_A, WIN_B).collect()}
    assert set(out) == {"com,a)/1", "com,a)/2", "com,a)/3",
                        "com,a)/4", "com,a)/6"}  # /5 outside windows
    r1 = out["com,a)/1"]
    assert r1.change == "changed"
    assert (r1.digest_a, r1.digest_b) == ("D1", "D3")  # latest of Feb
    assert (r1.ts_a, r1.ts_b) == ("20240105000000", "20240220000000")
    assert r1.url == "http://a/1?feb2"  # B-side url preferred
    assert (r1.n_captures_a, r1.n_captures_b) == (1, 2)
    assert out["com,a)/2"].change == "unchanged"
    r3 = out["com,a)/3"]
    assert r3.change == "gone"
    assert r3.url == "http://a/3"  # falls back to the A-side url
    assert r3.digest_b is None and r3.n_captures_b == 0
    assert out["com,a)/4"].change == "added"
    assert out["com,a)/6"].change == "unchanged"  # NULL == NULL


def test_capture_diff_summary(spark):
    idx = spark.createDataFrame(CAPS, CAP_COLS)
    s = {r.change: r for r in
         capture_diff_summary(capture_diff(idx, WIN_A, WIN_B)).collect()}
    assert s["changed"].n_urls == 1
    assert s["changed"].captures_b == 2
    assert s["unchanged"].n_urls == 2
    assert s["gone"].n_urls == 1 and s["added"].n_urls == 1


def test_capture_diff_single_shuffle(spark):
    """The scale contract: one Exchange (the urlkey hash aggregation),
    no join operator anywhere in the plan."""
    idx = spark.createDataFrame(CAPS, CAP_COLS)
    plan = (capture_diff(idx, WIN_A, WIN_B)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


LINKS = [
    ("http://s/1", "http://t/ok"),
    ("http://s/1", "http://t/404"),
    ("http://s/2", "http://t/ok"),
    ("http://s/2", "http://t/missing"),
    ("http://s/2", "http://t/nullstatus"),
    ("http://s/2", "http://t/dup"),
]

FETCHED = [
    ("http://t/ok", 200),
    ("http://t/404", 404),
    ("http://t/nullstatus", None),
    ("http://t/dup", 200),
    ("http://t/dup", 503),  # MAX collapse -> 503 -> broken
    ("http://t/unlinked", 200),  # fetched but never linked: not output
]


def test_link_rot_classes(spark):
    links = spark.createDataFrame(LINKS, ["src_url", "outlink"])
    fetched = spark.createDataFrame(FETCHED, "url string, status int")
    out = {r.url: r for r in link_rot(links, fetched).collect()}
    assert set(out) == {"http://t/ok", "http://t/404", "http://t/missing",
                        "http://t/nullstatus", "http://t/dup"}
    ok = out["http://t/ok"]
    assert ok.status_class == "ok" and ok.status == 200
    assert ok.n_refs == 2 and ok.n_referrers == 2
    assert out["http://t/404"].status_class == "broken"
    missing = out["http://t/missing"]
    assert missing.status_class == "uncrawled" and missing.status is None
    # a fetch row with NULL status is a failed fetch, not uncrawled
    assert out["http://t/nullstatus"].status_class == "broken"
    assert out["http://t/dup"].status_class == "broken"
    assert out["http://t/dup"].status == 503


def test_link_rot_aggregates_before_join(spark):
    """The join input carries one row per DISTINCT target: both
    aggregations sit below the join in the plan."""
    links = spark.createDataFrame(LINKS, ["src_url", "outlink"])
    fetched = spark.createDataFrame(FETCHED, "url string, status int")
    plan = (link_rot(links, fetched)
            ._jdf.queryExecution().optimizedPlan().toString())
    join_at = plan.index("Join")
    # both Aggregate operators appear BELOW (after, in toString order)
    # the join node — i.e. they are the join's children, not its parent
    assert plan.count("Aggregate") >= 2
    assert all(i > join_at for i in
               _indices(plan, "Aggregate")), plan


def _indices(s, needle):
    out, i = [], s.find(needle)
    while i != -1:
        out.append(i)
        i = s.find(needle, i + 1)
    return out
