"""CDX-server query API (sources/cdxj.cdx_query) — pywb / IA Wayback
CDX Server semantics over the typed capture index: matchType, from/to
padding, anchored field filters, adjacency collapse, limit/reverse."""

import contextlib
import io

from warcio_spark.sources.cdxj import cdx_query

COLS = ["urlkey", "timestamp", "url", "mime", "status", "digest"]

INDEX = [
    ("com,example)/", "20240101000000", "http://example.com/",
     "text/html", 200, "AAA"),
    ("com,example)/", "20240315120000", "http://example.com/",
     "text/html", 200, "AAA"),
    ("com,example)/", "20240630235959", "http://example.com/",
     "text/html", 301, "BBB"),
    ("com,example)/", "20240701000000", "http://example.com/",
     "text/html", 200, "AAA"),
    ("com,example)/page", "20240201000000", "http://example.com/page",
     "application/pdf", 200, "CCC"),
    ("com,example,sub)/", "20240401000000", "http://sub.example.com/",
     "text/html", 200, "DDD"),
    ("com,other)/", "20230101000000", "http://other.com/",
     "text/html", None, "EEE"),
    ("org,example)/", "20250101000000", "http://example.org/",
     "text/html", 404, "FFF"),
]


def _idx(spark):
    return spark.createDataFrame(INDEX, COLS)


def keys(df):
    return sorted((r.urlkey, r.timestamp) for r in df.collect())


def test_match_types(spark):
    idx = _idx(spark)
    exact = cdx_query(idx, url="http://example.com/", match_type="exact")
    assert {r.urlkey for r in exact.collect()} == {"com,example)/"}
    assert exact.count() == 4

    prefix = cdx_query(idx, url="http://example.com/", match_type="prefix")
    assert {r.urlkey for r in prefix.collect()} == {
        "com,example)/", "com,example)/page"}

    host = cdx_query(idx, url="http://www.Example.COM:80/zzz",
                     match_type="host")
    assert {r.urlkey for r in host.collect()} == {
        "com,example)/", "com,example)/page"}  # NOT the subdomain

    dom = cdx_query(idx, url="http://example.com/", match_type="domain")
    assert {r.urlkey for r in dom.collect()} == {
        "com,example)/", "com,example)/page", "com,example,sub)/"}
    # org,example is a different TLD: never matched by the domain key


def test_from_to_prefix_padding(spark):
    idx = _idx(spark)
    got = cdx_query(idx, from_ts="2024", to_ts="2024")
    assert all(r.timestamp.startswith("2024") for r in got.collect())
    assert got.count() == 6
    # to=202406 pads UP to 20240630235959 — the last-second capture is IN
    got = cdx_query(idx, url="http://example.com/", match_type="exact",
                    from_ts="202403", to_ts="202406")
    assert keys(got) == [("com,example)/", "20240315120000"),
                         ("com,example)/", "20240630235959")]


def test_filters_anchored_and_negated(spark):
    idx = _idx(spark)
    ok = cdx_query(idx, filters=["status:200"])
    assert all(r.status == 200 for r in ok.collect())
    assert ok.count() == 5
    # anchored full match: '20' must not match 200
    assert cdx_query(idx, filters=["status:20"]).count() == 0
    neg = cdx_query(idx, filters=["!status:200"])
    # NULL status never matches, negated or not (3-valued logic)
    assert {r.status for r in neg.collect()} == {301, 404}
    rx = cdx_query(idx, filters=["mime:text/.*", "status:2.."])
    assert rx.count() == 4


def test_collapse_adjacency_keeps_nonadjacent_recurrence(spark):
    idx = _idx(spark)
    got = cdx_query(idx, url="http://example.com/", match_type="exact",
                    collapse="digest")
    # digests in ts order: AAA AAA BBB AAA -> adjacent dup dropped,
    # the non-adjacent AAA recurrence after BBB is KEPT
    assert keys(got) == [("com,example)/", "20240101000000"),
                         ("com,example)/", "20240630235959"),
                         ("com,example)/", "20240701000000")]


def test_collapse_timestamp_prefix_and_reverse(spark):
    idx = _idx(spark)
    got = cdx_query(idx, url="http://example.com/", match_type="exact",
                    collapse="timestamp:4", reverse=True)
    # yearly collapse in DESC order keeps only the NEWEST 2024 capture
    assert keys(got) == [("com,example)/", "20240701000000")]


def test_limit_reverse_global_order(spark):
    idx = _idx(spark)
    got = cdx_query(idx, limit=3, reverse=True).collect()
    assert [(r.urlkey, r.timestamp) for r in got] == [
        ("com,example)/", "20240701000000"),
        ("com,example)/", "20240630235959"),
        ("com,example)/", "20240315120000"),
    ]
    plain = cdx_query(idx, limit=2).collect()
    assert [(r.urlkey, r.timestamp) for r in plain] == [
        ("com,example)/", "20240101000000"),
        ("com,example)/", "20240315120000"),
    ]


def test_fields_projection(spark):
    got = cdx_query(_idx(spark), fields=["urlkey", "status"])
    assert got.columns == ["urlkey", "status"]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_plan_shapes(spark):
    idx = _idx(spark)
    # match + time + filter only: shuffle-free
    p = _plan(cdx_query(idx, url="http://example.com/",
                        match_type="prefix", from_ts="2024",
                        filters=["status:200"]))
    assert "Exchange" not in p
    # collapse: exactly one hash exchange, on urlkey
    p = _plan(cdx_query(idx, collapse="digest"))
    assert p.count("hashpartitioning(urlkey") == 1
    # limit compiles to TakeOrderedAndProject, not a global sort
    p = _plan(cdx_query(idx, limit=5))
    assert "TakeOrderedAndProject" in p
