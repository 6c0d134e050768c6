"""RFC 9111 freshness: http_date_epoch (IMF-fixdate -> UTC epoch),
freshness_lifetime precedence, freshness_table latest-wins, and
due_by_freshness. Date parsing is oracled against the stdlib
(email.utils.parsedate_to_datetime)."""

import email.utils as eut

from pyspark.sql import functions as F

from warcio_spark.plans.revalidate import (
    due_by_freshness,
    freshness_lifetime,
    freshness_table,
    http_date_epoch,
)

DATES = [
    "Sun, 06 Nov 1994 08:49:37 GMT",
    "Mon, 01 Jan 2024 00:00:00 GMT",
    "Fri, 29 Feb 2024 23:59:59 GMT",   # leap day
    "Tue, 31 Feb 2024 00:00:00 GMT",   # invalid calendar date -> NULL
    "Mon, 01 Foo 2024 00:00:00 GMT",   # unknown month -> NULL
    "Sunday, 06-Nov-94 08:49:37 GMT",  # rfc850 obsolete form -> NULL
    "Sun Nov  6 08:49:37 1994",        # asctime obsolete form -> NULL
    "  Sun, 06 Nov 1994 08:49:37 GMT ",  # trimmed
    "garbage",
]


def py_http_epoch(s):
    s = s.strip()
    # our contract: IMF-fixdate only
    import re
    if not re.match(r"^[A-Za-z]{3}, \d{2} [A-Za-z]{3} \d{4} "
                    r"\d{2}:\d{2}:\d{2} GMT$", s):
        return None
    try:
        return int(eut.parsedate_to_datetime(s).timestamp())
    except ValueError:
        return None


def test_http_date_epoch_vs_stdlib(spark):
    df = spark.createDataFrame([(s,) for s in DATES], ["s"])
    got = {r.s: r.e for r in
           df.select("s", http_date_epoch(F.col("s")).alias("e")).collect()}
    for s in DATES:
        assert got[s] == py_http_epoch(s), s
    assert got["Sun, 06 Nov 1994 08:49:37 GMT"] == 784111777


def _hdrs(*pairs):
    return [{"name": n, "value": v} for n, v in pairs]


LIFETIME_CASES = [
    # (headers, expected seconds)
    (_hdrs(("Cache-Control", "no-store"),
           ("Expires", "Mon, 01 Jan 2024 01:00:00 GMT"),
           ("Date", "Mon, 01 Jan 2024 00:00:00 GMT")), 0),
    (_hdrs(("Cache-Control", "private, no-cache")), 0),
    (_hdrs(("cache-control", "public, s-maxage=600, max-age=60")), 600),
    (_hdrs(("Cache-Control", "max-age=3600")), 3600),
    (_hdrs(("Cache-Control", 'max-age="120"')), 120),
    # Expires - Date
    (_hdrs(("Expires", "Mon, 01 Jan 2024 02:30:00 GMT"),
           ("Date", "Mon, 01 Jan 2024 00:00:00 GMT")), 9000),
    # Expires before Date: clamped to 0
    (_hdrs(("Expires", "Sun, 31 Dec 2023 00:00:00 GMT"),
           ("Date", "Mon, 01 Jan 2024 00:00:00 GMT")), 0),
    # invalid Expires: already stale
    (_hdrs(("Expires", "0"),
           ("Date", "Mon, 01 Jan 2024 00:00:00 GMT")), 0),
    # Expires present, Date missing: ungrounded -> 0
    (_hdrs(("Expires", "Mon, 01 Jan 2024 02:00:00 GMT")), 0),
    # heuristic: 10% of Date - Last-Modified (10 days -> 1 day)
    (_hdrs(("Date", "Thu, 11 Jan 2024 00:00:00 GMT"),
           ("Last-Modified", "Mon, 01 Jan 2024 00:00:00 GMT")), 86400),
    # Last-Modified in the future: clamped to 0
    (_hdrs(("Date", "Mon, 01 Jan 2024 00:00:00 GMT"),
           ("Last-Modified", "Thu, 11 Jan 2024 00:00:00 GMT")), 0),
    # no signal at all -> NULL
    (_hdrs(("Content-Type", "text/html")), None),
    # max-age wins over Expires AND heuristic
    (_hdrs(("Cache-Control", "max-age=5"),
           ("Expires", "Mon, 01 Jan 2024 02:00:00 GMT"),
           ("Date", "Mon, 01 Jan 2024 00:00:00 GMT"),
           ("Last-Modified", "Sat, 01 Jan 2022 00:00:00 GMT")), 5),
]


def test_freshness_lifetime_precedence(spark):
    rows = [(i, h) for i, (h, _) in enumerate(LIFETIME_CASES)]
    df = spark.createDataFrame(
        rows, "i int, http_headers array<struct<name:string,value:string>>")
    got = {r.i: r.life for r in
           df.select("i", freshness_lifetime("http_headers").alias("life"))
           .collect()}
    for i, (_, want) in enumerate(LIFETIME_CASES):
        assert got[i] == want, (i, LIFETIME_CASES[i][0], got[i])


def test_freshness_table_latest_wins_and_due(spark):
    # url A: old capture max-age=10, NEW capture max-age=1000
    # url B: single capture, no signal
    rows = [
        ("response", "http://a/", "20240101000000",
         _hdrs(("Cache-Control", "max-age=10"))),
        ("response", "http://a/", "20240102000000",
         _hdrs(("Cache-Control", "max-age=1000"))),
        ("response", "http://b/", "20240101000000",
         _hdrs(("Content-Type", "text/plain"))),
        ("request", "http://c/", "20240103000000",
         _hdrs(("Cache-Control", "max-age=1"))),  # not a response: ignored
    ]
    df = spark.createDataFrame(
        rows, "rec_type string, url string, warc_ts string, "
              "http_headers array<struct<name:string,value:string>>")
    ft = freshness_table(df)
    got = {r.url: r for r in ft.collect()}
    assert set(got) == {"http://a/", "http://b/"}
    a = got["http://a/"]
    epoch_0102 = 1704153600  # 2024-01-02T00:00:00Z
    assert a.last_fetch_ts == "20240102000000"
    assert a.lifetime_s == 1000 and a.stale_at == epoch_0102 + 1000
    b = got["http://b/"]
    assert b.lifetime_s is None and b.stale_at is None

    # at 500s past A's capture: A fresh (1000s), B due via default ttl 100
    due = due_by_freshness(ft, epoch_0102 + 500, default_ttl_s=100)
    assert [r.url for r in due.collect()] == ["http://b/"]
    # at 2000s past: both due
    due2 = due_by_freshness(ft, epoch_0102 + 2000, default_ttl_s=100)
    assert sorted(r.url for r in due2.collect()) == [
        "http://a/", "http://b/"]
