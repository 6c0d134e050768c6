"""RFC 7089 TimeMap generation (operators/indexer.timemap_links) — the
Memento link-format surface pywb serves from CDX data."""


from warcio_spark.operators.indexer import timemap_links

CAPS = [
    ("com,example)/", "20240101000000", "http://example.com/"),
    ("com,example)/", "20240601120000", "https://example.com/"),
    ("com,example)/", "20241231235959", "http://example.com/"),
    ("com,single)/", "20240701000000", "http://single.com/"),
    ("com,bad)/", "2024xx", "http://bad.com/"),  # unparseable ts: dropped
]


def test_timemap_lines_exact(spark):
    idx = spark.createDataFrame(CAPS, ["urlkey", "timestamp", "url"])
    got = {}
    for r in timemap_links(idx, replay_prefix="/web/").collect():
        got.setdefault(r.urlkey, {})[r.pos] = r.line
    assert set(got) == {"com,example)/", "com,single)/"}

    ex = got["com,example)/"]
    assert ex[0] == '<http://example.com/>; rel="original",'
    assert ex[1] == ('</web/20240101000000/http://example.com/>; '
                     'rel="first memento"; '
                     'datetime="Mon, 01 Jan 2024 00:00:00 GMT",')
    assert ex[2] == ('</web/20240601120000/https://example.com/>; '
                     'rel="memento"; '
                     'datetime="Sat, 01 Jun 2024 12:00:00 GMT",')
    # final memento: 'last' flag and NO trailing comma
    assert ex[3] == ('</web/20241231235959/http://example.com/>; '
                     'rel="last memento"; '
                     'datetime="Tue, 31 Dec 2024 23:59:59 GMT"')

    single = got["com,single)/"]
    assert single[0] == '<http://single.com/>; rel="original",'
    # RFC 7089 §2.2.2: a sole memento is both first and last
    assert single[1] == ('</web/20240701000000/http://single.com/>; '
                         'rel="first last memento"; '
                         'datetime="Mon, 01 Jul 2024 00:00:00 GMT"')


def test_timemap_single_window_plan(spark):
    import contextlib
    import io

    idx = spark.createDataFrame(CAPS, ["urlkey", "timestamp", "url"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        timemap_links(idx).explain("formatted")
    plan = buf.getvalue()
    # one shuffle on urlkey feeding the window; no join in the plan
    assert plan.count("Exchange hashpartitioning(urlkey") <= 2  # union reuses
    assert "Join" not in plan
