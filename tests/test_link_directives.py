"""Link-level and page-level indexing directives (operators/links):
rel=nofollow/ugc/sponsored on anchors, <meta name=robots> +
X-Robots-Tag, rel=canonical — pinned against hand-built html, an
independent html.parser oracle, and extract_outlinks parity."""

from html.parser import HTMLParser

from pyspark.sql import functions as F

from warcio_spark.operators.links import (
    canonical_link,
    extract_outlink_directives,
    extract_outlinks,
    link_rel_structs,
    robots_directives,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, ["page_url", "text"])


def _directives(spark, url, html):
    df = _rows(spark, [(url, html)]).select(
        F.explode(link_rel_structs(F.col("page_url"), F.col("text"))).alias("e")
    ).select("e.*")
    return [r.asDict() for r in df.collect()]


def test_link_rel_variants(spark):
    html = (
        '<a href="/a" rel="nofollow">1</a>'
        "<a href='/b' rel='UGC sponsored'>2</a>"
        '<a href=/c rel=NoFollow>3</a>'
        '<a href="/d">4</a>'
        '<a href="/e" rel="nofollowme">5</a>'
        '<a rel="nofollow">no href</a>'
        '<a href="/f" rel="external nofollow noopener">6</a>'
    )
    got = _directives(spark, "http://h.example.com/p/", html)
    by_url = {r["url"]: r for r in got}
    assert set(by_url) == {
        "http://h.example.com%s" % p for p in ("/a", "/b", "/c", "/d", "/e", "/f")
    }
    nf = {u[-2:]: r["nofollow"] for u, r in by_url.items()}
    assert nf == {"/a": True, "/b": False, "/c": True, "/d": False,
                  "/e": False, "/f": True}
    b = by_url["http://h.example.com/b"]
    assert b["ugc"] and b["sponsored"] and not b["nofollow"]
    # pos counts ALL anchor-with-attribute tags pre-href-filter: the
    # href-less anchor occupies position 5
    assert by_url["http://h.example.com/f"]["pos"] == 6


class _RelOracle(HTMLParser):
    def __init__(self):
        super().__init__()
        self.out = []

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        d = dict(attrs)
        href = (d.get("href") or "").split("#")[0].strip()
        if href:
            rel = (d.get("rel") or "").lower().split()
            self.out.append((href, "nofollow" in rel))


def _corpus(spark, n=120):
    d = F.col("id")
    s = lambda x: x.cast("string")  # noqa: E731
    rel = F.element_at(
        F.array(F.lit(""), F.lit(' rel="nofollow"'), F.lit(" rel=ugc"),
                F.lit(" rel='sponsored nofollow'"),
                F.lit(' rel="me external"')),
        (d % 5 + 1).cast("int"))
    html = F.concat(
        F.lit('<a href="http://peer'), s(d % 7),
        F.lit('.example.org/x.html"'), rel, F.lit(">t</a> "),
        F.lit("<a href='/r"), s(d % 3), F.lit("'"),
        F.when(d % 2 == 0, F.lit(' rel="nofollow"')).otherwise(F.lit("")),
        F.lit(">u</a> "),
        F.when(d % 4 == 0, F.lit('<a href=#frag rel=nofollow>v</a>')
               ).otherwise(F.lit("")),
    )
    return spark.range(n).select(
        F.concat(F.lit("http://h"), s(d % 11), F.lit(".example.com/d/p"),
                 s(d), F.lit(".html")).alias("page_url"),
        html.alias("text"),
    )


def test_html_parser_oracle_and_outlinks_parity(spark):
    pages = _corpus(spark)
    got = extract_outlink_directives(pages, text_col="text")
    rows = got.select("src_url", "href", "outlink", "nofollow").collect()
    by_page = {}
    for r in rows:
        by_page.setdefault(r.src_url, []).append((r.href, r.nofollow))
    for page in pages.collect():
        o = _RelOracle()
        o.feed(page.text)
        assert sorted(by_page.get(page.page_url, [])) == sorted(o.out), \
            page.page_url
    # resolved-url parity with the production extractor on the same corpus
    a = sorted(map(tuple, got.select("src_url", "outlink").collect()))
    b = sorted(map(tuple, extract_outlinks(
        pages, text_col="text").select("src_url", "outlink").collect()))
    assert a == b and a


def _robots(spark, html, headers=None):
    df = _rows(spark, [("http://h.example.com/", html)])
    hcol = None
    if headers is not None:
        hcol = F.array(*[
            F.struct(F.lit(n).alias("name"), F.lit(v).alias("value"))
            for n, v in headers
        ])
    return df.select(
        robots_directives(F.col("text"), hcol).alias("d")
    ).collect()[0].d.asDict()


def test_robots_directives_meta(spark):
    assert _robots(spark, '<head><meta name="robots" '
                          'content="noindex, nofollow"></head>x') == \
        {"noindex": True, "nofollow": True, "noarchive": False}
    # 'none' alias, case-insensitive name and content
    assert _robots(spark, "<head><meta NAME=ROBOTS content=NONE></head>") == \
        {"noindex": True, "nofollow": True, "noarchive": False}
    # additive across several metas
    assert _robots(spark, '<head><meta name=robots content=noarchive>'
                          '<meta name="robots" content="noindex"></head>') == \
        {"noindex": True, "nofollow": False, "noarchive": True}
    # a meta AFTER </head> does not count; other names never count
    assert _robots(spark, '<head></head><meta name=robots content=noindex>') \
        == {"noindex": False, "nofollow": False, "noarchive": False}
    assert _robots(spark, '<head><meta name=viewport content=noindex>'
                          '<meta name="description" content="none">'
                          '</head>') == \
        {"noindex": False, "nofollow": False, "noarchive": False}
    # token discipline: 'noindexing' is not 'noindex'
    assert _robots(spark, '<head><meta name=robots content=noindexing>'
                          '</head>')["noindex"] is False


def test_robots_directives_header(spark):
    got = _robots(spark, "<head></head>",
                  headers=[("Content-Type", "text/html"),
                           ("X-Robots-Tag", "noindex , noarchive")])
    assert got == {"noindex": True, "nofollow": False, "noarchive": True}
    # union of meta + header
    got = _robots(spark, "<head><meta name=robots content=nofollow></head>",
                  headers=[("x-robots-tag", "noindex")])
    assert got == {"noindex": True, "nofollow": True, "noarchive": False}
    # no directives anywhere
    got = _robots(spark, "<head></head>", headers=[("Server", "x")])
    assert got == {"noindex": False, "nofollow": False, "noarchive": False}


def _canon(spark, url, html):
    df = _rows(spark, [(url, html)])
    return df.select(
        canonical_link(F.col("page_url"), F.col("text")).alias("c")
    ).collect()[0].c


def test_canonical_link(spark):
    u = "http://h.example.com/dir/page.html?x=1"
    assert _canon(spark, u, '<head><link rel="canonical" '
                            'href="http://h.example.com/dir/page.html">'
                            "</head>") == "http://h.example.com/dir/page.html"
    # relative canonical resolves against the page url
    assert _canon(spark, u, "<head><link rel=canonical href=clean.html>"
                            "</head>") == "http://h.example.com/dir/clean.html"
    # multi-token rel, any order; first canonical wins
    assert _canon(spark, u, "<head>"
                  '<link rel="alternate" href="/feed.xml">'
                  "<link rel='canonical alternate' href='/a'>"
                  '<link rel="canonical" href="/b"></head>') == \
        "http://h.example.com/a"
    # absent / href-less / substring-token -> NULL
    assert _canon(spark, u, "<head></head>") is None
    assert _canon(spark, u, '<head><link rel="canonical"></head>') is None
    assert _canon(spark, u, '<head><link rel="canonicalish" href="/x">'
                            "</head>") is None
    # a canonical AFTER </head> does not count
    assert _canon(spark, u, '<head></head><link rel=canonical href=/y>') \
        is None


def test_declared_lang(spark):
    from warcio_spark.operators.links import declared_lang

    cases = [
        ('<html lang="en-US"><head></head>', None, ("en-us", None, "en-us")),
        ("<html lang=fr>", None, ("fr", None, "fr")),
        ("<HTML LANG='pt-BR'>", None, ("pt-br", None, "pt-br")),
        ('<html xml:lang="de">', None, ("de", None, "de")),
        ("<html>", None, (None, None, None)),
        ("no html tag at all", None, (None, None, None)),
        # junk gated out
        ('<html lang="!!">', None, (None, None, None)),
        ('<html lang="">', None, (None, None, None)),
        # header fallback + precedence + comma-list first tag
        ("<html>", [("Content-Language", " da , en")],
         (None, "da", "da")),
        ('<html lang="sv">', [("Content-Language", "en")],
         ("sv", "en", "sv")),
        ("<html>", [("Server", "x")], (None, None, None)),
    ]
    for i, (html, headers, want) in enumerate(cases):
        hcol = None
        if headers is not None:
            hcol = F.array(*[
                F.struct(F.lit(n).alias("name"), F.lit(v).alias("value"))
                for n, v in headers
            ])
        df = spark.createDataFrame([(html,)], ["text"])
        got = df.select(
            declared_lang(F.col("text"), hcol).alias("d")).collect()[0].d
        assert (got.html_lang, got.content_language, got.lang) == want, \
            (i, html)


def test_jsonld_blocks(spark):
    """operators/links.jsonld_blocks: multiline bodies, attribute order,
    quote styles, invalid JSON classification, the scalar-@type gate,
    and the per-page cap."""
    from warcio_spark.operators.links import (
        MAX_JSONLD_PER_PAGE,
        jsonld_blocks,
    )

    page = (
        '<html><head>'
        '<script type="application/ld+json">\n'
        '  {"@context": "https://schema.org",\n'
        '   "@type": "Article", "headline": "x"}\n'
        "</script>"
        "<script async type='application/ld+json'>"
        '{"@type":"Product"}</script>'
        "<script type=application/ld+json>{\"@type\":[\"A\",\"B\"]}</script>"
        '<script type="application/ld+json">{nope</script>'
        '<script type="application/ld+json">   </script>'
        '<script type="text/javascript">var t = "@type";</script>'
        "</head></html>"
    )
    many = "".join(
        '<script type="application/ld+json">{"@type":"T%d"}</script>' % i
        for i in range(MAX_JSONLD_PER_PAGE + 5))
    df = spark.createDataFrame(
        [("http://a/", page), ("http://b/", many)],
        "page_url string, text string")
    out = jsonld_blocks(df).collect()

    a = sorted((r.pos, r.jsonld_type, r.raw) for r in out
               if r.src_url == "http://a/")
    # the whitespace-only body (pos 4) is dropped; the JS decoy never
    # extracts; the multiline body survives with its internal newlines
    assert [p for p, _, _ in a] == [0, 1, 2, 3]
    assert a[0][1] == "Article" and "\n" in a[0][2]
    assert a[1][1] == "Product"
    assert a[2][1] is None and a[2][2] == '{"@type":["A","B"]}'
    assert a[3][1] is None and a[3][2] == "{nope"

    b = [r for r in out if r.src_url == "http://b/"]
    assert len(b) == MAX_JSONLD_PER_PAGE  # cap applied


def test_hreflang_alternates(spark):
    """operators/links.hreflang_alternates: quoting forms, lowercasing,
    relative resolution, pre-filter pos, body-region exclusion, and the
    three drop cases (wrong rel, missing hreflang, empty hreflang)."""
    from warcio_spark.operators.links import hreflang_alternates

    page = (
        "<head>"
        '<link rel="alternate" hreflang="FR" href="https://fr.ex/a">'
        "<link rel='ALTERNATE me' hreflang='de-AT' href='/de/a'>"
        "<link rel=alternate hreflang=x-default href=https://www.ex/a>"
        '<link rel="stylesheet" hreflang="es" href="/css.css">'
        '<link rel="alternate" type="application/rss+xml" href="/f.xml">'
        '<link rel="alternate" hreflang="" href="/empty">'
        "</head><body>"
        '<link rel="alternate" hreflang="it" href="/body-ignored">'
        "</body>"
    )
    df = spark.createDataFrame([("http://m.ex/a?x=1", page)],
                               "page_url string, text string")
    got = sorted((r.pos, r.hreflang, r.alternate)
                 for r in hreflang_alternates(df).collect())
    assert got == [
        (0, "fr", "https://fr.ex/a"),
        (1, "de-at", "http://m.ex/de/a"),  # rel token among others; lc
        (2, "x-default", "https://www.ex/a"),
    ]
