"""Anchor-text extraction (links.extract_anchor_texts /
anchor_text_table) vs an html.parser-based oracle."""

from html.parser import HTMLParser

import pytest

from warcio_spark.operators.links import (
    MAX_LINKS_PER_PAGE,
    anchor_text_table,
    extract_anchor_texts,
)


class _Oracle(HTMLParser):
    """First text run of each <a href=...> element, href cleaned the same
    way the engine cleans it (quote strip happens in the markup layer
    here; fragment split below)."""

    def __init__(self):
        super().__init__()
        self.links = []
        self._open = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            self._open = [href, ""] if href else None
        elif self._open is not None and self._open[1] == "":
            self._open = None  # markup before any text -> empty capture

    def handle_data(self, data):
        if self._open is not None and self._open[1] == "":
            self._open[1] = data
            if data.strip():
                self.links.append(tuple(self._open))
            self._open = None


def _py_anchors(pages):
    out = []
    for url, text in pages:
        p = _Oracle()
        p.feed(text)
        pos = 0
        for href, anchor in p.links[:MAX_LINKS_PER_PAGE]:
            href = href.split("#", 1)[0]
            anchor = " ".join(anchor.split())
            if href and anchor:
                out.append((url, href, anchor))
    return out


PAGES = [
    ("http://h.example.com/a/b.html",
     '<a href="http://x.org/1">First Link</a>'
     "<a href='/root.html'>  spaced   text </a>"
     "<a href=rel.html>bare</a>"
     '<a href="http://x.org/2"><b>markup first</b></a>'
     '<a href="#frag">fragment only</a>'
     '<a href="http://x.org/3"></a>'
     '<title>href= inside <a href="http://x.org/4">decoy</a></title>'),
    ("http://h2.example.com/",
     '<a href="http://x.org/1">First Link</a>'
     '<a href="q?z=1">query\nnewline</a>'),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(PAGES, ["page_url", "text"])
    return extract_anchor_texts(df).collect()


def test_matches_htmlparser_oracle(extracted):
    got = sorted((r["src_url"], r["href"], r["anchor"]) for r in extracted)
    assert got == sorted(_py_anchors(PAGES))


def test_resolution_contract(extracted):
    by_href = {r["href"]: r["outlink"] for r in extracted}
    assert by_href["/root.html"] == "http://h.example.com/root.html"
    assert by_href["rel.html"] == "http://h.example.com/a/rel.html"
    assert by_href["q?z=1"] == "http://h2.example.com/q?z=1"


def test_whitespace_normalized(extracted):
    anchors = {r["anchor"] for r in extracted}
    assert "spaced text" in anchors
    assert "query newline" in anchors


def test_table_aggregates(spark):
    df = spark.createDataFrame(PAGES, ["page_url", "text"])
    rows = {
        (r["outlink"], r["anchor"]): r["n_refs"]
        for r in anchor_text_table(df).collect()
    }
    assert rows[("http://x.org/1", "First Link")] == 2
