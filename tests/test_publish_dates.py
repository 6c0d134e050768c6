"""Publication-date ladder (operators/links.publish_dates): pinned hand
cases per stage + precedence, and parity with an independent re-based
python oracle over a randomized universe."""

import random
import re

from warcio_spark.operators.links import publish_dates

META_RX = re.compile(r"(?i)<meta(\s(?:[^<>\"']|\"[^\"]*\"|'[^']*')*)/?>")
TIME_RX = re.compile(r"(?i)<time(\s(?:[^<>\"']|\"[^\"]*\"|'[^']*')*)/?>")
PUB_NAMES = re.compile(
    r"^(article:published_time|datepublished|publishdate|publish[-_]date|"
    r"date|dc\.date(\.issued)?|dcterms\.(date|issued))$"
)
URL_RX = re.compile(
    r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?(?:/|$)"
)


def _attr(blob, names):
    for q in (r'\s(?:%s)\s*=\s*"([^"]*)"', r"\s(?:%s)\s*=\s*'([^']*)'",
              r"\s(?:%s)\s*=\s*([^\s\"'<>]+)"):
        m = re.search("(?i)" + q % names, blob)
        if m and m.group(1):
            return m.group(1)
    return ""


def _iso(val):
    m = re.match(r"^\s*((?:19|20)\d{2})-(\d{2})-(\d{2})", val or "")
    if not m:
        return None
    y, mo, d = m.groups()
    if not re.match(r"^(0[1-9]|1[0-2])$", mo):
        return None
    if not re.match(r"^(0[1-9]|[12][0-9]|3[01])$", d):
        return None
    return f"{y}-{mo}-{d}"


def oracle_publish_date(url, text):
    for blob in [m.group(1) for m in META_RX.finditer(text)][:64]:
        name = _attr(blob, "name|property|itemprop").lower()
        day = _iso(_attr(blob, "content"))
        if PUB_NAMES.match(name) and day:
            return day, "meta"
    m = TIME_RX.search(text)
    if m:
        day = _iso(_attr(m.group(1), "datetime"))
        if day:
            return day, "time"
    m = URL_RX.search(url)
    if m:
        y, mo, d = m.groups()
        return f"{y}-{mo}-{d or '01'}", "url"
    return None, None


def _run(spark, rows):
    df = spark.createDataFrame(rows, "page_url string, text string")
    return {
        r.src_url: (r.published, r.date_source)
        for r in publish_dates(df).collect()
    }


def test_hand_cases(spark):
    cases = [
        # og article meta wins over everything
        ("http://n.ex/2020/01/05/x",
         '<meta property="article:published_time" '
         'content="2024-03-15T10:00:00Z">'
         '<time datetime="2023-01-01">y</time>',
         ("2024-03-15", "meta")),
        # schema.org itemprop, single-quoted
        ("http://n.ex/a",
         "<meta itemprop='datePublished' content='2022-11-30'>",
         ("2022-11-30", "meta")),
        # invalid month in meta -> falls through to <time>
        ("http://n.ex/b",
         '<meta name="date" content="2024-13-01">'
         '<time datetime="2021-06-09T08:00">t</time>',
         ("2021-06-09", "time")),
        # 'description' meta must NOT match even containing a date
        ("http://n.ex/c",
         '<meta name="description" content="2020-01-01 stuff">',
         (None, None)),
        # URL fallback, day present
        ("http://n.ex/blog/2019/07/23/post.html", "<p>x</p>",
         ("2019-07-23", "url")),
        # URL month-only dates the 1st
        ("http://n.ex/2021/02/", "<p>x</p>", ("2021-02-01", "url")),
        # URL with invalid month is not a date path
        ("http://n.ex/2021/13/", "<p>x</p>", (None, None)),
        # undatable
        ("http://n.ex/plain", "<p>no dates here</p>", (None, None)),
        # first matching meta in document order wins
        ("http://n.ex/d",
         '<meta name="date" content="2018-01-02">'
         '<meta property="article:published_time" content="2019-05-06">',
         ("2018-01-02", "meta")),
        # bare-quoted meta value
        ("http://n.ex/e", "<meta name=date content=2020-08-09>",
         ("2020-08-09", "meta")),
    ]
    got = _run(spark, [(u, t) for u, t, _ in cases])
    for u, t, want in cases:
        assert got[u] == want, (u, t)


def test_python_oracle_randomized(spark):
    rng = random.Random(7)
    metas = [
        '<meta property="article:published_time" content="{d}">',
        "<meta itemprop='datePublished' content='{d}'>",
        '<meta name="date" content="{d}">',
        '<meta name="keywords" content="k1 k2">',
        '<meta name="date" content="not a date">',
    ]
    rows = []
    for i in range(300):
        ds = f"20{rng.randint(0, 25):02d}-{rng.randint(0, 13):02d}-" \
             f"{rng.randint(0, 32):02d}"
        parts = []
        for _ in range(rng.randint(0, 3)):
            parts.append(rng.choice(metas).format(d=ds))
        if rng.random() < 0.5:
            parts.append(f'<time datetime="{ds}T12:00">when</time>')
        rng.shuffle(parts)
        url = f"http://h{i}.ex" + rng.choice(
            ["/x", f"/{rng.randint(1990, 2030)}/{rng.randint(1, 13):02d}/p",
             f"/2020/11/{rng.randint(1, 31):02d}/q"]
        ) + f"?i={i}"
        rows.append((url, "<html>" + "".join(parts) + "</html>"))
    got = _run(spark, rows)
    for url, text in rows:
        assert got[url] == oracle_publish_date(url, text), (url, text)
