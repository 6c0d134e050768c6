"""URL-template mining (plans/frontier.url_template /
url_pattern_census): hand-computed template collapses, a stdlib-re
replay oracle, trap-flag gating on both axes, and parallelism
invariance."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.frontier import url_pattern_census, url_template


def _template_oracle(url):
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+)", url)
    head = m.group(1) if m else ""
    pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)", url)
    path = pm.group(1) if pm else ""
    qm = re.search(r"\?([^#]*)", url)
    query = qm.group(1) if qm else ""
    npath = re.sub(r"[0-9]+", "{N}",
                   re.sub(r"(?i)[0-9a-f]{8,}", "{H}", path))
    keys = sorted(p.split("=", 1)[0] for p in query.split("&") if p)
    return head + npath + ("?" + "&".join(keys) if keys else "")


_URLS = [
    "http://cal.ex/cal/2026/8/19",
    "http://cal.ex/cal/1999/12/31",
    "https://s.ex/u/deadbeef01234567/profile",
    "https://s.ex/u/CAFEBABE99/profile",            # uppercase hex run
    "http://q.ex/list?page=9&sort=asc&page=10",     # dup + unsorted keys
    "http://q.ex/list?sort=desc&page=1",            # same template
    "http://w.ex/about",                            # no digits at all
    "http://w.ex/p12#frag",                         # fragment ignored
    "http://w.ex/p?a&b=1&&c==x",                    # bare key, empty, '=='
]


def test_url_template_matches_re_oracle(spark):
    df = spark.createDataFrame([(u,) for u in _URLS], "url string")
    got = {r.url: r.t for r in
           df.select("url", url_template("url").alias("t")).collect()}
    for u in _URLS:
        assert got[u] == _template_oracle(u), u


def test_url_template_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u in _URLS], "url string")
    got = {r.url: r.t for r in
           df.select("url", url_template("url").alias("t")).collect()}
    assert got["http://cal.ex/cal/2026/8/19"] == "http://cal.ex/cal/{N}/{N}/{N}"
    assert got["http://cal.ex/cal/1999/12/31"] == "http://cal.ex/cal/{N}/{N}/{N}"
    assert got["https://s.ex/u/deadbeef01234567/profile"] == \
        "https://s.ex/u/{H}/profile"
    assert got["https://s.ex/u/CAFEBABE99/profile"] == \
        "https://s.ex/u/{H}/profile"
    # query reduced to sorted names; duplicate keys kept (they are part
    # of the generator's shape)
    assert got["http://q.ex/list?page=9&sort=asc&page=10"] == \
        "http://q.ex/list?page&page&sort"
    assert got["http://q.ex/list?sort=desc&page=1"] == \
        "http://q.ex/list?page&sort"
    assert got["http://w.ex/about"] == "http://w.ex/about"
    assert got["http://w.ex/p12#frag"] == "http://w.ex/p{N}"
    assert got["http://w.ex/p?a&b=1&&c==x"] == "http://w.ex/p?a&b&c"


def test_pattern_census_flags_generator_not_small_host(spark):
    urls = (["http://trap.ex/cal/%d/%d" % (2000 + i % 30, i % 12)
             for i in range(200)]
            + ["http://small.ex/p%d" % i for i in range(20)]
            + ["http://mixed.ex/a%d" % i for i in range(80)]
            + ["http://mixed.ex/static/style", "http://mixed.ex/about"])
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {(r.host, r.template): r for r in
            url_pattern_census(df, min_count=100, min_share=0.5).collect()}

    trap = rows[("trap.ex", "http://trap.ex/cal/{N}/{N}")]
    assert trap.n_urls == 200 and trap.host_share == 1.0
    assert trap.is_trap_pattern

    # share 1.0 but only 20 urls: absolute floor protects small hosts
    small = rows[("small.ex", "http://small.ex/p{N}")]
    assert small.host_share == 1.0 and not small.is_trap_pattern

    # 80/82 share but under min_count: not flagged either
    mx = rows[("mixed.ex", "http://mixed.ex/a{N}")]
    assert mx.n_urls == 80 and not mx.is_trap_pattern
    assert rows[("mixed.ex", "http://mixed.ex/about")].n_urls == 1
    # sample_url is the minimum url of the bucket (deterministic)
    assert trap.sample_url == min(u for u in urls if "trap.ex" in u)


def test_pattern_census_parallelism_invariance(spark):
    urls = ["http://h%d.ex/x/%d?s=%d" % (i % 5, i * 31 % 400, i)
            for i in range(300)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    one = {(r.host, r.template): (r.n_urls, r.sample_url, r.host_share,
                                  r.is_trap_pattern)
           for r in url_pattern_census(df.coalesce(1)).collect()}
    many = {(r.host, r.template): (r.n_urls, r.sample_url, r.host_share,
                                   r.is_trap_pattern)
            for r in url_pattern_census(df.repartition(16)).collect()}
    assert one == many
