"""Crawl scope rules (plans/scope) vs a Python urllib oracle, plus plan
shape: every include test must compile to a (broadcast) hash semi-join,
never a nested loop."""

import contextlib
import io
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from warcio_spark.plans.scope import (
    SCOPE_TYPES,
    scope_filter,
    seed_prefix_expr,
    seed_table,
)

SEEDS = [
    "http://example.com/docs/intro.html",
    "http://blog.example.org/",
    "https://deep.sub.site.net/a/b/c",
]

CANDS = [
    "http://example.com/docs/page2.html",      # prefix+host+domain of seed1
    "http://example.com/other/page.html",      # host+domain, NOT prefix
    "http://www.example.com/docs/x",           # domain of seed1 only
    "http://blog.example.org/post/1",          # prefix+host+domain of seed2
    "http://example.org/",                     # none (bare registrable)
    "https://deep.sub.site.net/a/b/page",      # prefix+host+domain of seed3
    "https://other.sub.site.net/a/b/c",        # domain-of-tail... NOT (seed host is deep.sub.site.net)
    "https://x.deep.sub.site.net/",            # domain (subdomain of seed3 host)
    "http://unrelated.com/docs/intro.html",    # none
    "http://example.com.evil.com/docs/",       # none (suffix spoof)
]


def _py_prefix(seed):
    s = urlsplit(seed)
    base = seed.split("?", 1)[0].split("#", 1)[0]
    rest = base.split("://", 1)[1]
    if "/" in rest:
        return base.rsplit("/", 1)[0] + "/"
    return base + "/"


def _py_in_scope(url, scope_type):
    host = urlsplit(url).hostname
    for seed in SEEDS:
        sh = urlsplit(seed).hostname
        if scope_type == "host" and host == sh:
            return True
        if scope_type == "domain" and (host == sh or host.endswith("." + sh)):
            return True
        if scope_type == "prefix" and url.startswith(_py_prefix(seed)):
            return True
    return scope_type == "any"


@pytest.fixture()
def frames(spark):
    cands = spark.createDataFrame([(u,) for u in CANDS], ["url"])
    seeds = spark.createDataFrame([(u,) for u in SEEDS], ["url"])
    return cands, seeds


@pytest.mark.parametrize("scope_type", SCOPE_TYPES)
def test_scope_matches_python_oracle(spark, frames, scope_type):
    cands, seeds = frames
    got = {r["url"] for r in scope_filter(cands, seeds, scope_type).collect()}
    want = {u for u in CANDS if _py_in_scope(u, scope_type)}
    assert got == want, scope_type


def test_excludes_apply_after_include(spark, frames):
    cands, seeds = frames
    got = {
        r["url"]
        for r in scope_filter(
            cands, seeds, "domain", excludes=(r"/docs/", r"\.org/post/")
        ).collect()
    }
    want = {
        u for u in CANDS
        if _py_in_scope(u, "domain")
        and "/docs/" not in u and ".org/post/" not in u
    }
    assert got == want


def test_seed_prefix_expr_edges(spark):
    rows = [
        ("http://h.com", "http://h.com/"),
        ("http://h.com/", "http://h.com/"),
        ("http://h.com/a", "http://h.com/"),
        ("http://h.com/a/", "http://h.com/a/"),
        ("http://h.com/a/b.html?q=1#f", "http://h.com/a/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"])
    got = [r["p"] for r in
           df.select(seed_prefix_expr("url").alias("p")).collect()]
    assert got == [w for _, w in rows]


def test_bad_scope_type_raises(spark, frames):
    cands, seeds = frames
    with pytest.raises(ValueError):
        scope_filter(cands, seeds, "page")


@pytest.mark.parametrize("scope_type", ["host", "domain", "prefix"])
def test_plan_is_hash_semi_join_no_nested_loop(spark, frames, scope_type):
    cands, seeds = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scope_filter(cands, seeds, scope_type).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
