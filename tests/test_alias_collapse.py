"""Canonical-alias capture collapse (plans/graph.collapse_aliases):
hand cases per path (chain merge, mixed redirect+canonical edges, loop
keeps self, no-edge identity), python oracle over a randomized alias
graph, parallelism invariance."""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.plans.graph import collapse_aliases


def _run(spark, captures, edges, parts=None, **kw):
    c = spark.createDataFrame([(u,) for u in captures], "url string")
    e = spark.createDataFrame(edges, "src string, dst string")
    if parts:
        c, e = c.repartition(parts), e.repartition(parts)
    return {
        r.canonical_url: (r.n_alias_urls, r.n_captures)
        for r in collapse_aliases(c, e, **kw).collect()
    }


def _oracle(captures, edges, max_hops=32):
    # replay resolve_chains: dedup multi-target by max, walk to terminal
    step = {}
    for s, d in edges:
        if s is None or d is None:
            continue
        step[s] = max(step.get(s, d), d)
    final = {}
    for s in step:
        cur, hops, seen = s, 0, set()
        while cur in step:
            if cur in seen or hops >= max_hops:
                cur = None
                break
            seen.add(cur)
            cur = step[cur]
            hops += 1
        if cur is not None:
            final[s] = cur
    groups = defaultdict(lambda: [set(), 0])
    for u, n in Counter(captures).items():
        c = final.get(u, u)
        groups[c][0].add(u)
        groups[c][1] += n
    return {c: (len(us), n) for c, (us, n) in groups.items()}


def test_hand_cases(spark):
    captures = (
        # three aliases of one page: utm-tagged (canonical edge), the
        # http host (redirect), and the final itself
        ["http://p.ex/a?utm=x", "http://p.ex/a?utm=x",
         "http://old.ex/a", "https://p.ex/a"]
        # plain url, no edges
        + ["http://solo.ex/"]
        # 2-loop: both keep their own urls
        + ["http://loop.ex/1", "http://loop.ex/2"]
    )
    edges = [
        # canonical declaration then a redirect: chain of 2
        ("http://p.ex/a?utm=x", "http://p.ex/a"),
        ("http://p.ex/a", "https://p.ex/a"),
        ("http://old.ex/a", "https://p.ex/a"),
        ("http://loop.ex/1", "http://loop.ex/2"),
        ("http://loop.ex/2", "http://loop.ex/1"),
    ]
    got = _run(spark, captures, edges)
    assert got["https://p.ex/a"] == (3, 4)
    assert got["http://solo.ex/"] == (1, 1)
    assert got["http://loop.ex/1"] == (1, 1)
    assert got["http://loop.ex/2"] == (1, 1)
    assert len(got) == 4


def test_alias_url_without_captures_still_merges_others(spark):
    # the canonical target itself was never captured: the group key is
    # still the final url, counting only captured aliases
    captures = ["http://a.ex/x", "http://a.ex/y"]
    edges = [("http://a.ex/x", "http://a.ex/final"),
             ("http://a.ex/y", "http://a.ex/final")]
    got = _run(spark, captures, edges)
    assert got == {"http://a.ex/final": (2, 2)}


def test_python_oracle_randomized(spark):
    import random

    rng = random.Random(31)
    urls = ["http://u%d.ex/p" % i for i in range(80)]
    captures = [rng.choice(urls) for _ in range(300)]
    edges = []
    for _ in range(60):
        s, d = rng.choice(urls), rng.choice(urls)
        if s != d:
            edges.append((s, d))
    want = _oracle(captures, edges)
    assert _run(spark, captures, edges) == want
    assert _run(spark, captures, edges, parts=7) == want
