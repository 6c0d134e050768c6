"""robots.txt kernel + Spark path-level robots filtering."""

from urllib import robotparser

from pyspark.sql import functions as F

from warcio_spark.kernels.robots import parse_robots_txt, robots_allowed

ROBOTS = """
# comments are fine
User-agent: mybot
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/
Disallow: /admin
Allow: /admin/public
Crawl-delay: 7
"""


def test_parse_groups_and_agent_selection():
    star = parse_robots_txt(ROBOTS, "otherbot/1.0")
    assert star["disallow"] == ["/tmp/", "/admin"]
    assert star["allow"] == ["/admin/public"]
    assert star["crawl_delay"] == 7.0
    mine = parse_robots_txt(ROBOTS, "MyBot/2.0 (+http://x)")
    assert mine["disallow"] == ["/private/"]
    assert mine["allow"] == ["/private/ok/"]
    assert mine["crawl_delay"] == 2.5


def test_allow_deny_longest_match():
    rules = parse_robots_txt(ROBOTS, "other")
    assert robots_allowed("/", rules)
    assert not robots_allowed("/tmp/x", rules)
    assert not robots_allowed("/admin", rules)
    assert not robots_allowed("/adminX", rules)  # prefix semantics
    assert robots_allowed("/admin/public/page", rules)  # allow wins (longer)
    assert robots_allowed("/other", rules)


def test_wildcards_and_anchors():
    rules = {"allow": [], "disallow": ["/*.pdf$", "/a/*/secret"], "crawl_delay": None}
    assert not robots_allowed("/x/file.pdf", rules)
    assert robots_allowed("/x/file.pdfx", rules)  # $ anchor
    assert not robots_allowed("/a/b/secret", rules)
    assert not robots_allowed("/a/b/c/secretX", rules)  # unanchored tail
    assert robots_allowed("/a/secret", rules)  # needs a middle segment


def test_against_stdlib_robotparser_plain_prefixes():
    """Agree with urllib.robotparser wherever first-match (stdlib) and
    RFC-9309 longest-match (ours) coincide — i.e. everywhere except
    Allow-overrides-earlier-Disallow, where RFC/Google semantics allow and
    the stdlib denies."""
    rp = robotparser.RobotFileParser()
    rp.parse(ROBOTS.splitlines())
    rules = parse_robots_txt(ROBOTS, "other")
    for path in ["/", "/tmp/x", "/admin", "/adminx", "/foo", "/private/y", "/t"]:
        assert robots_allowed(path, rules) == rp.can_fetch("other", "http://h" + path), path
    # the documented divergence:
    assert robots_allowed("/admin/public/x", rules) is True
    assert rp.can_fetch("other", "http://h/admin/public/x") is False


def test_spark_robots_pipeline(spark):
    """robots.txt bodies -> rules table -> path-level frontier filtering."""
    from warcio_spark.plans.frontier import (
        PolitenessConfig,
        apply_robots_rules,
        robots_table_from_pages,
        with_frontier_keys,
    )

    robots_pages = spark.createDataFrame(
        [
            ("h1.com", ROBOTS),
            ("h2.com", "User-agent: *\nDisallow: /\n"),
            ("h3.com", ""),
        ],
        "host string, body string",
    )
    rules = robots_table_from_pages(robots_pages, user_agent="other")
    got = {r.host: r for r in rules.collect()}
    assert got["h2.com"].disallow == ["/"]
    assert got["h1.com"].crawl_delay == 7.0

    cands = with_frontier_keys(
        spark.createDataFrame(
            [
                ("http://h1.com/tmp/x", 1.0, 1),
                ("http://h1.com/admin/public/p", 1.0, 2),
                ("http://h1.com/fine", 1.0, 3),
                ("http://h2.com/anything", 1.0, 4),
                ("http://h3.com/ok", 1.0, 5),
                ("http://unknown.com/ok", 1.0, 6),
            ],
            "url string, priority double, seq long",
        )
    )
    cfg = PolitenessConfig()
    out = {r.url: (r.allowed, r.crawl_delay)
           for r in apply_robots_rules(cands, rules, cfg).collect()}
    assert out["http://h1.com/tmp/x"][0] is False
    assert out["http://h1.com/admin/public/p"][0] is True
    assert out["http://h1.com/fine"][0] is True
    assert out["http://h1.com/fine"][1] == 7.0
    assert out["http://h2.com/anything"][0] is False
    assert out["http://h3.com/ok"][0] is True
    assert out["http://unknown.com/ok"] == (True, cfg.default_crawl_delay)


def test_path_rules_schedule_parity_with_oracle(spark):
    """Full schedule round with path-level robots rules: Spark == oracle
    (plain-prefix rules, where JVM and kernel matching are both exact)."""
    from warcio_spark.plans import reference_crawler as oracle
    from warcio_spark.plans.frontier import (
        PolitenessConfig,
        fetch_order,
        prepare_candidates,
        schedule_round,
    )

    rules = {
        "h1.com": {"allow": ["/admin/public"], "disallow": ["/tmp/", "/admin"],
                   "crawl_delay": 2.0},
        "h2.com": {"allow": [], "disallow": ["/"], "crawl_delay": None},
    }
    cands = []
    for i in range(300):
        host = ["h1.com", "h2.com", "h3.com"][i % 3]
        path = ["/tmp/x", "/admin/public/p", "/fine", "/admin/x", "/"][i % 5]
        cands.append({"url": f"http://{host}{path}?i={i}",
                      "priority": float(i % 50), "seq": i})

    ocfg = oracle.OracleConfig(slot_seconds=60, default_crawl_delay=5.0,
                               max_host_budget=30)
    want = [(c["fetch_order"], c["url_canon"], c["crawl_delay"])
            for c in oracle.schedule(cands, set(), rules, ocfg)]

    rules_df = spark.createDataFrame(
        [(h, r["allow"], r["disallow"], r["crawl_delay"]) for h, r in rules.items()],
        "host string, allow array<string>, disallow array<string>, crawl_delay double",
    )
    raw = spark.createDataFrame(
        [(c["url"], c["priority"], c["seq"]) for c in cands],
        "url string, priority double, seq long",
    ).repartition(5)
    cfg = PolitenessConfig(slot_seconds=60, default_crawl_delay=5.0,
                           max_host_budget=30, salt_buckets=4)
    got = [(r.fetch_order, r.url_canon, r.crawl_delay)
           for r in fetch_order(schedule_round(
               prepare_candidates(raw, None, rules_df, cfg), cfg))
           .orderBy("fetch_order").collect()]
    assert got == want
    hosts = {u.split("/")[2] for _, u, _ in got}
    assert "h2.com" not in hosts  # fully disallowed
    assert "h3.com" in hosts      # no rules -> allowed


def test_wildcard_backtracking_semantics():
    """'$'-anchored multi-wildcard patterns match if ANY alignment reaches
    the end (Google-matcher behavior), not just the leftmost one."""
    rules = {"allow": [], "disallow": ["a*b$"], "crawl_delay": None}
    assert not robots_allowed("axbyb", rules)   # backtracks to the last b
    assert robots_allowed("axbyc", rules)


def test_jvm_rule_matching_equals_kernel(spark):
    """The Spark-side rlike/startswith evaluation in apply_robots_rules must
    agree with the kernel on every (pattern, path) pair — including
    wildcards, anchors, regex metacharacters and specificity ties."""
    import random

    from warcio_spark.plans.frontier import PolitenessConfig, apply_robots_rules
    from warcio_spark.kernels.robots import robots_allowed

    rng = random.Random(23)
    pieces = ["/a", "/bb", "/c.d", "/e(f", "/.pdf", "/x+y", "/[z]", "/priv"]
    patterns = set()
    while len(patterns) < 40:
        n = rng.randrange(1, 4)
        pat = "".join(rng.choice(pieces) for _ in range(n))
        if rng.random() < 0.5:
            i = rng.randrange(1, len(pat))
            pat = pat[:i] + "*" + pat[i:]
        if rng.random() < 0.3:
            pat += "$"
        patterns.add(pat)
    patterns = sorted(patterns)
    disallow = patterns[::2]
    allow = patterns[1::2]

    paths = set()
    while len(paths) < 120:
        paths.add("".join(rng.choice(pieces) for _ in range(rng.randrange(1, 5))))
    paths = sorted(paths)

    rules_k = {"allow": allow, "disallow": disallow, "crawl_delay": None}
    want = {p: robots_allowed(p, rules_k) for p in paths}

    rules_df = spark.createDataFrame(
        [("h.com", allow, disallow, 1.0)],
        "host string, allow array<string>, disallow array<string>, crawl_delay double",
    )
    cands = spark.createDataFrame(
        [("http://h.com" + p, "h.com", "http://h.com" + p, hash(p), 1.0, i)
         for i, p in enumerate(paths)],
        "url string, host string, url_canon string, url_hash long, priority double, seq long",
    )
    got = {
        r.url_canon.replace("http://h.com", ""): r.allowed
        for r in apply_robots_rules(cands, rules_df, PolitenessConfig()).collect()
    }
    diffs = {p: (want[p], got[p]) for p in paths if want[p] != got[p]}
    assert not diffs, dict(list(diffs.items())[:5])


SITEMAP_ROBOTS = """
# discovery lines are global, wherever they appear
Sitemap: https://h.com/before-any-group.xml
User-agent: mybot
Disallow: /private/
sitemap : https://h.com/mid-group.xml   # trailing comment
User-agent: *
Disallow: /tmp/
SITEMAP:https://h.com/no-space.xml
Sitemap:
Sitemap: https://h.com/before-any-group.xml
"""


def test_sitemap_lines_are_global_and_ordered():
    want = [
        "https://h.com/before-any-group.xml",
        "https://h.com/mid-group.xml",
        "https://h.com/no-space.xml",
        "https://h.com/before-any-group.xml",  # duplicates kept
    ]
    for agent in ("mybot", "other", "*"):
        assert parse_robots_txt(SITEMAP_ROBOTS, agent)["sitemaps"] == want
    # and a file with none at all
    assert parse_robots_txt(ROBOTS, "other")["sitemaps"] == []
    assert parse_robots_txt("", "other")["sitemaps"] == []


def test_sitemap_parity_with_urllib_robotparser():
    rp = robotparser.RobotFileParser()
    rp.parse(SITEMAP_ROBOTS.splitlines())
    theirs = rp.site_maps() or []
    # urllib keeps empty-valued Sitemap lines; we drop them (documented)
    assert parse_robots_txt(SITEMAP_ROBOTS, "*")["sitemaps"] == [
        s for s in theirs if s]


def test_sitemap_line_does_not_break_agent_grouping():
    txt = ("User-agent: a\nSitemap: https://h.com/s.xml\n"
           "User-agent: b\nDisallow: /x\n")
    # urllib semantics: a sitemap line leaves group state untouched, so
    # agents a and b still form ONE group sharing the Disallow
    assert parse_robots_txt(txt, "a")["disallow"] == ["/x"]
    assert parse_robots_txt(txt, "b")["disallow"] == ["/x"]


def test_spark_robots_sitemap_discovery(spark):
    from warcio_spark.plans.frontier import (
        robots_sitemap_urls,
        robots_table_from_pages,
    )

    robots_pages = spark.createDataFrame(
        [("h1.com", SITEMAP_ROBOTS.encode()), ("h2.com", ROBOTS.encode()),
         ("h3.com", b"Sitemap: https://h3.com/s.xml\n")],
        "host string, body binary",
    )
    rules = robots_table_from_pages(robots_pages)
    got = sorted((r.host, r.pos, r.sitemap_url)
                 for r in robots_sitemap_urls(rules).collect())
    assert got == [
        ("h1.com", 0, "https://h.com/before-any-group.xml"),
        ("h1.com", 1, "https://h.com/mid-group.xml"),
        ("h1.com", 2, "https://h.com/no-space.xml"),
        ("h1.com", 3, "https://h.com/before-any-group.xml"),
        ("h3.com", 0, "https://h3.com/s.xml"),
    ]


def test_robots_audit(spark):
    """plans/frontier.robots_audit: fetched urls re-checked against a
    rules table built from real robots.txt bodies — wildcard and '$'
    rules go through the production JVM evaluator, unruled hosts audit
    as allowed with the default delay, and verdicts match
    kernels.robots.robots_allowed (itself stdlib-cross-checked above)."""
    from warcio_spark.plans.frontier import (
        robots_audit,
        robots_table_from_pages,
    )

    body = (b"User-agent: *\n"
            b"Allow: /pub\n"
            b"Disallow: /pub/secret\n"
            b"Disallow: /*.json$\n"
            b"Disallow: /tmp\n"
            b"Crawl-delay: 2\n")
    rules = robots_table_from_pages(spark.createDataFrame(
        [("h1.com", body)], "host string, body binary"))
    urls = [
        "http://h1.com/pub/ok.html",      # allowed (Allow /pub)
        "http://h1.com/pub/secret/x",     # denied (longer Disallow)
        "http://h1.com/api/data.json",    # denied (wildcard + anchor)
        "http://h1.com/data.json.bak",    # allowed ('$' must anchor)
        "http://h1.com/tmp",              # denied
        "http://h1.com",                  # empty path -> '/' -> allowed
        "http://unruled.com/anything",    # no rules -> allowed
        "HTTP://h1.com/tmp/x",            # messy scheme: canonicalized,
                                          # still reaches the deny rule
    ]
    fetched = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r for r in robots_audit(fetched, rules).collect()}

    rules_k = parse_robots_txt(body.decode(), "*")
    for u in urls:
        path = u.split(".com", 1)[1] or "/"
        want = (True if "unruled" in u
                else robots_allowed(path, rules_k))
        assert got[u].allowed == want, u
    assert got["http://h1.com/pub/ok.html"].crawl_delay == 2.0
    assert got["http://unruled.com/anything"].crawl_delay == 5.0
