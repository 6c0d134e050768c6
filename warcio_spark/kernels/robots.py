"""robots.txt parsing kernel (north rule J4: per-netloc allow/deny cache).

Parses the original robots exclusion format into prefix rule lists and
evaluates them with longest-match precedence (Allow wins ties) — the
de-facto standard semantics (RFC 9309 §2.2.2). Pure Python; wrapped as a
pUDF to turn fetched robots.txt payloads into the broadcastable rules
table the frontier joins against.
"""

from __future__ import annotations

import re
from functools import lru_cache


def parse_robots_txt(text: str, user_agent: str = "*"):
    """Parse robots.txt content for the given agent.

    Returns {"allow": [prefixes], "disallow": [prefixes], "crawl_delay":
    float|None, "sitemaps": [urls]}. Group selection per RFC 9309: the
    most specific matching user-agent line's group(s); '*' as fallback.
    Directives of multiple groups with the same agent merge. ``Sitemap:``
    lines are GLOBAL (sitemaps.org "Sitemap location" / RFC 9309 §2.3
    other records): collected wherever they appear, order-preserving,
    group state untouched (urllib.robotparser semantics; empty values
    are dropped unlike urllib's).
    """
    groups = {}  # agent(lower) -> {"allow": [], "disallow": [], "crawl_delay": None}
    sitemaps = []
    current_agents = []
    last_was_agent = False

    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()

        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue

        if field == "user-agent":
            agent = value.lower()
            if last_was_agent:
                current_agents.append(agent)
            else:
                current_agents = [agent]
            for a in current_agents:
                groups.setdefault(
                    a, {"allow": [], "disallow": [], "crawl_delay": None}
                )
            last_was_agent = True
            continue

        last_was_agent = False
        if not current_agents:
            continue
        for a in current_agents:
            g = groups[a]
            if field == "disallow":
                if value:
                    g["disallow"].append(value)
            elif field == "allow":
                if value:
                    g["allow"].append(value)
            elif field == "crawl-delay":
                try:
                    g["crawl_delay"] = float(value)
                except ValueError:
                    pass

    ua = user_agent.lower()
    # most specific agent token that is a substring of ours, else '*'
    best = None
    for agent in groups:
        if agent != "*" and agent in ua:
            if best is None or len(agent) > len(best):
                best = agent
    if best is None and "*" in groups:
        best = "*"
    if best is None:
        return {"allow": [], "disallow": [], "crawl_delay": None,
                "sitemaps": sitemaps}
    return dict(groups[best], sitemaps=sitemaps)


@lru_cache(maxsize=8192)
def _pattern_rx(pattern: str):
    """Compile a robots path pattern ('*' wildcard, '$' end anchor) to a
    regex + its specificity. Backtracking semantics (any alignment of the
    '*' expansions may satisfy an end anchor) — the behavior of Google's
    reference matcher, and exactly what the JVM rlike path in
    plans/frontier.py evaluates, so kernel and Spark never diverge."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    parts = core.split("*")
    rx = ".*".join(re.escape(p) for p in parts)
    if anchored and parts[-1] != "":
        rx += "$"
    return re.compile(rx), len(core) + (1 if anchored else 0)


def _prefix_matches(path: str, pattern: str) -> int:
    """Match a robots path pattern against a path; returns the pattern's
    specificity (its length) or -1."""
    rx, spec = _pattern_rx(pattern)
    return spec if rx.match(path) else -1


def robots_allowed(path: str, rules) -> bool:
    """Longest-match wins; Allow wins length ties; no match => allowed."""
    if not path:
        path = "/"
    best_allow = max(
        (_prefix_matches(path, p) for p in rules.get("allow", [])), default=-1
    )
    best_disallow = max(
        (_prefix_matches(path, p) for p in rules.get("disallow", [])), default=-1
    )
    if best_disallow == -1:
        return True
    return best_allow >= best_disallow
