"""Single-process oracle crawler (M5): the same frontier semantics as
``plans.frontier`` / ``plans.crawl``, implemented with plain Python dicts and
sorts. The Spark engine must reproduce this crawler's fetch ordering and
URL-seen membership exactly, at any parallelism (BASELINE.json:2,6).

No Spark imports here — this is the parity yardstick, deliberately boring.
Ordering contract (total, parallelism-independent):
    within a host: (priority desc, seq asc, url_canon asc), budget-capped
    global emit:   (priority desc, seq asc, url_canon asc)
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from warcio_spark.kernels.urls import canonicalize_url, url_host

_PATH_RX = re.compile(r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)$")


@dataclass(frozen=True)
class OracleConfig:
    slot_seconds: int = 60
    default_crawl_delay: float = 5.0
    max_host_budget: int = 100

    def budget(self, crawl_delay) -> int:
        d = crawl_delay if crawl_delay is not None else self.default_crawl_delay
        raw = math.floor(self.slot_seconds / max(d, 0.001))
        return min(max(raw, 1), self.max_host_budget)


def prepare(cands, seen_canon: set, robots: dict, cfg: OracleConfig):
    """cands: iterable of dicts with url, priority, seq. Returns eligible
    candidate dicts with url_canon/host/crawl_delay, deduped (lowest seq per
    canonical url), seen-filtered, robots-filtered."""
    best = {}
    for c in cands:
        canon = canonicalize_url(c["url"])
        cur = best.get(canon)
        if cur is None or c["seq"] < cur["seq"]:
            best[canon] = {**c, "url_canon": canon, "host": url_host(canon)}
    out = []
    for canon, c in best.items():
        if canon in seen_canon:
            continue
        rule = robots.get(c["host"]) if robots else None
        if rule is not None and ("allow" in rule or "disallow" in rule):
            # path-rule form (host -> {"allow": [...], "disallow": [...],
            # "crawl_delay"}) — same longest-match semantics as the engine
            from warcio_spark.kernels.robots import robots_allowed

            m = _PATH_RX.match(canon or "")
            path = m.group(1) if m else "/"
            allowed = robots_allowed(path, rule)
            delay = rule.get("crawl_delay")
        else:
            allowed = rule["allowed"] if rule is not None else True
            delay = rule["crawl_delay"] if rule is not None else None
        if delay is None:
            delay = cfg.default_crawl_delay
        if not allowed:
            continue
        c["crawl_delay"] = delay
        out.append(c)
    return out


def schedule(cands, seen_canon: set, robots: dict,
             cfg: OracleConfig | None = None):
    """One politeness round. Returns the ordered fetch list (dicts with
    fetch_order, host_rank, fetch_ts_offset)."""
    cfg = cfg or OracleConfig()
    eligible = prepare(cands, seen_canon, robots, cfg)

    by_host = {}
    for c in eligible:
        by_host.setdefault(c["host"], []).append(c)

    picked = []
    for host, items in by_host.items():
        items.sort(key=lambda c: (-c["priority"], c["seq"], c["url_canon"]))
        budget = cfg.budget(items[0]["crawl_delay"])
        for rank, c in enumerate(items[:budget], start=1):
            c["host_rank"] = rank
            c["fetch_ts_offset"] = round((rank - 1) * c["crawl_delay"], 3)
            picked.append(c)

    picked.sort(key=lambda c: (-c["priority"], c["seq"], c["url_canon"]))
    for i, c in enumerate(picked, start=1):
        c["fetch_order"] = i
    return picked


# recrawl candidates live above every other seq namespace (links < 2^47,
# redirects 2^47.., sitemaps 2^48..)
RECRAWL_SEQ_BASE = 1 << 50


def crawl(seed_cands, robots: dict, outlinks_fn, rounds: int,
          cfg: OracleConfig | None = None,
          recrawl_ttl: int | None = None,
          recrawl_priority: float = 95.0):
    """Multi-round oracle crawl. ``outlinks_fn(fetched_dict) -> list of
    candidate dicts`` must be the same deterministic function the Spark crawl
    uses. Returns (fetch_log, seen_canon):
    fetch_log = list of (round, fetch_order, url_canon).

    ``recrawl_ttl``: freshness semantics — a url blocks re-fetching only
    while ``round - last_fetch_round < ttl``; once aged out it is
    re-enqueued every round (priority=recrawl_priority, deterministic seq
    from the url's smallest historical seq) until refetched."""
    cfg = cfg or OracleConfig()
    seen = {}  # canon -> [last_fetch_round, min historical seq]
    frontier = list(seed_cands)
    log = []
    for r in range(1, rounds + 1):
        if recrawl_ttl:
            blocked = {c for c, (lr, _) in seen.items()
                       if lr > r - recrawl_ttl}
            due = [
                {
                    "url": c,
                    "priority": recrawl_priority,
                    "seq": RECRAWL_SEQ_BASE + (s0 % (1 << 40)),
                }
                for c, (lr, s0) in seen.items()
                if lr <= r - recrawl_ttl
            ]
        else:
            blocked = set(seen)
            due = []
        cands_in = frontier + due
        picked = schedule(cands_in, blocked, robots, cfg)
        if not picked:
            if recrawl_ttl:
                # idle round still ticks: urls keep aging toward the ttl
                frontier = list(prepare(cands_in, blocked, robots, cfg))
                continue
            break
        for c in picked:
            log.append((r, c["fetch_order"], c["url_canon"]))
            prev = seen.get(c["url_canon"])
            seen[c["url_canon"]] = [
                r, c["seq"] if prev is None else min(prev[1], c["seq"])
            ]
        # unscheduled candidates stay in the frontier; fetched pages emit
        # outlinks as new candidates
        blocked_after = blocked | {c["url_canon"] for c in picked}
        remaining = list(prepare(cands_in, blocked_after, robots, cfg))
        new = []
        for c in picked:
            new.extend(outlinks_fn(c))
        frontier = remaining + new
    return log, set(seen)
