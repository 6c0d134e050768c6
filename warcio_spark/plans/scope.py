"""Crawl scope rules: which discovered URLs belong to the crawl.

Semantics follow the publicly-documented browsertrix-crawler /
pywb scope model: a seed list plus a ``scopeType`` —

- ``host``: same host as a seed;
- ``domain``: a seed's host or any subdomain of it;
- ``prefix``: URL starts with a seed's directory prefix (the seed URL
  truncated after its last ``/``);
- ``any``: no include restriction (excludes still apply);

with an always-applied exclude regex list.

Scale shapes (the point): every include test is an EQUI-join against
the (broadcastable) seed table — never a nested-loop condition:

- host: one semi-join on the candidate's host;
- domain: one semi-join whose EQUI key is the two-label tail of the
  host (``a.b.example.com -> example.com``) with the subdomain test as
  the hash join's residual predicate over the (grouped, small) seed
  hosts sharing that tail — "endswith any seed domain" never becomes a
  nested loop;
- prefix: the same shape keyed on the full host (a seed's prefix pins
  its host), residual = ``startswith`` over that host's few prefixes;
- excludes: literal ``rlike`` chain, whole-stage codegen, no join.

Single-label seed hosts (``localhost``) match subdomains only when the
candidate shares the same two-label tail — a documented edge of the
equi-key choice; real domain seeds carry >= 2 labels.

Reference scope: the reference library stops at record IO; scoping is
the crawl-ecosystem layer above it (same tier as plans/frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcio_spark.functions import url_host_expr

SCOPE_TYPES = ("host", "domain", "prefix", "any")


def seed_prefix_expr(url) -> Column:
    """The browsertrix 'prefix' of a seed URL: everything up to and
    including the last ``/`` of the path (a seed ending in a path
    segment scopes to its directory)."""
    u = F.col(url) if isinstance(url, str) else url
    # strip query/fragment, then cut after the last '/' (the scheme's
    # '//' never wins: any path URL has a later slash; a bare
    # 'http://host' keeps itself and gains one)
    base = F.regexp_replace(u, r"[?#].*$", "")
    has_path_slash = F.instr(F.regexp_replace(base, r"^[a-z]+://", ""), "/") > 0
    return F.when(
        has_path_slash, F.regexp_replace(base, r"/[^/]*$", "/")
    ).otherwise(F.concat(base, F.lit("/")))


def host_tail2(host) -> Column:
    """The two-label tail of a host (``a.b.example.com -> example.com``;
    a single-label host is its own tail) — the domain-scope equi key."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.array_join(
        F.slice(labels, F.greatest(n - 1, F.lit(1)), F.lit(2)), ".")


def seed_table(seeds: DataFrame, url_col: str = "url") -> DataFrame:
    """Normalize a seed list into (seed_url, seed_host, seed_prefix) —
    computed once, broadcast everywhere."""
    return seeds.select(
        F.col(url_col).alias("seed_url"),
        url_host_expr(url_col).alias("seed_host"),
        seed_prefix_expr(url_col).alias("seed_prefix"),
    ).filter(F.col("seed_host").isNotNull()).distinct()


def scope_filter(
    cands: DataFrame,
    seeds: DataFrame,
    scope_type: str = "prefix",
    *,
    url_col: str = "url",
    excludes: tuple = (),
) -> DataFrame:
    """Candidates surviving the scope: include by ``scope_type`` against
    ``seeds`` (a DataFrame with a ``url`` column), then drop rows
    matching any exclude regex. Candidate URLs are assumed canonical
    (run ``functions.with_canonical_url`` upstream — same contract as
    the frontier)."""
    if scope_type not in SCOPE_TYPES:
        raise ValueError(
            f"scope_type must be one of {SCOPE_TYPES}, got {scope_type!r}")
    st = seed_table(seeds, url_col="url" if "url" in seeds.columns else url_col)
    out = cands
    if scope_type != "any":
        out = out.withColumn("_host", url_host_expr(url_col))
        if scope_type == "host":
            hosts = F.broadcast(st.select("seed_host").distinct())
            out = out.join(
                hosts, F.col("_host") == F.col("seed_host"), "left_semi")
        elif scope_type == "domain":
            tails = F.broadcast(
                st.select(host_tail2("seed_host").alias("_tail"), "seed_host")
                .groupBy("_tail")
                .agg(F.collect_set("seed_host").alias("_seed_hosts"))
            )
            cand_host = F.col("_host")
            cond = (host_tail2(cand_host) == F.col("_tail")) & F.exists(
                F.col("_seed_hosts"),
                lambda h: (cand_host == h)
                | cand_host.endswith(F.concat(F.lit("."), h)),
            )
            out = out.join(tails, cond, "left_semi")
        else:  # prefix
            pfx = F.broadcast(
                st.select("seed_host", "seed_prefix")
                .groupBy("seed_host")
                .agg(F.collect_set("seed_prefix").alias("_prefixes"))
            )
            cond = (F.col("_host") == F.col("seed_host")) & F.exists(
                F.col("_prefixes"),
                lambda p: F.col(url_col).startswith(p),
            )
            out = out.join(pfx, cond, "left_semi")
        out = out.drop("_host")
    for rx in excludes:
        out = out.filter(
            ~F.coalesce(F.col(url_col).rlike(rx), F.lit(False)))
    return out
