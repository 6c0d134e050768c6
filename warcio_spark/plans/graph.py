"""Host-graph analytics over discovered links: edge aggregation and a
PageRank-style power iteration for crawl prioritization.

Link-derived importance is a standard crawl-scheduling input (OPIC /
PageRank-ordered frontiers): hosts that accumulate in-link mass get
budget before hosts nobody points at. The reference ecosystem produces
the raw material for this (WAT link blocks / outlink extraction); these
operators turn it into a ranked host table that
plans.frontier.schedule_round can join as a priority source.

Scale shape: ``host_graph`` is one shuffle on (src_host, dst_host);
``host_rank`` is one join + one aggregation per iteration, all keyed by
host — the host universe is orders of magnitude smaller than the page
universe (the whole point of ranking at host granularity for a
frontier), so every stage shuffles the small aggregated table, never
per-link rows. No driver-side loops over data: the only driver values
are the node count and the fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def url_host(url) -> Column:
    """Host component of an absolute URL (lowercased; port/userinfo
    dropped) — NULL for non-URL strings, as a codegen expression."""
    col = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(col, _HOST_RE, 1))
    return F.nullif(h, F.lit(""))


def host_graph(links: DataFrame, src_col: str = "page_url",
               dst_col: str = "outlink") -> DataFrame:
    """(src_host, dst_host, n_links) edges from per-link rows
    (extract_outlinks output or any table with source/target URL
    columns). Self-edges (intra-host navigation) are kept — callers
    ranking across hosts filter them; rows where either side has no
    parseable host are dropped."""
    return (
        links.select(
            url_host(src_col).alias("src_host"),
            url_host(dst_col).alias("dst_host"),
        )
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_rank(edges: DataFrame, iterations: int = 3,
              alpha: float = 0.85, self_edges: bool = False) -> DataFrame:
    """Weighted PageRank power iteration over host_graph edges:
    ``rank' = (1-alpha)/N + alpha * sum(rank(src) * w / outweight(src))``
    over in-edges, starting uniform at 1/N. Returns (host, rank).

    Simplifications, stated so results are reproducible: dangling-host
    mass is NOT redistributed (hosts with no out-edges leak their alpha
    share — fine for ordering a frontier, not for a probability
    distribution), and ``iterations`` is a fixed hop count rather than a
    convergence test (each iteration is one shuffle; a frontier wants a
    bounded, deterministic plan). ``self_edges=False`` drops intra-host
    links first — for prioritization they are rank self-inflation.
    """
    if not self_edges:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outw = edges.groupBy("src_host").agg(F.sum("n_links").alias("_outw"))
    frac = edges.join(outw, "src_host").select(
        F.col("src_host"),
        F.col("dst_host"),
        (F.col("n_links").cast("double") / F.col("_outw")).alias("_frac"),
    )
    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - alpha) / n
    for _ in range(max(0, iterations)):
        contrib = (
            frac.join(ranks, frac.src_host == ranks.host)
            .groupBy("dst_host")
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes.host == contrib.dst_host, "left")
            .select(
                "host",
                (F.lit(base)
                 + F.lit(alpha) * F.coalesce(F.col("_in"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return ranks
