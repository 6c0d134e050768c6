"""Queue-by-IP politeness: merge per-host crawl queues that resolve to
the same address, Heritrix-style.

Per-host politeness under-throttles when many virtual hosts share one
server: a thousand ``*.blogspot``-style vhosts each politely spaced
still hammer the single box behind them.  Production crawlers
(Heritrix's ``HostnameQueueAssignmentPolicy`` vs
``IpQueueAssignmentPolicy``) therefore optionally key the politeness
queue on the RESOLVED address instead of the hostname.  This module is
the frontier-side analog: given per-host queue stats and a resolution
table, collapse co-hosted queues, take the most conservative member
delay, and report each merged queue's drain time — the quantity the
scheduler budgets against (the slowest queue bounds crawl duration).

Scale shape: one broadcast-able equi join (the resolution table is
hosts-sized, i.e. tiny next to the URL mass the stats were aggregated
from) and one groupBy on the queue key — map-side combinable.  No UDF,
no explode, no skew risk beyond what the host distribution already had
(an IP with many vhosts still aggregates to ONE row; the merge happens
on pre-aggregated per-host rows, not per-URL rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ip_queue_budget(
    host_stats: DataFrame,
    resolution: DataFrame,
    default_delay: float = 1.0,
) -> DataFrame:
    """Merge per-host queues by resolved IP and budget their drain.

    ``host_stats``: (host, n_urls, crawl_delay) — queued URL count and
    the host's politeness delay in seconds (NULL -> ``default_delay``).

    ``resolution``: (host, ip) — resolved addresses.  A host absent
    from the table (or resolving to NULL) keeps a private queue keyed
    ``host:<host>``; resolved hosts merge under ``ip:<ip>``.

    Output, one row per politeness queue:

    - ``queue_key`` — ``ip:<ip>`` or ``host:<host>``;
    - ``n_hosts`` — distinct hosts feeding the queue;
    - ``n_urls`` — total queued URLs;
    - ``delay_s`` — the queue's effective delay: the MAX of member
      delays (the conservative merge — the strictest member's budget
      governs the shared server);
    - ``eta_s`` — drain estimate ``greatest(n_urls - 1, 0) * delay_s``
      (n fetches need n-1 politeness windows; the last fetch has no
      trailing wait);
    - ``hosts_preview`` — up to 5 member hosts, sorted, for operator
      eyeballs.
    """
    delay = F.coalesce(
        F.col("crawl_delay").cast("double"), F.lit(float(default_delay))
    )
    joined = host_stats.join(
        F.broadcast(resolution.filter(F.col("ip").isNotNull())),
        "host",
        "left",
    ).select(
        F.when(
            F.col("ip").isNotNull(), F.concat(F.lit("ip:"), F.col("ip"))
        ).otherwise(F.concat(F.lit("host:"), F.col("host"))).alias("queue_key"),
        F.col("host"),
        F.col("n_urls").cast("long").alias("n_urls"),
        delay.alias("delay_s"),
    )
    # n_hosts and the preview both come off ONE collected set — a
    # count_distinct alongside the other aggregates would compile to the
    # two-exchange expand plan; this keeps one shuffle
    agg = joined.groupBy("queue_key").agg(
        F.sum("n_urls").alias("n_urls"),
        F.max("delay_s").alias("delay_s"),
        F.array_sort(F.collect_set("host")).alias("hosts"),
    )
    eta = F.greatest(F.col("n_urls") - 1, F.lit(0)) * F.col("delay_s")
    return agg.select(
        "queue_key",
        F.size("hosts").alias("n_hosts"),
        "n_urls",
        F.round("delay_s", 6).alias("delay_s"),
        F.round(eta, 6).alias("eta_s"),
        F.slice("hosts", 1, 5).alias("hosts_preview"),
    )
