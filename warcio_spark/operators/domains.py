"""Domain-level corpus curation: registered-domain extraction and
per-domain quality aggregation/filtering — the RefinedWeb/C4-style
"judge the site, not just the page" stage of a webtext pipeline (bad
domains are dropped wholesale; borderline pages ride on their domain's
reputation).

Reference scope: the reference library stops at record IO; this is the
curation tier above it, same layer as operators/pipeline.

Scale shape: the stats table is #domains-sized (millions when the
corpus is billions), built by ONE partial-aggregated groupBy on the
domain; the filter join back is broadcastable in the common case and an
ordinary equi join otherwise. ``registered_domain`` is pure codegen —
no lookup table crosses the wire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcio_spark.plans.scope import host_tail2

# Common multi-label public suffixes. The full Public Suffix List is
# ~10k entries and changes monthly — callers with PSL fidelity needs
# pass their own tuple; this default covers the high-traffic ccTLD
# second-level registries so `bbc.co.uk` and `smh.com.au` do not
# collapse into `co.uk` / `com.au` buckets.
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "edu.cn", "gov.cn",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "com.mx", "com.ar", "com.tw", "com.tr", "com.sg", "com.hk",
    "co.za", "co.nz", "org.nz", "co.th", "co.id",
)


def registered_domain(
        host, multi_suffixes: tuple = DEFAULT_MULTI_SUFFIXES) -> Column:
    """The registrable domain of a host: the two-label tail, except when
    that tail is itself a multi-label public suffix (``co.uk``) — then
    the three-label tail. A pure codegen expression: the suffix set
    compiles to one IN list, no join, no UDF. Hosts with fewer labels
    than the rule wants return what they have (``host_tail2`` semantics:
    a bare label is its own tail)."""
    h = F.col(host) if isinstance(host, str) else host
    tail2 = host_tail2(h)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    tail3 = F.array_join(
        F.slice(labels, F.greatest(n - 2, F.lit(1)), F.lit(3)), ".")
    return F.when(
        tail2.isin(*multi_suffixes), tail3).otherwise(tail2)


def domain_stats(df: DataFrame, domain_col: str = "domain",
                 score_col: str = "score",
                 low_threshold: float = 0.0) -> DataFrame:
    """Per-domain quality aggregate: (domain, n_docs, mean_score,
    min_score, max_score, frac_low) with ``frac_low`` the fraction of
    docs scoring strictly below ``low_threshold``. One map-side-combined
    groupBy; NULL scores count toward n_docs but not toward any score
    statistic (SQL aggregate semantics), and a NULL score is never
    "low"."""
    s = F.col(score_col).cast("double")
    return df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(s).alias("mean_score"),
        F.min(s).alias("min_score"),
        F.max(s).alias("max_score"),
        F.avg(F.when(s < float(low_threshold), 1.0).otherwise(
            F.when(s.isNotNull(), 0.0))).alias("frac_low"),
    )


def filter_by_domain_stats(
        df: DataFrame, stats: DataFrame, *,
        domain_col: str = "domain",
        min_docs: int = 1,
        min_mean: float | None = None,
        max_frac_low: float | None = None,
        broadcast_stats: bool = True) -> DataFrame:
    """Keep only docs whose domain passes the site-level gates: at
    least ``min_docs`` observations (below that the domain is unjudged
    and KEPT — a one-page domain shouldn't die to variance), and, when
    judged, ``mean_score >= min_mean`` / ``frac_low <= max_frac_low``.
    Implemented as one left join against the (broadcast by default)
    stats table + a codegen predicate; schema passes through."""
    verdict = stats.select(
        F.col("domain").alias("_sd"),
        ((F.col("n_docs") < int(min_docs))
         | ((F.lit(True) if min_mean is None
             else F.col("mean_score") >= float(min_mean))
            & (F.lit(True) if max_frac_low is None
               else F.coalesce(F.col("frac_low")
                               <= float(max_frac_low), F.lit(True))))
         ).alias("_keep"),
    )
    if broadcast_stats:
        verdict = F.broadcast(verdict)
    out = df.join(verdict, df[domain_col] == verdict["_sd"], "left")
    # a domain absent from stats is unjudged -> kept
    return out.filter(F.coalesce(F.col("_keep"), F.lit(True))).drop(
        "_sd", "_keep")


def host_content_census(docs: DataFrame, host_col: str = "host",
                        text_col: str = "text", *,
                        min_pages: int = 20,
                        top_share_threshold: float = 0.8,
                        thin_bytes: int = 512) -> DataFrame:
    """Per-host content-diversity census — the set-at-a-time detector
    for parked domains, soft-404 hosts, and error-page farms: a host
    where one body dominates every url (the registrar lander, the
    custom "not found" page served with HTTP 200, the login wall) is
    serving the CRAWLER the same page no matter what it asks for, and
    per-page quality scores can't see that because each page looks
    fine in isolation. Production pipelines cut these wholesale
    (CCNet/RefinedWeb-style site hygiene; Heritrix crawls probe a
    known-bogus url for the same reason — this is the probe-free,
    corpus-side equivalent).

    Returns (host, n_pages, n_distinct, top_cnt, top_share, thin_share,
    parked): ``top_share`` is the share of pages carrying the host's
    single most common body (exact MD5 — near-dup variants are the
    dedup layer's job, a parked lander is byte-identical),
    ``thin_share`` the share under ``thin_bytes``, and ``parked`` fires
    when the host has at least ``min_pages`` observations AND
    ``top_share >= top_share_threshold`` (small hosts stay unjudged —
    two pages agreeing is not evidence). NULL text hashes as the empty
    body. Feed ``parked`` hosts into the frontier rules table or
    ``filter_by_domain_stats``-style gates.

    Scale shape: two map-side-combinable aggregations — (host, body
    hash) counts, then host rollup — so the corpus shuffles once on
    (host, hash) and the second shuffle carries only distinct-body
    rows; no window over page-cardinality data, and a mega-host's
    identical bodies collapse in the partial aggregate before they
    travel."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary"))
    per_body = docs.groupBy(
        F.col(host_col).alias("host"), h.alias("_h")
    ).agg(
        F.count(F.lit(1)).alias("_cnt"),
        # octet_length: thin_bytes means BYTES — 300 CJK chars are
        # ~900 UTF-8 bytes and must not count as thin at the default
        F.min(F.octet_length(F.coalesce(F.col(text_col), F.lit(""))))
        .alias("_len"),
    )
    out = per_body.groupBy("host").agg(
        F.sum("_cnt").alias("n_pages"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_cnt").alias("top_cnt"),
        (F.max("_cnt") / F.sum("_cnt")).alias("top_share"),
        (F.sum(F.when(F.col("_len") < int(thin_bytes), F.col("_cnt"))
               .otherwise(F.lit(0))) / F.sum("_cnt")).alias("thin_share"),
    )
    return out.withColumn(
        "parked",
        (F.col("n_pages") >= int(min_pages))
        & (F.col("top_share") >= float(top_share_threshold)),
    )


def mirror_hosts(docs: DataFrame, min_shared: int = 3, max_hosts: int = 64,
                 host_col: str = "host", text_col: str = "text") -> DataFrame:
    """Mirror / white-label detection: host pairs that serve the same
    content. Two hosts sharing many exact content digests are mirrors of
    one another (CDN aliases, scraped re-publishers, parked white-labels) —
    a crawler should collapse the pair to one budget and a training-data
    pipeline should count the content once. Emits one row per unordered
    host pair with ``shared_docs`` (distinct shared digests) and
    ``overlap_jaccard`` = shared / (|A| + |B| - shared).

    Scale shape (100 TB): everything keys on the content digest —
    (host, digest) is distinct'd first (one shuffle), then a digest-frequency
    pass drops singletons AND ubiquitous digests (``max_hosts`` caps the
    quadratic blowup a boilerplate page shared by 10^5 hosts would cause:
    pairs-per-digest is bounded by max_hosts^2, and a digest on that many
    hosts is template noise, not a mirror signal). The self-join then runs
    on the surviving (host, digest) table keyed by digest — co-partitioned,
    no broadcast of anything corpus-sized — and the per-host totals joined
    for the Jaccard are a #hosts-sized broadcast.
    """
    host, sig = F.col(host_col), F.md5(F.col(text_col)).alias("sig")
    hs = docs.select(host.alias("h"), sig).distinct()
    freq = hs.groupBy("sig").agg(F.count("*").alias("_nh")).filter(
        (F.col("_nh") >= 2) & (F.col("_nh") <= max_hosts))
    cand = hs.join(freq.select("sig"), "sig")
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(b, (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.h") < F.col("b.h")))
        .groupBy(F.col("a.h").alias("host_a"), F.col("b.h").alias("host_b"))
        .agg(F.count("*").alias("shared_docs"))
        .filter(F.col("shared_docs") >= min_shared)
    )
    totals = hs.groupBy("h").agg(F.count("*").alias("n"))
    return (
        pairs.join(F.broadcast(totals.withColumnRenamed("h", "host_a")
                               .withColumnRenamed("n", "_na")), "host_a")
        .join(F.broadcast(totals.withColumnRenamed("h", "host_b")
                          .withColumnRenamed("n", "_nb")), "host_b")
        .select(
            "host_a", "host_b", "shared_docs",
            F.round(
                F.col("shared_docs")
                / (F.col("_na") + F.col("_nb") - F.col("shared_docs")), 4
            ).alias("overlap_jaccard"),
        )
    )
