"""Conditional-GET revalidation: HTTP cache validators for recrawl.

A freshness-aware crawler (Heritrix's FetchHistoryProcessor shape,
wget -N) does not blindly re-download a due url: it stores the last
response's cache validators and re-requests conditionally — the server
answers 304 Not Modified and the crawler keeps (and revisit-records)
the prior capture. Per RFC 9110 §13.1.1-13.1.3 the conditional headers
echo the STORED field values verbatim: ``If-None-Match`` carries the
last ``ETag`` (weak prefix and quotes included), ``If-Modified-Since``
carries the last ``Last-Modified`` byte-for-byte.

Like retry (plans/retry.py), this is a COMPOSABLE layer over the
parity-pinned ``crawl()`` loop: build ``validators_table`` from the
archived responses (or maintain it incrementally per round alongside
the seen-set — at 10^10 urls store it partitioned by fetch_round like
the compacted seen snapshot so the due-side join prunes to stale
partitions), then ``conditional_requests`` decorates ``recrawl_due``'s
output with the request headers to send.

Scale shape: validators_table is one partial-aggregated groupBy on the
url (max over (warc_ts, ...) structs — latest capture wins, no window,
no join); conditional_requests is one equi join keyed on the url with
the due side typically orders of magnitude smaller.

Reference analog: warcio itself archives what capture_http fetched;
the validator echo contract here matches what its recorded requests
carry (/root/reference/warcio/capture_http.py records request headers
verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcio_spark import functions as WF


def validators_table(records: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-url cache validators from archived responses: (url,
    last_fetch_ts, etag, last_modified) of the LATEST capture (max
    warc_ts; exact-timestamp ties resolve deterministically by the
    struct's remaining fields). The latest capture wins wholesale — if
    it carries no validators the url has none, even when an older
    capture did (stale validators must not produce false 304s)."""
    resp = records.filter(F.col("rec_type") == "response")
    cap = F.struct(
        F.col("warc_ts").alias("ts"),
        WF.header_get("http_headers", "ETag").alias("etag"),
        WF.header_get("http_headers", "Last-Modified").alias("lm"),
    )
    return (
        resp.select(F.col(url_col).alias("url"), cap.alias("_cap"))
        .groupBy("url")
        .agg(F.max("_cap").alias("_cap"))
        .select(
            "url",
            F.col("_cap.ts").alias("last_fetch_ts"),
            F.col("_cap.etag").alias("etag"),
            F.col("_cap.lm").alias("last_modified"),
        )
    )


def conditional_requests(due: DataFrame, validators: DataFrame,
                         url_col: str = "url") -> DataFrame:
    """Decorate due urls with the conditional request headers to send:
    ``if_none_match`` (stored ETag verbatim), ``if_modified_since``
    (stored Last-Modified verbatim), and ``revalidate`` — true when at
    least one validator exists (send the conditional GET), false for
    never-seen-or-validator-less urls (plain GET). All ``due`` columns
    carry through."""
    v = validators.select(
        F.col("url").alias("_vurl"),
        F.col("etag").alias("if_none_match"),
        F.col("last_modified").alias("if_modified_since"),
    )
    j = due.join(v, due[url_col] == v["_vurl"], "left").drop("_vurl")
    return j.withColumn(
        "revalidate",
        F.col("if_none_match").isNotNull()
        | F.col("if_modified_since").isNotNull(),
    )


def not_modified_revisits(responses: DataFrame, validators: DataFrame,
                          url_col: str = "url") -> DataFrame:
    """Rewrite 304 Not Modified responses as revisit records with the
    ``server-not-modified`` WARC profile (the standard way a
    revalidating crawler archives an unchanged page): WARC-Refers-To-*
    point at the url's last stored capture from ``validators`` (the
    same table ``conditional_requests`` used). Non-304 records pass
    through untouched. A 304 whose url somehow lacks a validators row
    (pathological — the crawler only sends conditionals it has
    validators for) falls back to its own capture time.

    The 304 rewrite differs from digest dedup: the payload is already
    empty (304 has no body) and the profile asserts the SERVER's claim,
    not a digest match — so the block/payload digest headers are
    dropped rather than recomputed."""
    from warcio_spark.operators.dedup import _rewrite_flagged_revisits

    is304 = (F.col("rec_type") == "response") & (
        WF.statuscode("http_statusline") == 304)
    hit = responses.filter(is304)
    miss = responses.filter(~F.coalesce(is304, F.lit(False)))

    v = validators.select(
        F.col("url").alias("_vurl"),
        F.col("last_fetch_ts").alias("_vts"),
    )
    flagged = (
        hit.join(v, hit[url_col] == v["_vurl"], "left").drop("_vurl")
        .withColumn("_orig_url", F.col(url_col))
        .withColumn("_orig_ts", F.coalesce(F.col("_vts"), F.col("warc_ts")))
        .withColumn("_is_dup", F.lit(True))
    )
    rewritten = _rewrite_flagged_revisits(
        flagged, ["_orig_url", "_orig_ts", "_is_dup", "_vts"],
        profile=_SERVER_NOT_MODIFIED)
    return rewritten.unionByName(miss)


_SERVER_NOT_MODIFIED = (
    "http://netpreserve.org/warc/1.0/revisit/server-not-modified"
)


# ---------------------------------------------------------------------------
# RFC 9111 freshness: how LONG a capture stays fresh, from its own
# response headers — the per-url TTL signal that upgrades the crawl
# loop's single global recrawl_ttl into header-driven scheduling.

_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

# IMF-fixdate only (RFC 9110 §5.6.7 preferred form; the obsolete
# rfc850/asctime forms parse to NULL — modern servers do not emit them).
# The weekday token is matched but ignored, like every real parser.
_IMF_RX = ("^[A-Za-z]{3}, (\\d{2}) ([A-Za-z]{3}) (\\d{4}) "
           "(\\d{2}):(\\d{2}):(\\d{2}) GMT$")


def http_date_epoch(col) -> Column:
    """IMF-fixdate HTTP-date -> UTC epoch seconds, NULL on no-parse.

    Same TZ-free integer-arithmetic contract as
    ``links.w3c_datetime_epoch`` (see there): days-since-epoch via the
    date type plus plain seconds, identical under any Spark session
    timezone and mirrored exactly by the DuckDB oracles."""
    col = F.col(col) if isinstance(col, str) else col
    t = F.trim(col)

    def g(i: int):
        return F.nullif(F.regexp_extract(t, _IMF_RX, i), F.lit(""))

    mon = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), g(2)).cast("int")
    days = F.datediff(
        F.try_to_date(
            F.concat_ws("-", g(3), F.lpad(mon.cast("string"), 2, "0"),
                        g(1))),
        F.lit("1970-01-01"))
    # array_position returns 0 (not NULL) for an unknown month name; the
    # lpad('00') date then fails try_to_date -> NULL, as it should
    return (days.cast("long") * 86400
            + g(4).cast("int") * 3600
            + g(5).cast("int") * 60
            + g(6).cast("int"))


def freshness_lifetime(headers, heuristic_frac: float = 0.1) -> Column:
    """Freshness lifetime in SECONDS of a response, per RFC 9111 §4.2.1
    precedence, as pure codegen expressions over the parsed headers
    array:

    1. ``Cache-Control: no-store`` / ``no-cache`` -> 0 (always
       revalidate; the qualified ``no-cache="field"`` form is treated
       as bare no-cache — conservative for a crawler);
    2. ``s-maxage=N`` (a crawl archive is a shared cache), then
       ``max-age=N`` — first directive occurrence, quoted form
       accepted, negative impossible by grammar;
    3. ``Expires`` header present: ``Expires - Date`` clamped at 0 when
       both parse as IMF-fixdate, else 0 (RFC 9111 §5.3: an invalid or
       ungrounded Expires means already stale);
    4. heuristic (§4.2.2): ``heuristic_frac x (Date - Last-Modified)``
       clamped at 0, when both parse;
    5. NULL — no freshness information (caller falls back to the global
       recrawl TTL).
    """
    cc = F.lower(F.coalesce(WF.header_get(headers, "Cache-Control"),
                            F.lit("")))
    smax = F.nullif(
        F.regexp_extract(cc, "\\bs-maxage\\s*=\\s*\"?(\\d+)", 1),
        F.lit("")).cast("long")
    maxage = F.nullif(
        F.regexp_extract(cc, "\\bmax-age\\s*=\\s*\"?(\\d+)", 1),
        F.lit("")).cast("long")
    expires_raw = WF.header_get(headers, "Expires")
    expires_e = http_date_epoch(expires_raw)
    date_e = http_date_epoch(WF.header_get(headers, "Date"))
    lm_e = http_date_epoch(WF.header_get(headers, "Last-Modified"))
    return (
        F.when(cc.rlike("\\bno-store\\b|\\bno-cache\\b"), F.lit(0).cast("long"))
        .when(smax.isNotNull(), smax)
        .when(maxage.isNotNull(), maxage)
        .when(expires_raw.isNotNull(),
              F.coalesce(F.greatest(expires_e - date_e,
                                    F.lit(0).cast("long")),
                         F.lit(0).cast("long")))
        .when(lm_e.isNotNull() & date_e.isNotNull(),
              F.greatest((F.lit(float(heuristic_frac))
                          * (date_e - lm_e)).cast("long"),
                         F.lit(0).cast("long")))
    )


def freshness_table(records: DataFrame, url_col: str = "url",
                    heuristic_frac: float = 0.1) -> DataFrame:
    """Per-url freshness from archived responses: (url, last_fetch_ts,
    lifetime_s, stale_at) of the LATEST capture — same latest-wins
    max-struct aggregation as ``validators_table`` (one partial-agg
    groupBy, no window, no join). ``stale_at`` = capture epoch +
    lifetime (NULL lifetime -> NULL stale_at: no header signal).

    Composition with the 10^10 crawl loop: bucket ``lifetime_s`` into
    TTL classes and store the class as a partition column next to
    fetch_round in the compacted seen snapshot — ``recrawl_due`` then
    prunes each class at its own cutoff instead of one global ttl, and
    ``due_by_freshness`` is the small-scale/exact form of that read."""
    resp = records.filter(F.col("rec_type") == "response")
    cap = F.struct(
        F.col("warc_ts").alias("ts"),
        freshness_lifetime("http_headers", heuristic_frac).alias("life"),
    )
    from warcio_spark.operators.links import _ts14_epoch_s

    fetched = _ts14_epoch_s(F.col("_cap.ts"))
    return (
        resp.select(F.col(url_col).alias("url"), cap.alias("_cap"))
        .groupBy("url")
        .agg(F.max("_cap").alias("_cap"))
        .select(
            "url",
            F.col("_cap.ts").alias("last_fetch_ts"),
            F.col("_cap.life").alias("lifetime_s"),
            (fetched + F.col("_cap.life")).alias("stale_at"),
        )
    )


def due_by_freshness(freshness: DataFrame, as_of_epoch: int,
                     default_ttl_s: int) -> DataFrame:
    """Urls whose capture has outlived its freshness at ``as_of_epoch``:
    header-driven lifetime when present, ``default_ttl_s`` past the
    capture otherwise. A pure filter over ``freshness_table`` output —
    no shuffle; at scale this is the TTL-class partition-pruned read
    described in ``freshness_table``."""
    from warcio_spark.operators.links import _ts14_epoch_s

    fetched = _ts14_epoch_s(F.col("last_fetch_ts"))
    effective = F.coalesce(
        F.col("stale_at"), fetched + F.lit(int(default_ttl_s)))
    return freshness.filter(effective <= F.lit(int(as_of_epoch)))


def change_rate_table(index: DataFrame, urlkey_col: str = "urlkey",
                      ts_col: str = "timestamp",
                      digest_col: str = "digest") -> DataFrame:
    """Per-url change-rate estimation from capture history — the
    adaptive-recrawl input: a url whose payload digest changed in 9 of
    10 captures deserves a short revisit interval, one that never
    changed can wait (Cho & Garcia-Molina, "Estimating Frequency of
    Change", TOIT 2003 — the estimator every incremental-crawl
    scheduler descends from; Heritrix's wait-interval multiplier is
    the ad-hoc version of the same signal).

    Per urlkey over captures in (epoch, digest) order: ``n_changes`` =
    adjacent digest transitions (the LAG semantics ``collapse_captures``
    filters by), and ``change_rate_per_day`` = the Poisson-corrected
    estimator  -ln((n - X + 0.5) / (n + 0.5)) / mean_interval  — which
    de-biases the naive X/n for changes that happened between captures
    and were observed only once (NULL when fewer than 2 captures or
    zero span). ``est_interval_days`` inverts it (NULL when no change
    was ever observed — the estimator's rate is 0 there). Feed it into
    ``due_by_freshness``-style scheduling or the recrawl_ttl as a
    per-url override.

    Scale shape: ONE window (lag) + ONE aggregation, both keyed on
    urlkey — a single shuffle of the capture index (shuffle-free over
    the urlkey-sorted columnar CDX table), then pure scalar math on
    the urlkey-cardinality aggregate."""
    from pyspark.sql import Window

    epoch = F.unix_timestamp(
        F.try_to_timestamp(F.col(ts_col), F.lit("yyyyMMddHHmmss")))
    w = Window.partitionBy("urlkey").orderBy("_epoch", "_dig")
    rows = index.select(
        F.col(urlkey_col).alias("urlkey"), epoch.alias("_epoch"),
        F.col(digest_col).alias("_dig"),
    ).withColumn(
        "_chg",
        F.when(F.lag("_dig").over(w).isNull(), F.lit(0))
        .when(F.col("_dig") != F.lag("_dig").over(w), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = rows.groupBy("urlkey").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum("_chg").alias("n_changes"),
        (F.max("_epoch") - F.min("_epoch")).alias("span_s"),
    )
    n, x = F.col("n_captures"), F.col("n_changes")
    mean_iv = F.when(
        (n > 1) & (F.col("span_s") > 0),
        F.col("span_s") / (n - 1).cast("double"))
    rate_day = -F.log((n - x + 0.5) / (n + 0.5)) / mean_iv * 86400.0
    return agg.select(
        "urlkey", "n_captures", "n_changes", "span_s",
        F.round(mean_iv, 4).alias("mean_interval_s"),
        F.round(rate_day, 8).alias("change_rate_per_day"),
        F.round(F.when(rate_day > 0, 1.0 / rate_day), 6)
        .alias("est_interval_days"),
    )


# sitemaps.org changefreq -> prior revisit interval in days. "always"
# (changes on every access) gets half the hourly interval; "never" is a
# claim, not a schedule — it contributes NO prior (takedown/audit
# crawls ignore it anyway) but flows through in `changefreq`.
CHANGEFREQ_PRIOR_DAYS = {
    "always": 1.0 / 48, "hourly": 1.0 / 24, "daily": 1.0,
    "weekly": 7.0, "monthly": 30.0, "yearly": 365.0,
}


def recrawl_priors(entries: DataFrame, observed: DataFrame | None = None,
                   *, url_col: str = "loc",
                   obs_url_col: str = "urlkey",
                   obs_interval_col: str = "est_interval_days") -> DataFrame:
    """Per-url revisit intervals: the site's own ``<changefreq>`` claim
    (``sitemap_entries`` output) as the PRIOR, overridden by the
    measured ``change_rate_table`` interval once capture history exists
    — the scheduling rule every incremental crawler converges on
    (sitemaps claims are aspirational; Google's documentation says it
    largely ignores changefreq BECAUSE observed change wins — this
    operator is that policy as a table).

    A url listed in several sitemaps reduces to its most aggressive
    claim (min prior interval) and max priority. Returns (url,
    changefreq, priority, prior_interval_days, observed_interval_days,
    effective_interval_days, interval_source) where source is
    'observed' > 'sitemap' > NULL (no signal either way — the caller's
    default TTL applies).

    Scale shape: one map-combinable aggregation on the url + one equi
    join against the observed table (url-keyed both sides; broadcast it
    when the observed universe is small, e.g. a single host's
    history). The changefreq map compiles to a literal CASE — no lookup
    table crosses the wire."""
    prior_iv = F.lit(None).cast("double")
    for k, v in CHANGEFREQ_PRIOR_DAYS.items():
        prior_iv = F.when(F.col("changefreq") == k, F.lit(v)).otherwise(
            prior_iv)
    per_url = (
        entries.select(F.col(url_col).alias("url"), "changefreq",
                       F.col("priority").cast("double").alias("priority"))
        .withColumn("_prior", prior_iv)
        .groupBy("url")
        .agg(
            # deterministic even when priors tie (struct min breaks ties
            # on the changefreq string; '~' sorts after every enum value)
            F.min(F.struct(
                F.coalesce("_prior", F.lit(1e18)).alias("p"),
                F.coalesce("changefreq", F.lit("~")).alias("cf"),
            )).alias("_best"),
            F.max("priority").alias("priority"),
            F.min("_prior").alias("prior_interval_days"),
        )
        .withColumn("changefreq",
                    F.nullif(F.col("_best.cf"), F.lit("~")))
        .drop("_best")
    )
    if observed is None:
        obs = None
    else:
        obs = observed.select(
            F.col(obs_url_col).alias("url"),
            F.col(obs_interval_col).cast("double")
            .alias("observed_interval_days"))
    if obs is not None:
        per_url = per_url.join(obs, "url", "left")
    else:
        per_url = per_url.withColumn(
            "observed_interval_days", F.lit(None).cast("double"))
    eff = F.coalesce("observed_interval_days", "prior_interval_days")
    return per_url.select(
        "url", "changefreq", "priority", "prior_interval_days",
        "observed_interval_days",
        eff.alias("effective_interval_days"),
        F.when(F.col("observed_interval_days").isNotNull(),
               F.lit("observed"))
        .when(F.col("prior_interval_days").isNotNull(), F.lit("sitemap"))
        .alias("interval_source"),
    )
