"""Fetch-failure retry scheduling with exponential backoff.

A production crawler does not treat every fetch attempt as final: a
transient failure (connection reset, 408/429 throttle, 5xx) re-enters
the frontier after a backoff that doubles per consecutive failure and
is abandoned after a bounded number of attempts, while a permanent
failure (other 4xx) is dropped immediately. The core ``crawl()`` loop
(plans/crawl.py) deliberately stays fetch-outcome-agnostic — its exact
ordering/seen parity vs the reference oracle crawler is pinned — so
retry is a COMPOSABLE layer: run ``retry_due`` over the fetch log and
union the due rows into the next round's seed/candidate set (they
re-enter through the normal canonicalize -> politeness path; the
seen-set does not block them because scheduling, not success, wrote
them there — feed them as ``seeds`` with ``resume=True``, the same
re-entry path ``recrawl_due`` uses for freshness).

Semantics (one attempt per (url, round); the scheduler never issues
two attempts for one url in one round):

- class of a status: success (200-399), retryable (408, 429, 5xx, or
  status <= 0 — the network-error convention), permanent (the rest);
- only the LATEST attempt decides liveness: latest success or
  permanent ends the url's retry life;
- ``n_failures`` counts retryable attempts AFTER the last success
  (a url that failed, succeeded, then failed again restarts at 1);
- ``next_due_round = last_round + min(base_backoff**(n_failures - 1),
  max_backoff)`` (first retry next round at base 2: +1, then +2, +4,
  ... capped — uncapped exponentials overflow and are never what a
  scheduler wants anyway);
- due iff the latest attempt was retryable, ``n_failures <
  max_attempts``, and ``as_of_round >= next_due_round``.

Scale shape: one window + one aggregation, both keyed on the url —
a single shuffle on a uniform key (the window's partitioning is
reused by the groupBy), O(log rows), no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["status_class", "retry_report", "retry_due",
           "retry_after_seconds"]


def retry_after_seconds(headers, fetch_epoch) -> Column:
    """RFC 9110 §10.2.3 ``Retry-After`` as a delay in SECONDS relative to
    the fetch time — pure codegen over the ordered headers array:

    * delta-seconds form (``Retry-After: 120``): the integer, as-is;
    * HTTP-date form: ``http_date_epoch(value) - fetch_epoch`` clamped
      at 0 (a past date means retry now);
    * absent / unparseable -> NULL (the caller's backoff stands alone).

    Feed the per-attempt result into ``retry_report`` via
    ``server_delay_col`` (converted to rounds at the caller's slot
    length) so a 429/503 throttle's explicit wish FLOORS the
    exponential backoff — the polite-crawler rule: never retry earlier
    than the server asked, back off longer when the schedule says so."""
    from warcio_spark.functions import header_get
    from warcio_spark.plans.revalidate import http_date_epoch

    v = F.trim(header_get(headers, "retry-after"))
    fe = F.col(fetch_epoch) if isinstance(fetch_epoch, str) else fetch_epoch
    delta = F.when(v.rlike(r"^\d{1,15}$"), v.cast("long"))
    # clamp only a PARSED date (greatest() skips NULLs, which would turn
    # garbage into 0 instead of NULL)
    raw = http_date_epoch(v) - fe.cast("long")
    dated = F.when(raw.isNotNull(), F.greatest(raw, F.lit(0)))
    return F.coalesce(delta, dated)

_RETRYABLE = (408, 429)


def status_class(status: Column) -> Column:
    """'success' | 'retryable' | 'permanent' for an HTTP status code
    (status <= 0 = network-level failure, retryable)."""
    return (
        F.when((status >= 200) & (status < 400), F.lit("success"))
        .when(
            (status <= 0)
            | status.isin(*_RETRYABLE)
            | ((status >= 500) & (status < 600)),
            F.lit("retryable"),
        )
        .otherwise(F.lit("permanent"))
    )


def retry_report(
    fetch_log: DataFrame,
    as_of_round: int,
    *,
    max_attempts: int = 4,
    base_backoff: int = 2,
    max_backoff: int = 1024,
    url_col: str = "url_canon",
    round_col: str = "round",
    status_col: str = "status",
    server_delay_col: str | None = None,
) -> DataFrame:
    """Per-url retry state as of ``as_of_round``: (url_col, last_round,
    last_class, n_failures, next_due_round, due). Every distinct url in
    the log appears exactly once; ``next_due_round`` is null unless the
    latest attempt was retryable.

    ``server_delay_col``: optional per-attempt column of a
    server-requested delay in ROUNDS (``retry_after_seconds`` divided by
    the caller's slot length, ceil'd). The LATEST attempt's value FLOORS
    the exponential backoff — the crawler may wait longer than asked,
    never less."""
    cls = status_class(F.col(status_col))
    w_all = Window.partitionBy(url_col)
    sd = (F.col(server_delay_col) if server_delay_col is not None
          else F.lit(None).cast("long"))
    rows = fetch_log.select(
        url_col,
        F.col(round_col).alias("_r"),
        cls.alias("_cls"),
        sd.alias("_sd"),
    ).withColumn(
        "_ls",
        F.max(F.when(F.col("_cls") == "success", F.col("_r"))).over(w_all),
    )
    agg = rows.groupBy(url_col).agg(
        F.max("_r").alias("last_round"),
        F.max_by("_cls", "_r").alias("last_class"),
        F.max_by("_sd", "_r").alias("_last_sd"),
        F.count(
            F.when(
                (F.col("_cls") == "retryable")
                & (F.col("_r") > F.coalesce(F.col("_ls"), F.lit(-(2**62)))),
                1,
            )
        ).alias("n_failures"),
    )
    backoff = F.least(
        F.pow(
            F.lit(float(base_backoff)),
            F.least(F.col("n_failures") - 1, F.lit(30)),
        ).cast("long"),
        F.lit(int(max_backoff)),
    )
    backoff = F.greatest(backoff, F.coalesce(F.col("_last_sd").cast("long"),
                                             F.lit(0)))
    next_due = F.when(
        F.col("last_class") == "retryable", F.col("last_round") + backoff
    )
    return agg.select(
        url_col,
        "last_round",
        "last_class",
        "n_failures",
        next_due.alias("next_due_round"),
        (
            next_due.isNotNull()
            & (F.col("n_failures") < max_attempts)
            & (F.lit(as_of_round) >= next_due)
        ).alias("due"),
    )


def retry_due(
    fetch_log: DataFrame,
    as_of_round: int,
    *,
    max_attempts: int = 4,
    base_backoff: int = 2,
    max_backoff: int = 1024,
    url_col: str = "url_canon",
    round_col: str = "round",
    status_col: str = "status",
) -> DataFrame:
    """Just the due urls: (url_col, n_failures) — union these into the
    next round's seed set to re-enter the frontier."""
    rep = retry_report(
        fetch_log,
        as_of_round,
        max_attempts=max_attempts,
        base_backoff=base_backoff,
        max_backoff=max_backoff,
        url_col=url_col,
        round_col=round_col,
        status_col=status_col,
    )
    return rep.filter("due").select(url_col, "n_failures")


def host_circuit_breaker(fetch_log: DataFrame, *, trip_after: int = 5,
                         host_col: str = "host", seq_col: str = "seq",
                         status_col: str = "status") -> DataFrame:
    """Per-HOST failure circuit breaker — the governance layer above
    per-url retry: a host answering with an unbroken TRAILING run of
    failures (5xx storm, network blackhole, ban page on every url) is
    "tripped" and should be skipped next round as a whole, instead of
    burning the round's politeness budget rediscovering the same outage
    url by url (the circuit-breaker pattern every production fetcher
    runs; re-entry composes with ``retry_due``'s backoff once the host
    is re-probed).

    Success = ``status_class`` 'success' (200-399); NULL status is a
    network-level failure. The trailing streak is the number of
    attempts AFTER the host's last success in ``seq_col`` order (all of
    them failures by construction); a host with no success ever has its
    whole history as the streak. Returns (host, n_fetches, n_failures,
    last_ok_seq, trailing_failures, tripped) — feed ``tripped`` hosts
    into the rules table as ``allowed = false`` or anti-join them off
    the candidate set.

    Scale shape: two map-combinable aggregations on host with a
    BROADCAST join of the host-cardinality last-success table between
    them — the fetch log shuffles its per-partition partials once,
    and nothing url-cardinality crosses after that."""
    st = F.col(status_col).cast("int")
    ok = status_class(st) == F.lit("success")
    seq = F.col(seq_col)
    last_ok = (fetch_log.groupBy(F.col(host_col).alias("host"))
               .agg(F.max(F.when(ok, seq)).alias("_last_ok")))
    joined = fetch_log.select(
        F.col(host_col).alias("host"), seq.alias("_seq"), ok.alias("_ok")
    ).join(F.broadcast(last_ok), "host")
    trailing = F.count(F.when(
        F.col("_last_ok").isNull() | (F.col("_seq") > F.col("_last_ok")),
        F.lit(1)))
    agg = joined.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.count(F.when(~F.col("_ok"), F.lit(1))).alias("n_failures"),
        F.max("_last_ok").alias("last_ok_seq"),
        trailing.alias("trailing_failures"),
    )
    return agg.withColumn(
        "tripped", F.col("trailing_failures") >= F.lit(int(trip_after)))
