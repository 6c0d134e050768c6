"""Distributed global prefix sums — the scale-correct alternative to an
unpartitioned ``Window.orderBy`` (which Spark executes on ONE task,
moving the whole table through a single partition; fine for a 400-row
frontier, a wall at 10^10 rows).

Classic two-phase scan: range-partition on the (unique) order key, take
a per-partition running sum, then lift each partition by the exclusive
sum of all earlier partitions' totals. Phase 2's per-partition totals
are one tiny aggregate — #partitions rows, bounded by cluster
parallelism, never by data size — folded back in as a literal lookup
map, so the final plan is scan -> range exchange -> windowed codegen
with no extra shuffle and no single-partition stage.

Reference scope: the reference library (warcio) has no distributed
prefix primitive — this underpins the repo's training-pipeline layer
(shard assignment, ZipNum block numbering), not a warcio surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"


def with_global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    *,
    exclusive: bool = False,
    num_partitions: int | None = None,
    persist_tracker: list | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = running sum of ``value_col`` over the
    total order given by ``order_col``.

    ``order_col`` MUST be a unique key (doc_id, (urlkey, ts) packed into
    one sortable string, ...): ties have no defined running-sum order,
    and uniqueness is what makes the result partitioning-invariant —
    the same prefix sums come back whatever ``num_partitions`` is or
    wherever the range sampler happens to cut.

    ``exclusive=True`` gives the sum of strictly-earlier rows (0 for the
    first row) — the natural form for "offset where this row starts".

    The range-partitioned stage MUST be persisted — ``repartitionByRange``
    samples its boundaries per job, so recomputing the stage in the
    totals job vs the final plan could place rows on different partition
    ids than the offsets were computed for. Cache lifetime follows the
    repo's caller-owned idiom: pass ``persist_tracker`` (a list) and
    unpersist after materializing the result; without a tracker the
    cached stage is left to Spark's LRU (fine for short-lived drivers,
    leaky for long-lived sessions — same contract as
    ``operators.dedup.minhash_dedup``).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    if persist_tracker is not None:
        persist_tracker.append(parts)
    totals = {
        r[_PID]: r["t"]
        for r in parts.groupBy(_PID).agg(F.sum(value_col).alias("t")).collect()
    }
    offsets: list[Column] = []
    acc = 0
    for pid in range(n):
        offsets.extend([F.lit(pid), F.lit(acc)])
        acc += totals.get(pid, 0) or 0
    offset = F.element_at(F.create_map(*offsets), F.col(_PID))
    w = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = offset + F.sum(value_col).over(w)
    if exclusive:
        cum = cum - F.col(value_col)
    return parts.withColumn(out_col, cum.cast("long")).drop(_PID)


def with_global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "rn",
    *,
    num_partitions: int | None = None,
    persist_tracker: list | None = None,
) -> DataFrame:
    """``df`` plus a 0-based dense global row number in ``order_col``
    order — ``with_global_cumsum`` of the constant 1, exclusive, so the
    first row is 0. Same uniqueness contract on ``order_col``."""
    one = "__prefix_one"
    out = with_global_cumsum(
        df.withColumn(one, F.lit(1)),
        order_col,
        one,
        out_col,
        exclusive=True,
        num_partitions=num_partitions,
        persist_tracker=persist_tracker,
    )
    return out.drop(one)
