"""WARC record segmentation reassembly (WARC 1.1 spec §§5.18-5.20).

A record too large for one WARC file is split: the head record keeps its
original type and carries ``WARC-Segment-Number: 1``; each following
piece is a ``continuation`` record carrying ``WARC-Segment-Origin-ID``
(the head's record id) and its own segment number; the LAST piece must
also declare ``WARC-Segment-Total-Length`` (the byte length of the
reassembled block).

The reference recognizes segmented records only far enough to not
mis-verify them — ``recordloader.py:161`` reads WARC-Segment-Number so
the digest check can be skipped (a per-segment payload digest would be
wrong) — and otherwise hands each segment to the caller as an ordinary
record; stitching them back together is left to the consumer.  On a
single iterator that is a reasonable punt; on a cluster it is exactly
the operator you want distributed, because the segments of one record
land in different files / different input splits by construction.

``reassemble_segments`` is that operator: one shuffle keyed on the
origin id, carrying ONLY the segmented minority of records (the
unsegmented mass stays map-only and is unioned back), ordered
reassembly via ``array_sort`` over ``(segment_number, payload)``
structs, and a spec-conformance verdict per reassembled record.  All
JVM expressions — no UDF, no Python hop.

100 TB shape: segmented records are rare (they exist to dodge per-file
size caps), so the shuffle moves a sliver of the corpus; everything
else is a projection that pipelines into the scan.  The group state per
origin is the segment list itself, bounded by the record's real size —
the same memory the eventual consumer of the reassembled block needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_segments(
    records: DataFrame,
    id_col: str = "record_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Reassemble WARC continuation segments into whole records.

    Expects columns: ``id_col`` (WARC-Record-ID), ``rec_type``,
    ``segment_number`` (int, NULL on unsegmented records),
    ``segment_origin_id`` (string, NULL on head/unsegmented records),
    ``segment_total_length`` (long, spec: set on the last segment only),
    ``payload_col`` (binary).

    Returns one row per logical record:

    - ``origin_id`` — the head record's id (= the record's own id for
      unsegmented rows);
    - ``rec_type`` — the head record's type (``continuation`` never
      surfaces; NULL when the head segment is missing);
    - ``payload`` — segments concatenated in segment-number order;
    - ``n_segments``, ``actual_length`` (byte length of the result),
      ``declared_total`` (max WARC-Segment-Total-Length seen, NULL if
      none);
    - ``complete`` — true iff the head (segment 1, non-continuation
      type) is present, segment numbers are exactly 1..n with no gap or
      duplicate, a total length was declared, and it equals
      ``actual_length``.  Unsegmented rows are trivially complete.

    Duplicate segment numbers make the record incomplete but the output
    stays deterministic: ``array_sort`` on (number, payload) fixes the
    concat order.
    """
    rid, pay = F.col(id_col), F.col(payload_col)
    segmented = records.filter(F.col("segment_number").isNotNull())
    plain = records.filter(F.col("segment_number").isNull()).select(
        rid.alias("origin_id"),
        F.col("rec_type"),
        pay.alias("payload"),
        F.lit(1).alias("n_segments"),
        F.length(pay).cast("long").alias("actual_length"),
        F.lit(None).cast("long").alias("declared_total"),
        F.lit(True).alias("complete"),
    )

    seg_no = F.col("segment_number")
    grouped = (
        segmented.select(
            # a head segment has no origin header; it IS the origin
            F.coalesce(F.col("segment_origin_id"), rid).alias("origin_id"),
            seg_no.alias("seg"),
            F.when(
                (seg_no == 1) & (F.col("rec_type") != "continuation"),
                F.col("rec_type"),
            ).alias("head_type"),
            F.col("segment_total_length").cast("long").alias("total"),
            pay.alias("part"),
        )
        .groupBy("origin_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("seg"), F.col("part")))
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_segments"),
            F.max("seg").alias("max_seg"),
            F.min("seg").alias("min_seg"),
            F.max("head_type").alias("rec_type"),
            F.max("total").alias("declared_total"),
            F.sum(F.length("part")).cast("long").alias("actual_length"),
        )
    )
    payload = F.aggregate(
        "parts",
        F.lit(b""),
        lambda acc, x: F.concat(acc, x["part"]),
    )
    # distinct segment count comes off the collected array, NOT
    # count_distinct in the agg — a distinct aggregate alongside others
    # compiles to the two-exchange expand plan; this keeps ONE shuffle
    n_distinct = F.size(
        F.array_distinct(F.transform(F.col("parts"), lambda x: x["seg"]))
    )
    contiguous = (
        (F.col("min_seg") == 1)
        & (F.col("max_seg") == F.col("n_segments"))
        & (n_distinct == F.col("n_segments"))
    )
    complete = (
        F.col("rec_type").isNotNull()
        & contiguous
        & (F.col("declared_total") == F.col("actual_length"))
    )
    stitched = grouped.select(
        "origin_id",
        "rec_type",
        payload.alias("payload"),
        F.col("n_segments").cast("int").alias("n_segments"),
        "actual_length",
        "declared_total",
        F.coalesce(complete, F.lit(False)).alias("complete"),
    )
    return plain.unionByName(stitched)
