"""Digest checking + archive validation jobs: the reference's ``warcio
check`` CLI (warcio/checker.py:19-71) as DataFrame aggregations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def digest_report(records: DataFrame) -> DataFrame:
    """Per-file digest outcome counts (records must be read with
    check_digests=True): pass/fail/unchecked + the exit-style failed flag
    (A2/A3, warcio/checker.py:29-30,50)."""
    return records.groupBy("filename").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.when(F.col("digest_ok") == True, 1).otherwise(0)).alias("n_pass"),  # noqa: E712
        F.sum(F.when(F.col("digest_ok") == False, 1).otherwise(0)).alias("n_fail"),  # noqa: E712
        F.sum(F.when(F.col("digest_ok").isNull(), 1).otherwise(0)).alias("n_unchecked"),
        F.max(F.col("file_err_count")).alias("err_count"),
        F.max(F.col("file_error")).alias("file_error"),
        F.max((F.col("digest_ok") == False).cast("int")).alias("failed"),  # noqa: E712
    )


def failed_records(records: DataFrame) -> DataFrame:
    """Records failing digest verification (the checker's per-record list)."""
    return records.filter(F.col("digest_ok") == False)  # noqa: E712


def exit_value(records: DataFrame) -> int:
    """The CLI exit fold: 1 if any record failed or any file errored."""
    row = records.agg(
        F.max(
            F.when(
                (F.col("digest_ok") == False) | F.col("file_error").isNotNull(), 1  # noqa: E712
            ).otherwise(0)
        ).alias("exit")
    ).first()
    return int(row.exit or 0)


def rec_type_census(records: DataFrame) -> DataFrame:
    """Per-file record-type counts (A1, test/test_archiveiterator.py:26-30)."""
    return records.groupBy("filename", "rec_type").agg(
        F.count(F.lit(1)).alias("n")
    )
