"""Batch-incremental WARC ingest with exactly-once file tracking.

Spark's file-source readStream cannot stream the binaryFile format, so a
growing directory of .warc(.gz) files is ingested the same way the crawl
loop checkpoints rounds: each ingest() call discovers files not yet in any
COMMITTED batch, parses only those through read_warc, writes their records
into a fresh batch directory, and commits the batch atomically (_COMMIT
written last, after the records write succeeded). A crash between the
records write and the commit leaves an uncommitted batch dir that readers
ignore and the next run redoes — exactly-once at the reader, at-least-once
work. This mirrors the reference's resumable pull loop
(warcio/archiveiterator.py:102-140) at directory granularity.

At scale: file discovery becomes a listing job against the object store,
and the records sink an Iceberg append — the batch/commit shape is
identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _batches(state_dir: str):
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if d.startswith("batch=") and os.path.exists(
            os.path.join(state_dir, d, "_COMMIT")
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def ingested_files(state_dir: str) -> set:
    """Paths covered by committed batches."""
    seen = set()
    for n in _batches(state_dir):
        with open(os.path.join(state_dir, f"batch={n}", "files.json")) as f:
            seen.update(json.load(f)["files"])
    return seen


def ingest_warc_incremental(spark: SparkSession, warc_dir: str,
                            state_dir: str, transform=None,
                            **read_opts) -> dict:
    """Ingest files in ``warc_dir`` not yet committed; returns the batch
    summary ({"batch", "new_files", "n_records"}; batch None if nothing
    new).

    ``transform``: optional DataFrame->DataFrame applied to the parsed
    records before the batch lands — the incremental-derivation hook
    (e.g. ``operators.wet.derive_wet`` turns this into a WARC-dir ->
    WET-table factory with the same exactly-once commit semantics)."""
    import glob as _glob

    from warcio_spark.sources.warc import read_warc

    done = ingested_files(state_dir)
    present = sorted(
        p for p in _glob.glob(os.path.join(warc_dir, "*"))
        if p.endswith((".warc", ".warc.gz", ".arc", ".arc.gz"))
    )
    new = [p for p in present if p not in done]
    if not new:
        return {"batch": None, "new_files": 0, "n_records": 0}

    n = (_batches(state_dir)[-1] + 1) if _batches(state_dir) else 1
    bdir = os.path.join(state_dir, f"batch={n}")
    records = read_warc(spark, new, **read_opts)
    if transform is not None:
        records = transform(records)
    records.write.mode("overwrite").parquet(os.path.join(bdir, "records"))
    n_records = spark.read.parquet(os.path.join(bdir, "records")).count()
    os.makedirs(bdir, exist_ok=True)
    with open(os.path.join(bdir, "files.json"), "w") as f:
        json.dump({"files": new, "n_records": n_records}, f)
    with open(os.path.join(bdir, "_COMMIT"), "w") as f:
        f.write(str(time.time()))
    return {"batch": n, "new_files": len(new), "n_records": n_records}


def read_ingested_records(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union of all COMMITTED batches' records (uncommitted dirs ignored)."""
    paths = [
        os.path.join(state_dir, f"batch={n}", "records")
        for n in _batches(state_dir)
    ]
    if not paths:
        raise ValueError(f"no committed ingest batches under {state_dir}")
    return spark.read.parquet(*paths)
