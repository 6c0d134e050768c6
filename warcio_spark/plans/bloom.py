"""Distributed Bloom-filter sidecar for the URL seen-set (north rule A6/J3).

Spark's SQL surface does not expose bloom_filter_agg directly (it is an
optimizer-internal aggregate), so the sidecar is built the classic way:
each partition of seen keys sets bits in a local numpy bitmap (double
hashing off the existing 64-bit url_hash — no extra hashing of the url),
the driver ORs the partition bitmaps, and the result is broadcast and
probed by a vectorized pandas UDF. False positives only ever route a
candidate through the exact anti-join; never-seen majorities skip the
shuffle entirely.

Sizing: bits = items * bits_per_item (10 bits/item ~ 1% fpp with k=7).
10^8 seen urls * 10 bits = 125 MB broadcast — within executor budgets; at
10^10 partition the seen-set by hash range and use one bloom per range.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _positions(hashes: np.ndarray, k: int, m: int):
    """k bit positions per 64-bit hash via double hashing (h1 + i*h2) % m."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(m)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)


def build_bloom(seen: DataFrame, expected_items: int,
                bits_per_item: int = 10, hash_col: str = "url_hash"):
    """Aggregate a Bloom bitmap over the seen keys. Returns (bitmap_bytes,
    k, m). One pass, map-side bitmaps OR-ed on the driver."""
    m = max(64, expected_items * bits_per_item)
    m = int(math.ceil(m / 8) * 8)
    k = max(1, int(round(bits_per_item * math.log(2))))

    def per_partition(it):
        bits = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            hashes = pdf[hash_col].to_numpy(dtype=np.int64)
            if len(hashes) == 0:
                continue
            any_rows = True
            for pos in _positions(hashes, k, m):
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = seen.select(hash_col).mapInPandas(per_partition, "bits binary").collect()
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        bitmap |= np.frombuffer(bytes(row.bits), dtype=np.uint8)
    return bitmap.tobytes(), k, m


def might_contain_udf(spark, bitmap: bytes, k: int, m: int):
    """Vectorized membership probe against the broadcast bitmap."""
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(T.BooleanType())
    def might_contain(hashes: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h = hashes.to_numpy(dtype=np.int64)
        out = np.ones(len(h), dtype=bool)
        for pos in _positions(h, k, m):
            out &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return pd.Series(out)

    return might_contain


def bloom_not_seen(cands: DataFrame, seen: DataFrame, expected_items: int,
                   bits_per_item: int = 10) -> DataFrame:
    """Exact frontier-minus-seen with Bloom shuffle pruning: candidates the
    bloom rejects are DEFINITELY new and bypass the anti-join; the
    maybe-seen minority is verified exactly. Result == plain anti-join."""
    spark = cands.sparkSession
    bitmap, k, m = build_bloom(seen, expected_items, bits_per_item)
    probe = might_contain_udf(spark, bitmap, k, m)
    flagged = cands.withColumn("_maybe_seen", probe(F.col("url_hash")))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe_seen = (
        flagged.filter(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select("url_hash"), "url_hash", "left_anti")
    )
    return definitely_new.unionByName(maybe_seen)
