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
    k, m). One pass, map-side bitmaps OR-ed on the driver.

    Deprecated for production use (kept as the oracle for sidecar tests):
    the driver-side OR holds the whole bitmap in one process — fine to
    ~10^8 keys, impossible at 10^10 (12.5 GB). The range-partitioned
    sidecar below is the documented scale path."""
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


# ---------------------------------------------------------------------------
# range-partitioned sidecar (the 10^10 layout)
# ---------------------------------------------------------------------------
#
# One bloom per url_hash range, built and written BY THE EXECUTORS — the
# driver never holds any bitmap. At 10^10 seen urls * 10 bits no single
# 12.5 GB bitmap exists anywhere: each of R ranges owns a (10^10/R)-key
# bloom in its own file, build is one shuffle on pmod(url_hash, R), and a
# probe task touches only the range files its candidate batch hashes into
# (worker-local cache, one read per file per worker). Files are plain
# bytes — on a cluster the sidecar dir is HDFS/S3 instead of local disk.


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style remix: range id = pmod(h, R) correlates the low
    bits of every hash within a range, and when R divides m the raw h % m
    would only ever hit 1/R of the bitmap — remix before taking positions."""
    h = h.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def sidecar_params(expected_items: int, ranges: int, bits_per_item: int = 10):
    """(k, m_per_range): each range bloom sized for its share of the keys."""
    per_range = max(1, expected_items // max(1, ranges))
    m = max(64, per_range * bits_per_item)
    m = int(math.ceil(m / 8) * 8)
    k = max(1, int(round(bits_per_item * math.log(2))))
    return k, m


def build_bloom_sidecar(seen: DataFrame, sidecar_dir: str, expected_items: int,
                        ranges: int = 16, bits_per_item: int = 10,
                        hash_col: str = "url_hash") -> dict:
    """Build the per-range bloom files. One shuffle on the range id; each
    group's bitmap is built and written by its executor task (atomic
    tmp+rename). Returns {"ranges", "k", "m", "items"}."""
    import json
    import os

    k, m = sidecar_params(expected_items, ranges, bits_per_item)
    os.makedirs(sidecar_dir, exist_ok=True)

    def per_range(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        bits = np.zeros(m // 8, dtype=np.uint8)
        hashes = _mix(pdf[hash_col].to_numpy(dtype=np.int64))
        for pos in _positions(hashes, k, m):
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        tmp = os.path.join(sidecar_dir, ".range_{0}.tmp".format(rid))
        with open(tmp, "wb") as f:
            f.write(bits.tobytes())
        os.replace(tmp, os.path.join(sidecar_dir, "range_{0}.bloom".format(rid)))
        return pd.DataFrame({"range": [rid], "n": [len(pdf)]})

    counts = (
        seen.select(F.pmod(F.col(hash_col), F.lit(ranges)).alias("_range"), hash_col)
        .groupBy("_range")
        .applyInPandas(per_range, "range int, n long")
        .collect()
    )
    built = sorted(int(r.range) for r in counts)
    # drop stale range files from a PRIOR build in this dir: a range with
    # zero keys now must not keep an old bitmap (possibly sized for a
    # different m — the probe would read wrong-sized bits or IndexError)
    keep = {"range_{0}.bloom".format(r) for r in built}
    for name in os.listdir(sidecar_dir):
        if name.startswith("range_") and name.endswith(".bloom") and name not in keep:
            os.remove(os.path.join(sidecar_dir, name))
    meta = {
        "ranges": ranges,
        "k": k,
        "m": m,
        "items": int(sum(r.n for r in counts)),
        "built_ranges": built,
    }
    with open(os.path.join(sidecar_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def update_bloom_sidecar(delta: DataFrame, sidecar_dir: str,
                         hash_col: str = "url_hash") -> dict:
    """OR a delta's keys into the existing sidecar files — O(delta) work, so
    a crawl round can keep the sidecar complete without rescanning the full
    seen-set. Same (k, m, ranges) from meta.json; ranges with no file yet
    start from zeros. Single-writer (the crawl loop) — crash recovery is
    a full rebuild at crawl start, so a torn update can never survive into
    a resumed run."""
    import json
    import os

    with open(os.path.join(sidecar_dir, "meta.json")) as f:
        meta = json.load(f)
    ranges, k, m = meta["ranges"], meta["k"], meta["m"]

    def per_range(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        path = os.path.join(sidecar_dir, "range_{0}.bloom".format(rid))
        bits = (
            np.fromfile(path, dtype=np.uint8)
            if os.path.exists(path)
            else np.zeros(m // 8, dtype=np.uint8)
        )
        if len(bits) != m // 8:
            # a foreign-sized file means the dir holds a different build
            # generation: merging would silently drop its keys (false
            # negatives). Fail loudly — the fix is a full rebuild.
            raise ValueError(
                "sidecar range {0} is {1} bytes, expected {2}: rebuild the "
                "sidecar (build_bloom_sidecar) instead of updating".format(
                    rid, len(bits), m // 8
                )
            )
        hashes = _mix(pdf[hash_col].to_numpy(dtype=np.int64))
        for pos in _positions(hashes, k, m):
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        tmp = os.path.join(sidecar_dir, ".range_{0}.tmp".format(rid))
        with open(tmp, "wb") as f:
            f.write(bits.tobytes())
        os.replace(tmp, path)
        return pd.DataFrame({"range": [rid], "n": [len(pdf)]})

    counts = (
        delta.select(F.pmod(F.col(hash_col), F.lit(ranges)).alias("_range"), hash_col)
        .groupBy("_range")
        .applyInPandas(per_range, "range int, n long")
        .collect()
    )
    meta["items"] = int(meta.get("items", 0)) + int(sum(r.n for r in counts))
    meta["built_ranges"] = sorted(
        set(meta.get("built_ranges", [])) | {int(r.range) for r in counts}
    )
    with open(os.path.join(sidecar_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def sidecar_probe_udf(sidecar_dir: str, ranges: int, k: int, m: int):
    """Vectorized membership probe that loads each range's bloom lazily from
    the sidecar dir (cached per python worker). A range with no file means
    no seen keys hash there — definitely new."""

    cache: dict = {}  # per python-worker bloom cache (ships empty, fills lazily)

    @F.pandas_udf(T.BooleanType())
    def might_contain(hashes: pd.Series) -> pd.Series:
        import os

        h = hashes.to_numpy(dtype=np.int64)
        rid = (h % np.int64(ranges)).astype(np.int64)  # floor mod == pmod
        out = np.zeros(len(h), dtype=bool)
        mixed = _mix(h)
        for r in np.unique(rid):
            if r not in cache:
                path = os.path.join(sidecar_dir, "range_{0}.bloom".format(int(r)))
                cache[r] = (
                    np.fromfile(path, dtype=np.uint8)
                    if os.path.exists(path)
                    else None
                )
                if cache[r] is not None and len(cache[r]) != m // 8:
                    # wrong-sized file = a different build generation: the
                    # only SAFE reading is "maybe seen" (the exact anti-join
                    # backstop verifies); treating it as absent would be a
                    # false negative
                    cache[r] = True
            bits = cache[r]
            if bits is True:
                out[rid == r] = True
                continue
            if bits is None:
                continue
            sel = rid == r
            sub = np.ones(int(sel.sum()), dtype=bool)
            for pos in _positions(mixed[sel], k, m):
                sub &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out[sel] = sub
        return pd.Series(out)

    return might_contain


def bloom_not_seen_sidecar(cands: DataFrame, seen: DataFrame,
                           sidecar_dir: str) -> DataFrame:
    """Exact frontier-minus-seen through the range-partitioned sidecar:
    identical result to the plain anti-join; the blooms only prune shuffle
    volume (false positives route through the exact join, false negatives
    are impossible)."""
    import json
    import os

    with open(os.path.join(sidecar_dir, "meta.json")) as f:
        meta = json.load(f)
    probe = sidecar_probe_udf(sidecar_dir, meta["ranges"], meta["k"], meta["m"])
    flagged = cands.withColumn("_maybe_seen", probe(F.col("url_hash")))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe_seen = (
        flagged.filter(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select("url_hash"), "url_hash", "left_anti")
    )
    return definitely_new.unionByName(maybe_seen)


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
