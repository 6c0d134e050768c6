"""Columnar capture index (sources/cdx_table): round-trip, per-file
(urlkey, timestamp) sortedness, tld partition pruning in the plan, and
cdx_query composition equivalence."""

import contextlib
import glob
import io
import os

from pyspark.sql import functions as F

from warcio_spark.sources.cdx_table import (
    cdx_table_scope,
    read_cdx_table,
    tld_expr,
    write_cdx_table,
)
from warcio_spark.sources.cdxj import cdx_query

COLS = ["urlkey", "timestamp", "url", "mime", "status", "digest"]


def _index(spark, n=300):
    d = F.col("id")
    s = lambda x: x.cast("string")  # noqa: E731
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (d % 3 + 1).cast("int"))
    return spark.range(n).select(
        F.concat(tld, F.lit(",example,h"), s(d % 7), F.lit(")/p/"),
                 s(d)).alias("urlkey"),
        F.concat(F.lit("2024"), F.lpad(s(d % 12 + 1), 2, "0"),
                 F.lit("01000000")).alias("timestamp"),
        F.concat(F.lit("http://h"), s(d % 7), F.lit(".example."),
                 tld, F.lit("/p/"), s(d)).alias("url"),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.concat(F.lit("sha1:"), s(d % 5)).alias("digest"),
    )


def test_tld_expr(spark):
    rows = spark.createDataFrame(
        [("com,example)/", "com"), ("org,x,y)/p?q=1", "org"),
         ("junkkey", "junkkey")], ["k", "want"])
    got = rows.select("want", tld_expr("k").alias("got")).collect()
    for r in got:
        assert r.got == r.want


def test_roundtrip_and_file_sortedness(spark, tmp_path):
    out = str(tmp_path / "cdx_table")
    idx = _index(spark)
    write_cdx_table(idx, out, files_per_partition=2)
    back = read_cdx_table(spark, out)
    assert sorted(map(tuple, back.select(*COLS).collect())) == \
        sorted(map(tuple, idx.collect()))
    # partition dirs exist per tld
    assert sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(out, "tld=*"))) == [
        "tld=com", "tld=net", "tld=org"]
    # every parquet file is (urlkey, timestamp)-sorted -> row-group stats prune
    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(out, "tld=*", "*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f, columns=["urlkey", "timestamp"])
        pairs = list(zip(t.column("urlkey").to_pylist(),
                         t.column("timestamp").to_pylist()))
        assert pairs == sorted(pairs), f


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scope_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "cdx_table")
    write_cdx_table(_index(spark), out)
    table = read_cdx_table(spark, out)
    scoped = cdx_table_scope(table, "http://h3.example.org/")
    p = _plan(scoped)
    assert "PartitionFilters" in p and "tld" in p
    # only the org partition's rows survive
    assert {r.tld for r in scoped.select("tld").distinct().collect()} == \
        {"org"}
    # and the urlkey predicate cdx_query adds reaches the scan
    q = cdx_query(scoped, url="http://h3.example.org/p/5",
                  match_type="exact")
    assert "PushedFilters: [" in _plan(q)


def test_cdx_query_over_table_equals_in_memory(spark, tmp_path):
    out = str(tmp_path / "cdx_table")
    idx = _index(spark)
    write_cdx_table(idx, out, files_per_partition=2)
    table = read_cdx_table(spark, out)
    kwargs = dict(url="http://h1.example.com/", match_type="host",
                  from_ts="2024", to_ts="202406", filters=["status:200"])
    got = cdx_query(cdx_table_scope(table, kwargs["url"]).select(*COLS),
                    **kwargs)
    want = cdx_query(idx, **kwargs)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert want.count() > 0
