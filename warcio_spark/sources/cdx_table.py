"""Columnar capture index: the typed CDX table as partitioned,
urlkey-sorted parquet — the Common-Crawl "columnar index"
(cc-index-table) face of the same data ZipNum serves as gzip blocks.
ZipNum answers point lookups with block-ranged reads; the columnar face
is what ANALYTICS wants: Catalyst prunes partitions and row groups, and
every engine that reads parquet (DuckDB, Trino, Spark) can query it
without this library.

Layout: one ``tld=<first urlkey label>`` partition column (bounded
cardinality — the reversed-host TLD, ~1500 values on the live web) and
files sorted by (urlkey, timestamp) inside each partition so parquet
min/max stats turn urlkey predicates into row-group pruning. At 10^10
captures a domain query touches one partition's few row groups, not
the index.

``sources.cdxj.cdx_query`` composes directly: it is a plain DataFrame
transform, so running it over ``read_cdx_table`` output gets partition
pruning for free once the tld predicate is present —
``cdx_table_scope`` adds it from the query url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tld_expr(urlkey) -> F.Column:
    """The partition key: first SURT label (``com,example)/`` ->
    ``com``). Junk keys without a comma or paren fall into their whole
    prefix — one bounded junk partition, never a scan error."""
    k = F.col(urlkey) if isinstance(urlkey, str) else urlkey
    return F.split_part(F.split_part(k, F.lit(")"), F.lit(1)),
                        F.lit(","), F.lit(1))


def write_cdx_table(index: DataFrame, path: str,
                    files_per_partition: int = 1) -> None:
    """Materialize a typed capture index (read_cdxj/read_cdx11 shape)
    as the columnar table: partitioned by tld, (urlkey, timestamp)-
    sorted within files. ``repartition(tld, urlkey-range-ish)`` then
    ``sortWithinPartitions`` keeps the sort local — no global sort, one
    shuffle. ``files_per_partition`` spreads a huge tld (com!) over
    several sorted files; row-group stats still prune because each file
    stays sorted."""
    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1, got {files_per_partition}")
    salt = (F.crc32(F.col("urlkey")) % int(files_per_partition)
            if files_per_partition > 1 else F.lit(0))
    out = index.withColumn("tld", tld_expr("urlkey"))
    # hash exchange on (tld, salt): a task may carry several tlds, but
    # the partitionBy writer splits them into per-tld files. The sort
    # MUST lead with tld: the dynamic-partition writer requires its
    # input ordered by the partition column and would otherwise insert
    # its own (unstable) tld-only sort, destroying the urlkey order
    (out.repartition(F.col("tld"), salt)
        .sortWithinPartitions("tld", "urlkey", "timestamp")
        .write.partitionBy("tld").mode("overwrite").parquet(path))


def read_cdx_table(spark: SparkSession, path: str) -> DataFrame:
    """The columnar index back as a DataFrame (tld partition column
    included)."""
    return spark.read.parquet(path)


def cdx_table_scope(table: DataFrame, url: str) -> DataFrame:
    """Narrow the table to the query url's tld partition BEFORE handing
    it to ``cdx_query``: the urlkey predicates cdx_query adds do not
    imply the partition column, so this explicit equality is what turns
    a full-index scan into one pruned partition (PartitionFilters in
    the plan — pinned in tests/test_cdx_table.py)."""
    from warcio_spark.functions import surt_key

    key = surt_key(F.lit(url))
    return table.filter(F.col("tld") == tld_expr(key))
