"""CDXJ capture-index reader — the query side of operators/indexer.py's
``index_cdxj`` writer.

A CDXJ line is ``urlkey timestamp {json}`` (pywb/OpenWayback capture
index; reference-ecosystem indexers emit it on top of warcio iteration).
Reading it back is what makes the index useful at scale: filter the
index (a small table) by urlkey/prefix/time, then fetch ONLY the
matching record byte-ranges from the archive
(sources.warc.read_warc_entries) instead of re-scanning 100 TB of WARC.

Everything here is pure Catalyst expressions (split + from_json) — no
python in the scan path, so urlkey/time predicates push into the text
scan and the whole parse stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the JSON block fields index_cdxj writes (operators/indexer.py:93-103);
# pywb stores numerics as strings — parse as strings, cast after
_BLOCK_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def cdxj_fields(line: Column) -> list[Column]:
    """Typed columns from a CDXJ line expression: urlkey, ts14 timestamp,
    and the JSON block fields (status int, length/offset long). Malformed
    lines (fewer than three fields / bad JSON) yield NULL fields, never
    errors — an index merged from many writers can carry junk lines."""
    line = F.ltrim(line)
    urlkey = F.split_part(line, F.lit(" "), F.lit(1))
    ts = F.split_part(line, F.lit(" "), F.lit(2))
    # everything after the second space; substring is 1-based
    block = F.substring(
        line, F.length(urlkey) + F.length(ts) + F.lit(3), F.length(line)
    )
    j = F.from_json(block, _BLOCK_SCHEMA)
    return [
        F.nullif(urlkey, F.lit("")).alias("urlkey"),
        F.nullif(ts, F.lit("")).alias("timestamp"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
    ]


def read_cdxj(spark: SparkSession, source) -> DataFrame:
    """Read CDXJ index lines into a typed DataFrame.

    ``source`` is a path/glob (read as text — one line per capture, the
    on-disk format `index_cdxj` + CLI ``cdxj`` write) or an existing
    DataFrame with a string ``line`` column (for index tables already in
    Spark). Returns (urlkey, timestamp, url, mime, status, digest,
    length, offset, filename) — length/offset are the compressed member
    extent in the source WARC, exactly what ``read_warc_entries`` needs.
    """
    if isinstance(source, DataFrame):
        lines = source.select(F.col("line"))
    else:
        lines = spark.read.text(source).withColumnRenamed("value", "line")
    return lines.select(*cdxj_fields(F.col("line")))
