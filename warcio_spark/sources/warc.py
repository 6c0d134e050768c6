"""WARC/ARC file source: .warc(.gz)/.arc(.gz) files -> warc_records DataFrame.

Spark-first design (SURVEY.md §2.1 S1-S6):
- ``spark.read.format("binaryFile")`` lists + reads files distributed; one
  task per file (Common-Crawl WARCs are ~1 GB — the file is the natural
  split unit, and per-record gzip members keep finer splitting possible).
- a ``mapInArrow`` stage runs the parse kernel per file and emits one row
  per record with member offset/length, building pyarrow RecordBatches
  directly (no pandas detour) — after this hop everything is columnar and
  all further queries are pure DataFrame ops.
- at 100 TB: ~100k files fan out over executors; no shuffle is involved in
  ingest, and the natural next step is writing the records table
  partitioned by crawl/filename prefix so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcio_spark.kernels.chrono import iso_to_datetime, ts14_to_datetime
from warcio_spark.kernels.parse import parse_warc_bytes
from warcio_spark.schema import WARC_RECORDS_SCHEMA


def _parse_warc_date(raw_date):
    if not raw_date:
        return None
    try:
        return (
            iso_to_datetime(raw_date)
            if "-" in raw_date
            else ts14_to_datetime(raw_date)
        )
    except (ValueError, TypeError):
        return None


def _arrow_schema():
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(WARC_RECORDS_SCHEMA)


def _records_to_batches(result, include_payload, include_content,
                        arrow_schema, max_bytes=256 << 20):
    """pyarrow RecordBatches straight from the parse result — the ingest
    hot path. Building arrow arrays directly (mapInArrow) skips the
    pandas-object-Series detour of mapInPandas: one columnar
    materialization instead of two. Chunked so a batch's binary columns
    stay far below arrow's int32 offset limit even for 1 GB files."""
    import pyarrow as pa

    recs = result["records"]
    if not recs:
        return
    chunks, cur, cur_bytes = [], [], 0
    for r in recs:
        sz = (len(r["payload"]) if (include_payload and r["payload"]) else 0) + (
            len(r["content"]) if (include_content and r["content"]) else 0
        )
        cur.append(r)
        cur_bytes += sz
        if cur_bytes >= max_bytes:
            chunks.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        chunks.append(cur)

    types = {f.name: f.type for f in arrow_schema}
    for chunk in chunks:
        n = len(chunk)
        cols = {
            "record_id": [r["record_id"] for r in chunk],
            "rec_type": [r["rec_type"] for r in chunk],
            "format": [r["format"] for r in chunk],
            "url": [r["url"] for r in chunk],
            "warc_ts": [_parse_warc_date(r.get("warc_date")) for r in chunk],
            "rec_headers": [
                [{"name": h[0], "value": h[1]} for h in (r["rec_headers"] or [])]
                for r in chunk
            ],
            "http_protocol": [r["http_protocol"] for r in chunk],
            "http_statusline": [r["http_statusline"] for r in chunk],
            "http_headers": [
                None
                if r["http_headers"] is None
                else [{"name": h[0], "value": h[1]} for h in r["http_headers"]]
                for r in chunk
            ],
            "content_type": [r["content_type"] for r in chunk],
            "length": [r["length"] for r in chunk],
            "payload_length": [r["payload_length"] for r in chunk],
            "payload": [r["payload"] for r in chunk] if include_payload else [None] * n,
            "content": [r["content"] for r in chunk] if include_content else [None] * n,
            "digest_ok": [r["digest_ok"] for r in chunk],
            "offset": [r["offset"] for r in chunk],
            "rec_length": [r["rec_length"] for r in chunk],
            "filename": [r["filename"] for r in chunk],
            "file_err_count": [result["err_count"]] * n,
            "file_error": [result["error"]] * n,
        }
        arrays = [pa.array(cols[f.name], type=types[f.name]) for f in arrow_schema]
        yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def read_warc(
    spark: SparkSession,
    paths,
    known_format=None,
    arc2warc: bool = False,
    parse_http: bool = True,
    verify_http: bool = False,
    check_digests=False,
    include_payload: bool = True,
    include_content: bool = True,
    ensure_http_headers: bool = False,
) -> DataFrame:
    """Read WARC/ARC archives into the canonical warc_records DataFrame.

    ``include_payload/include_content=False`` is the engine's
    ``no_record_parse``-style pruning (warcio/indexer.py:19): indexing jobs
    that only project headers skip materializing body bytes entirely.

    Local files take the python-open fast path: the JVM only LISTS the
    files (metadata scan), the listing is round-robined across cores, and
    each python worker opens and reads its files directly — no JVM blob
    read, no JVM->python Arrow copy of raw file bytes, and task count
    tracks cores instead of file count (measured +25%/core on the
    many-small-files ingest bench; at 100 TB it also halves ingest's
    memory bandwidth). Non-local schemes (hdfs://, s3a://, ...) keep the
    binaryFile blob path, where Hadoop's filesystem connectors live.
    """
    path_list = [paths] if isinstance(paths, str) else list(paths)
    local = all(
        "://" not in p or p.startswith("file:") for p in path_list
    )
    files = spark.read.format("binaryFile").load(path_list)
    arrow_schema = _arrow_schema()

    def parse_blob(blob, path):
        return parse_warc_bytes(
            blob,
            filename=path.rsplit("/", 1)[-1],
            known_format=known_format,
            arc2warc=arc2warc,
            parse_http=parse_http,
            verify_http=verify_http,
            check_digests=check_digests,
            ensure_http_headers=ensure_http_headers,
        )

    if local:
        listing = files.select("path")

        def run_local(batches):
            from urllib.parse import unquote, urlparse

            for batch in batches:
                for p in batch.column(0):
                    uri = p.as_py()
                    # binaryFile lists absolute, percent-encoded file: URIs
                    fpath = (
                        unquote(urlparse(uri).path)
                        if uri.startswith("file:") else uri
                    )
                    with open(fpath, "rb") as f:
                        data = f.read()
                    yield from _records_to_batches(
                        parse_blob(data, fpath), include_payload,
                        include_content, arrow_schema,
                    )

        parallelism = spark.sparkContext.defaultParallelism
        return listing.repartition(parallelism).mapInArrow(
            run_local, WARC_RECORDS_SCHEMA
        )

    def run(batches):
        for batch in batches:
            paths_col, blobs = batch.column(0), batch.column(1)
            for i in range(batch.num_rows):
                result = parse_blob(
                    blobs[i].as_py(), paths_col[i].as_py()
                )
                yield from _records_to_batches(
                    result, include_payload, include_content, arrow_schema
                )

    return files.select("path", "content").mapInArrow(
        run, WARC_RECORDS_SCHEMA
    )


def _find_member_boundary(data: bytes, hint: int = 0) -> int:
    """First gzip-member start at/after ``hint``: scan for the gzip magic and
    validate by decompressing a small window and checking it parses as a
    record statusline (WARC/ARC). Returns -1 when none found."""
    import zlib

    from warcio_spark.kernels.parse import (
        ARC_FIELDS,
        WARC_VERSIONS,
        split_format_prefix,
    )
    from warcio_spark.kernels.textcodec import decode_fallback

    pos = hint
    while True:
        cand = data.find(b"\x1f\x8b\x08", pos)
        if cand == -1:
            return -1
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            head = d.decompress(data[cand : cand + 65536], 4096)
        except zlib.error:
            pos = cand + 1
            continue
        line = decode_fallback(head.split(b"\n", 1)[0]).rstrip()
        if split_format_prefix(line, WARC_VERSIONS) is not None or (
            len(line.rsplit(" ", len(ARC_FIELDS) - 1)) == len(ARC_FIELDS)
            and ("://" in line or line.startswith("filedesc://"))
        ):
            return cand
        pos = cand + 1


def _split_scheme(path: str) -> tuple[str, str]:
    if "://" not in path:
        return "", path
    scheme, rest = path.split("://", 1)
    return scheme.lower(), rest


def _open_ranged(path: str, start: int, length: int) -> bytes:
    """Read ``length`` bytes at ``start`` through a scheme-aware opener —
    the remote-FS hook the single-huge-WARC path needs (the reference
    covers the same shape with its S3 loader, test/test_s3.py:129-151):

    - bare paths and file:// URIs: plain seek+read
    - http(s)://: one stdlib Range request per task (no dependencies); a
      server that ignores Range (status 200) is handled by slicing the
      full body — correct, though only sensible for small files
    - any other scheme (s3://, gs://, abfs://...): the remote_fs plug
      point — a registered opener if one exists (mock:// builtin, used by
      tests to drive this branch), else fsspec when importable on the
      executors, else a clear ImportError

    Runs INSIDE tasks (python workers — no JVM gateway there, so the
    Hadoop FS API is not an option for this path)."""
    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        with open(_local_path(scheme, rest, path), "rb") as f:
            f.seek(start)
            return f.read(length)
    if scheme in ("http", "https"):
        import urllib.request

        req = urllib.request.Request(
            path, headers={"Range": "bytes={0}-{1}".format(start, start + length - 1)}
        )
        with urllib.request.urlopen(req) as r:
            body = r.read()
            if r.status == 206:
                return body[:length]
            _warn_range_ignored(path)
            return body[start:start + length]  # Range ignored: slice
    from warcio_spark.sources.remote_fs import open_stream

    with open_stream(path, "rb") as f:
        f.seek(start)
        return f.read(length)


_RANGE_IGNORED_WARNED: set = set()


def _warn_range_ignored(path: str) -> None:
    """Warn ONCE per process per URL when a server ignores Range: every
    ranged task then re-downloads the whole file — correct but
    O(tasks x filesize), which the user should see, not discover from
    network bills."""
    if path in _RANGE_IGNORED_WARNED:
        return
    _RANGE_IGNORED_WARNED.add(path)
    import warnings

    warnings.warn(
        "server for {0} ignores Range requests; each ranged read "
        "downloads the whole file (use read_warc on many files, or a "
        "Range-capable server, for large inputs)".format(path),
        RuntimeWarning,
        stacklevel=3,
    )


def _local_path(scheme: str, rest: str, path: str) -> str:
    """file:// URI (with or without an authority component) or bare path
    -> local filesystem path."""
    if scheme != "file":
        return path
    if rest.startswith("/"):
        return rest
    # authority form file://host/p/a/t/h — drop the authority; a bare
    # 'file://x' (no path at all) is malformed, say so instead of IndexError
    if "/" not in rest:
        raise ValueError("malformed file:// URI (no path): {0}".format(path))
    return "/" + rest.split("/", 1)[1]


def _path_size(path: str) -> int:
    """File size through the same scheme-aware opener (driver-side)."""
    import os

    scheme, rest = _split_scheme(path)
    if scheme in ("", "file"):
        return os.path.getsize(_local_path(scheme, rest, path))
    if scheme in ("http", "https"):
        import urllib.request

        # HEAD first; fall back to a 1-byte Range GET for servers that
        # reject HEAD (method-specific presigned URLs) or omit
        # Content-Length — Content-Range carries the total size there.
        # Only URL/HTTP errors trigger the fallback, and the HEAD failure
        # is CHAINED onto any GET failure so a genuine error (DNS, 403,
        # 404) surfaces its original cause instead of the fallback's.
        import urllib.error

        head_err = None
        try:
            req = urllib.request.Request(path, method="HEAD")
            with urllib.request.urlopen(req) as r:
                cl = r.headers["Content-Length"]
                if cl is not None:
                    return int(cl)
        except (urllib.error.URLError, OSError) as e:
            head_err = e
        req = urllib.request.Request(path, headers={"Range": "bytes=0-0"})
        try:
            with urllib.request.urlopen(req) as r:
                cr = r.headers["Content-Range"]  # e.g. "bytes 0-0/12345"
                if r.status == 206 and cr and "/" in cr:
                    return int(cr.rsplit("/", 1)[1])
                body = r.read()  # Range ignored: the body IS the file
                _warn_range_ignored(path)
                return len(body)
        except Exception as e:
            raise e from head_err
    from warcio_spark.sources.remote_fs import open_stream

    with open_stream(path, "rb") as f:
        f.seek(0, 2)
        return f.tell()


def read_warc_ranges(
    spark: SparkSession,
    path: str,
    split_bytes: int = 64 << 20,
    overlap_bytes: int = 16 << 20,
    **read_opts,
) -> DataFrame:
    """Parallel ingest of ONE huge .warc.gz by byte ranges.

    Each task owns [start, end): it seeks to the first gzip-member boundary
    at/after start (magic scan + decompress-validate, possible only because
    every record is its own gzip member — the splittability the reference
    enforces, warcio/archiveiterator.py:35-48) and parses every member that
    STARTS inside its range; a member spilling past ``end`` is covered by
    ``overlap_bytes`` of extra read (bound on the largest single record).
    Offsets are absolute file offsets, identical to a whole-file parse.

    Scale note: this is the path for the "one 100 GB WARC" shape; the
    common Common-Crawl shape (many ~1 GB files) uses read_warc's
    file-per-task fan-out instead. Tasks read through the scheme-aware
    ranged opener (_open_ranged): local paths, file:// URIs, http(s)://
    Range requests, and fsspec-backed object stores when fsspec is present.
    """
    size = _path_size(path)
    ranges = [
        (path, s, min(s + split_bytes, size))
        for s in range(0, size, split_bytes)
    ]
    rdf = spark.createDataFrame(ranges, "path string, start long, end long")
    rdf = rdf.repartition(len(ranges))

    include_payload = read_opts.pop("include_payload", True)
    include_content = read_opts.pop("include_content", True)
    arrow_schema = _arrow_schema()

    def run(batches):
        for batch in batches:
            for row in batch.to_pylist():
                p, start, end = row["path"], int(row["start"]), int(row["end"])
                blob = _open_ranged(p, start, (end - start) + overlap_bytes)
                boundary = 0 if start == 0 else _find_member_boundary(blob)
                if boundary == -1 or start + boundary >= end:
                    continue
                result = parse_warc_bytes(
                    blob[boundary:],
                    filename=p.rsplit("/", 1)[-1],
                    **read_opts,
                )
                abs_base = start + boundary
                owned = [
                    r for r in result["records"]
                    if abs_base + r["offset"] < end
                ]
                for r in owned:
                    r["offset"] += abs_base
                result = {"records": owned, "err_count": result["err_count"],
                          "error": result["error"]}
                yield from _records_to_batches(
                    result, include_payload, include_content, arrow_schema
                )

    return rdf.mapInArrow(run, WARC_RECORDS_SCHEMA)


def read_warc_entries(
    spark: SparkSession,
    entries: DataFrame,
    base: str = None,
    **read_opts,
) -> DataFrame:
    """Targeted record fetch through a capture index: parse ONLY the byte
    ranges the index rows point at, never the archive around them.

    ``entries`` carries (offset, length) plus either ``path`` (full
    path/URI per row) or ``filename`` resolved against ``base`` — exactly
    the columns a CDXJ index row provides (sources/cdxj.read_cdxj), where
    length/offset are the record's compressed member extent. This is the
    replay-fetch shape of the reference ecosystem (pywb looks up CDX,
    seeks, reads one member — warcio/archiveiterator.py:209-239 member
    info) distributed over tasks: filter a small index table, fetch
    matching members in parallel, get back the same rows ``read_warc``
    would have produced for them (absolute offsets preserved).

    Scale shape: entries are hash-partitioned by path and offset-sorted
    within partitions, so a task opens each local file once and reads
    monotonically forward; remote schemes issue one ranged read per entry
    (_open_ranged: http(s) Range, registered object-store openers,
    fsspec). The archive bytes touched are O(selected records), not
    O(archive) — the point of having an index at 100 TB.
    """
    include_payload = read_opts.pop("include_payload", True)
    include_content = read_opts.pop("include_content", True)
    arrow_schema = _arrow_schema()

    if base is not None:
        path_col = F.concat(F.lit(base.rstrip("/") + "/"), F.col("filename"))
    elif "path" in entries.columns:
        path_col = F.col("path")
    else:
        path_col = F.col("filename")
    sel = entries.select(
        path_col.alias("path"),
        F.col("offset").cast("long").alias("offset"),
        F.col("length").cast("long").alias("length"),
    ).filter(
        F.col("path").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    )
    parallelism = spark.sparkContext.defaultParallelism
    sel = sel.repartition(parallelism, "path").sortWithinPartitions(
        "path", "offset"
    )

    def run(batches):
        held_path, held = None, None

        def fetch(p, off, ln):
            nonlocal held_path, held
            scheme, rest = _split_scheme(p)
            if scheme in ("", "file"):
                lp = _local_path(scheme, rest, p)
                if held_path != lp:
                    if held is not None:
                        held.close()
                    held = open(lp, "rb")
                    held_path = lp
                held.seek(off)
                return held.read(ln)
            return _open_ranged(p, off, ln)

        try:
            for batch in batches:
                pend, pend_err = [], 0
                for row in batch.to_pylist():
                    p, off, ln = (row["path"], int(row["offset"]),
                                  int(row["length"]))
                    result = parse_warc_bytes(
                        fetch(p, off, ln),
                        filename=p.rsplit("/", 1)[-1],
                        **read_opts,
                    )
                    for r in result["records"]:
                        r["offset"] += off
                        pend.append(r)
                    pend_err += result["err_count"]
                yield from _records_to_batches(
                    {"records": pend, "err_count": pend_err, "error": None},
                    include_payload, include_content, arrow_schema,
                )
        finally:
            if held is not None:
                held.close()

    return sel.mapInArrow(run, WARC_RECORDS_SCHEMA)


def pages_from_records(records: DataFrame, lang_default: str = "",
                       detect_lang: bool = False) -> DataFrame:
    """Project a warc_records DataFrame to the north-rule ``pages`` shape
    (url, warc_ts, html, text, lang): response records only, text = the
    byte-identical extracted content decoded with the reference fallback.
    ``detect_lang=True`` fills lang with the marker-token heuristic
    (operators.textstats), JVM-side."""
    from warcio_spark import functions as WF

    resp = records.filter(F.col("rec_type") == "response")
    pages = resp.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("payload").alias("html"),
        WF.decode_text(F.col("content")).alias("text"),
    )
    if not detect_lang:
        return pages.withColumn("lang", F.lit(lang_default))
    from warcio_spark.operators.textstats import LANG_MARKERS, lang_scores

    staged = pages.withColumn("_s", lang_scores("text"))
    langs = list(LANG_MARKERS)
    total = sum((F.col("_s.score_" + l) for l in langs[1:]),
                F.col("_s.score_" + langs[0]))
    pred = F.when(total == 0, F.lit(lang_default or "und"))
    remaining = langs
    for i, l in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = F.col("_s.score_" + l) >= F.col("_s.score_" + other)
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond if cond is not None else F.lit(True), F.lit(l))
    return staged.withColumn("lang", pred).drop("_s")
