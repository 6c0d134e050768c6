"""CLI with the reference's command surface (warcio/cli.py:19-62), Spark-backed:

    python -m warcio_spark.cli index  <inputs...> -f offset,warc-type,warc-target-uri
    python -m warcio_spark.cli check  <inputs...> [-v]
    python -m warcio_spark.cli extract <input> <offset> [--payload|--headers]
    python -m warcio_spark.cli recompress <input> <output-dir>
    python -m warcio_spark.cli ingest <warc-dir> --state DIR
    python -m warcio_spark.cli fetch --index idx.cdxj --base DIR [filters]
    python -m warcio_spark.cli zipnum <inputs...> --out DIR [--lines-per-block N]
    python -m warcio_spark.cli lookup DIR <urlkey-prefix>
    python -m warcio_spark.cli compact DIR [DIR...] --out DIR [--dedup]
    python -m warcio_spark.cli diff <index...> --a-from F --a-to T --b-from F --b-to T
    python -m warcio_spark.cli audit <urls.txt...> --robots-dir DIR
    python -m warcio_spark.cli crawl --seeds N --rounds K --state DIR

index emits the same NDJSON lines as ``warcio index`` (field mini-DSL,
null-dropping, per-file input order).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from warcio_spark.session import get_spark

    return get_spark("warcio_spark-cli")


def cmd_index(args) -> int:
    from pyspark.sql import functions as F

    from warcio_spark.operators.indexer import index_ndjson
    from warcio_spark.sources import read_warc

    spark = _spark()
    fields = args.fields.split(",")
    # http fields needed? prune body parse like warcio/indexer.py:19
    needs_http = any(f.startswith("http:") for f in fields)
    recs = read_warc(
        spark, args.inputs, arc2warc=True, parse_http=needs_http,
        include_payload=False, include_content=False,
    )
    # emit in input order (the reference concatenates inputs,
    # warcio/indexer.py:25-33), then record order within each file
    basenames = [p.rsplit("/", 1)[-1] for p in args.inputs]
    file_pos = F.array_position(
        F.array(*[F.lit(b) for b in basenames]), F.col("filename")
    )
    out = index_ndjson(recs.orderBy(file_pos, F.col("offset")), fields)
    for row in out.collect():
        sys.stdout.write(row.line + "\n")
    return 0


def cmd_check(args) -> int:
    from warcio_spark.operators.checker import digest_report, exit_value
    from warcio_spark.sources import read_warc

    spark = _spark()
    recs = read_warc(spark, args.inputs, check_digests=True,
                     include_payload=False, include_content=False)
    report = digest_report(recs).orderBy("filename").collect()
    for r in report:
        sys.stdout.write(
            json.dumps(
                {
                    "filename": r.filename,
                    "records": r.n_records,
                    "pass": r.n_pass,
                    "fail": r.n_fail,
                    "unchecked": r.n_unchecked,
                    "file_error": r.file_error,
                }
            )
            + "\n"
        )
    return exit_value(recs)


def cmd_extract(args) -> int:
    from warcio_spark.kernels.parse import parse_warc_bytes

    with open(args.input, "rb") as f:
        data = f.read()
    result = parse_warc_bytes(data, filename=args.input,
                              start_offset=args.offset, max_records=1)
    if not result["records"]:
        sys.stderr.write("no record at offset {0}\n".format(args.offset))
        return 1
    rec = result["records"][0]
    if args.payload:
        sys.stdout.buffer.write(rec["content"])
    elif args.headers:
        for n, v in rec["rec_headers"]:
            sys.stdout.write("{0}: {1}\n".format(n, v))
    else:
        from warcio_spark.kernels.build import serialize_record

        sys.stdout.buffer.write(serialize_record(rec, gzip=False))
    return 0


def cmd_recompress(args) -> int:
    from warcio_spark.operators.writer import recompress

    spark = _spark()
    paths = recompress(spark, args.input, args.output)
    for p in paths:
        sys.stdout.write(p + "\n")
    return 0


def cmd_ingest(args) -> int:
    """Batch-incremental exactly-once ingest of a WARC directory into a
    committed records table (sources/incremental.py)."""
    from warcio_spark.sources.incremental import ingest_warc_incremental

    spark = _spark()
    summary = ingest_warc_incremental(spark, args.input_dir, args.state)
    sys.stdout.write(json.dumps(summary) + "\n")
    return 0


def cmd_wet(args) -> int:
    """WARC(s) -> WET conversion records written as .warc.gz (the
    Common-Crawl derivation as one shuffle-free job; operators/wet.py)."""
    from warcio_spark.operators.wet import derive_wat, derive_wet
    from warcio_spark.operators.writer import write_warc
    from warcio_spark.sources import read_warc

    spark = _spark()
    recs = read_warc(spark, args.inputs)
    derived = derive_wat(recs) if args.wat else derive_wet(recs)
    for p in write_warc(derived, args.output, gzip=True,
                        files=args.files):
        sys.stdout.write(p + "\n")
    return 0


def cmd_cdxj(args) -> int:
    """WARC(s) -> CDXJ capture-index lines on stdout, in (urlkey,
    timestamp) merge order (operators/indexer.py:index_cdxj); --cdx11
    emits the classic 11-field Wayback format (with its header line)
    instead."""
    from warcio_spark.operators.indexer import (
        CDX11_HEADER,
        index_cdx11,
        index_cdxj,
    )
    from warcio_spark.sources import read_warc

    spark = _spark()
    recs = read_warc(spark, args.inputs, include_payload=False,
                     include_content=False)
    # "line" as final key = deterministic total order for same-second
    # captures of the same urlkey (request vs response records).
    if getattr(args, "cdx11", False):
        lines = index_cdx11(recs)
        sys.stdout.write(CDX11_HEADER + "\n")
    else:
        lines = index_cdxj(recs)
    lines = lines.orderBy("urlkey", "timestamp", "line")
    for r in lines.select("line").toLocalIterator():
        sys.stdout.write(r.line + "\n")
    return 0


def cmd_zipnum(args) -> int:
    """WARC(s) -> a ZipNum sharded CDX(J) cluster on disk
    (sources/zipnum.write_zipnum): gzip blocks of --lines-per-block
    capture lines plus the cluster.idx secondary index. --cdx11 packs
    the classic 11-field format instead of CDXJ."""
    from warcio_spark.operators.indexer import index_cdx11, index_cdxj
    from warcio_spark.sources import read_warc
    from warcio_spark.sources.zipnum import write_zipnum

    spark = _spark()
    recs = read_warc(spark, args.inputs, include_payload=False,
                     include_content=False)
    idx = index_cdx11(recs) if args.cdx11 else index_cdxj(recs)
    write_zipnum(idx.select("line"), args.out,
                 lines_per_block=args.lines_per_block)
    return 0


def cmd_compact(args) -> int:
    """Merge several ZipNum clusters into one new cluster
    (sources/zipnum.compact_zipnum) — the periodic recompaction of the
    incremental-index lifecycle. --dedup drops byte-identical lines from
    overlapping delta windows."""
    from warcio_spark.sources.zipnum import compact_zipnum

    spark = _spark()
    compact_zipnum(spark, args.cluster, args.out,
                   lines_per_block=args.lines_per_block, dedup=args.dedup)
    return 0


def cmd_lookup(args) -> int:
    """Prefix lookup against one or MORE ZipNum clusters
    (sources/zipnum.zipnum_prefix / zipnum_prefix_multi — several
    clusters is the incremental-index shape: historical cluster plus
    delta clusters, merged at query time): prints matching index lines
    in merge order, touching only the gzip blocks whose key range can
    contain the prefix. Single-cluster queries also take the CDX
    pagination API: --show-num-pages, or --page N --page-size M
    (zipnum_num_pages / zipnum_page)."""
    from warcio_spark.sources.zipnum import (
        zipnum_num_pages,
        zipnum_page,
        zipnum_prefix_multi,
    )

    spark = _spark()
    paged = args.show_num_pages or args.page is not None
    if paged and len(args.cluster) != 1:
        sys.stderr.write("pagination requires exactly one cluster\n")
        return 2
    if args.show_num_pages:
        n = zipnum_num_pages(spark, args.cluster[0], args.page_size,
                             prefix=args.prefix)
        sys.stdout.write(json.dumps(
            {"pages": n, "pageSize": args.page_size}) + "\n")
        return 0
    if args.page is not None:
        lines = zipnum_page(spark, args.cluster[0], args.page,
                            args.page_size, prefix=args.prefix)
    else:
        lines = zipnum_prefix_multi(spark, args.cluster, args.prefix)
    for r in lines.orderBy("line").toLocalIterator():
        sys.stdout.write(r.line + "\n")
    return 0


def cmd_cdxq(args) -> int:
    """CDX-server query over flat CDXJ/CDX11 index file(s)
    (sources/cdxj.cdx_query — the IA/pywb CDX Server API as a batch
    verb): --url + --match-type, --from/--to prefix bounds, repeatable
    --filter [!]field:regex, --collapse field[:N], --limit/--reverse,
    --fl projection. Prints the original index lines in server order
    (urlkey asc, timestamp — reversed within urlkey by --reverse);
    with --fl, space-joined field values (the server's fl= output,
    NULL as '-')."""
    from pyspark.sql import functions as F

    from warcio_spark.sources.cdxj import (
        cdx_query,
        parse_cdx11_lines,
        parse_cdxj_lines,
    )

    spark = _spark()
    raw = spark.read.text(args.inputs).withColumnRenamed("value", "line")
    parser = parse_cdx11_lines if args.cdx11 else parse_cdxj_lines
    idx = parser(raw, keep=("line",)).filter(F.col("urlkey").isNotNull())
    out = cdx_query(
        idx, url=args.url, match_type=args.match_type,
        from_ts=args.from_ts, to_ts=args.to_ts,
        filters=args.filter or (), collapse=args.collapse,
        limit=args.limit, reverse=args.reverse)
    direction = (lambda c: c.desc()) if args.reverse else (lambda c: c.asc())
    out = out.orderBy(F.col("urlkey").asc(), direction(F.col("timestamp")),
                      direction(F.col("url")))
    if args.fl:
        fields = [f.strip() for f in args.fl.split(",")]
        cols = [F.coalesce(F.col(f).cast("string"), F.lit("-"))
                for f in fields]
        out = out.select(F.concat_ws(" ", *cols).alias("line"))
    for r in out.select("line").toLocalIterator():
        sys.stdout.write(r.line + "\n")
    return 0


def cmd_diff(args) -> int:
    """Crawl-over-crawl diff over flat CDXJ/CDX11 index file(s)
    (sources/cdxj.capture_diff): classify every urlkey captured in
    window A (--a-from/--a-to) or window B (--b-from/--b-to) as
    added/gone/changed/unchanged. Default output is the per-class
    summary (``change  n_urls  captures_a  captures_b`` TSV); --list
    prints one TSV line per urlkey instead."""
    from pyspark.sql import functions as F

    from warcio_spark.sources.cdxj import (
        capture_diff,
        capture_diff_summary,
        parse_cdx11_lines,
        parse_cdxj_lines,
    )

    spark = _spark()
    raw = spark.read.text(args.inputs).withColumnRenamed("value", "line")
    parser = parse_cdx11_lines if args.cdx11 else parse_cdxj_lines
    idx = parser(raw).filter(F.col("urlkey").isNotNull())
    diff = capture_diff(idx, (args.a_from, args.a_to),
                        (args.b_from, args.b_to))
    dash = lambda c: F.coalesce(F.col(c).cast("string"), F.lit("-"))  # noqa: E731
    if args.list:
        out = diff.orderBy("urlkey").select(F.concat_ws(
            "\t", "urlkey", "change", dash("url"),
            dash("digest_a"), dash("digest_b")).alias("line"))
        for r in out.toLocalIterator():
            sys.stdout.write(r.line + "\n")
        return 0
    for r in capture_diff_summary(diff).orderBy("change").collect():
        sys.stdout.write("%s\t%d\t%d\t%d\n" % (
            r.change, r.n_urls, r.captures_a, r.captures_b))
    return 0


def cmd_audit(args) -> int:
    """Robots compliance audit (plans/frontier.robots_audit): re-check
    urls — one per line in the input file(s) — against rules built from
    fetched robots.txt bodies (--robots-dir: one file per host, the
    file NAME is the host). Prints ``DENY\\turl`` lines for violations
    (the review queue); --all prints every url with its verdict.
    Exit status 1 if any url is denied, 0 otherwise (the same
    fold-to-exit contract as the check verb)."""
    import os

    from pyspark.sql import functions as F

    from warcio_spark.plans.frontier import (
        robots_audit,
        robots_table_from_pages,
    )

    spark = _spark()
    bodies = []
    for name in sorted(os.listdir(args.robots_dir)):
        p = os.path.join(args.robots_dir, name)
        if os.path.isfile(p):
            with open(p, "rb") as f:
                # audited hosts are lowercased by canonicalization; a
                # case-preserving file name must not silently miss
                bodies.append((name.lower(), f.read()))
    if not bodies:
        sys.stderr.write("no robots files in %s\n" % args.robots_dir)
        return 2
    rules = robots_table_from_pages(
        spark.createDataFrame(bodies, "host string, body binary"),
        user_agent=args.user_agent)
    urls = (spark.read.text(args.inputs)
            .withColumnRenamed("value", "url")
            .filter(F.length(F.trim("url")) > 0)
            .select(F.trim("url").alias("url")))
    audited = robots_audit(urls, rules)
    if not args.all:
        audited = audited.filter(~F.col("allowed"))
    denied = 0
    for r in audited.orderBy("url").toLocalIterator():
        verdict = "ALLOW" if r.allowed else "DENY"
        denied += 0 if r.allowed else 1
        sys.stdout.write("%s\t%s\n" % (verdict, r.url))
    return 1 if denied else 0


def cmd_fetch(args) -> int:
    """Index-driven targeted fetch (the pywb replay-lookup shape as one
    job): filter a CDXJ capture index, read ONLY the pointed-at byte
    ranges from the archives (sources/cdxj.read_cdxj +
    sources/warc.read_warc_entries), then re-archive the records with
    --output or list them as NDJSON on stdout."""
    from pyspark.sql import functions as F

    from warcio_spark.sources import read_cdx11, read_cdxj, read_warc_entries

    spark = _spark()
    reader = read_cdx11 if getattr(args, "cdx11", False) else read_cdxj
    idx = reader(spark, args.index).filter(F.col("urlkey").isNotNull())
    if args.urlkey_prefix:
        idx = idx.filter(F.col("urlkey").startswith(args.urlkey_prefix))
    if args.status is not None:
        idx = idx.filter(F.col("status") == args.status)
    if args.mime:
        idx = idx.filter(F.col("mime") == args.mime)
    fetched = read_warc_entries(spark, idx, base=args.base)
    if args.output:
        from warcio_spark.operators.writer import write_warc

        for p in write_warc(fetched, args.output, gzip=True,
                            files=args.files):
            sys.stdout.write(p + "\n")
        return 0
    rows = (
        fetched.select("filename", "offset", "rec_type", "url")
        .orderBy("filename", "offset")
        .collect()
    )
    for r in rows:
        sys.stdout.write(json.dumps(
            {"filename": r.filename, "offset": r.offset,
             "rec_type": r.rec_type, "url": r.url}) + "\n")
    return 0


def cmd_archive(args) -> int:
    """pages table (parquet path or --pages N synthetic) -> .warc.gz
    archives the reference library reads back (operators/writer.py:
    archive_pages), one file per partition."""
    if not args.pages and args.input is None:
        sys.stderr.write("archive: provide a pages parquet path or --pages N\n")
        return 2
    spark = _spark()
    from warcio_spark.operators.writer import archive_pages

    if args.pages:
        from warcio_spark.sources import synth_pages

        pages = synth_pages(spark, args.pages)
    else:
        pages = spark.read.parquet(args.input)
    for p in archive_pages(pages, args.output, files=args.files,
                           dedup=args.dedup):
        sys.stdout.write(p + "\n")
    return 0


def cmd_crawl(args) -> int:
    from pyspark.sql import functions as F

    if args.archive and not args.pages:
        sys.stderr.write("crawl: --archive requires --pages "
                         "(only corpus fetches can be archived)\n")
        return 2

    from warcio_spark.plans.crawl import crawl
    from warcio_spark.plans.frontier import demo_robots

    spark = _spark()
    if args.pages:
        # real link discovery: seeds are urls of a synthetic pages corpus;
        # each round fetches scheduled urls from it and feeds the anchors
        # extracted from the fetched html back into the frontier
        from warcio_spark.operators.links import page_outlinks_fn
        from warcio_spark.sources import synth_pages

        pages = synth_pages(spark, args.pages)
        # deterministic seed set: the urls of pages 0..seeds-1 (limit()
        # without an order would be partitioning-dependent)
        seeds = synth_pages(spark, min(args.seeds, args.pages)).select(
            "url",
            (F.pmod(F.xxhash64("url"), F.lit(1000)) / 10.0).alias("priority"),
            F.xxhash64("url").alias("seq"),
        )
        outlinks_fn = page_outlinks_fn(pages)
    else:
        seeds = spark.range(args.seeds).select(
            F.concat(F.lit("http://host"), F.pmod("id", F.lit(97)).cast("string"),
                     F.lit(".example.com/seed/"), F.col("id").cast("string")).alias("url"),
            (F.pmod(F.col("id") * 7919, F.lit(1000)) / 10.0).alias("priority"),
            F.col("id").alias("seq"),
        )
        from warcio_spark.plans.crawl import default_outlinks as outlinks_fn
    summary = crawl(spark, seeds, demo_robots(spark), args.state,
                    rounds=args.rounds, outlinks_fn=outlinks_fn,
                    recrawl_ttl=args.recrawl_ttl or None)
    if args.archive:
        # archive every fetched page as reference-readable WARC: join the
        # crawl's fetch log back to the corpus on the canonical-url hash
        from pyspark.sql import Window

        from warcio_spark.operators.writer import archive_pages
        from warcio_spark.plans.crawl import fetch_log
        from warcio_spark.plans.frontier import with_frontier_keys

        log = fetch_log(spark, args.state)
        if log is None:
            summary["archived_files"] = 0
        else:
            hashes = log.select(
                F.xxhash64("url_canon").alias("url_hash")
            ).distinct()
            # one archived capture per fetch: a corpus with duplicate-url
            # rows (re-crawled captures) keeps only the LATEST one
            w = Window.partitionBy("url_hash").orderBy(
                F.col("warc_ts").desc(), "url"
            )
            keyed = (
                with_frontier_keys(pages)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
            )
            paths = archive_pages(
                keyed.join(hashes, "url_hash").select("url", "warc_ts", "html"),
                args.archive,
            )
            summary["archived_files"] = len(paths)
    sys.stdout.write(json.dumps(summary) + "\n")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="warcio_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument("inputs", nargs="+")
    pi.add_argument("-f", "--fields", default="offset,warc-type,warc-target-uri")
    pi.set_defaults(fn=cmd_index)

    pc = sub.add_parser("check")
    pc.add_argument("inputs", nargs="+")
    pc.add_argument("-v", "--verbose", action="store_true")
    pc.set_defaults(fn=cmd_check)

    pe = sub.add_parser("extract")
    pe.add_argument("input")
    pe.add_argument("offset", type=int)
    g = pe.add_mutually_exclusive_group()
    g.add_argument("--payload", action="store_true")
    g.add_argument("--headers", action="store_true")
    pe.set_defaults(fn=cmd_extract)

    pr = sub.add_parser("recompress")
    pr.add_argument("input")
    pr.add_argument("output")
    pr.set_defaults(fn=cmd_recompress)

    pg = sub.add_parser("ingest")
    pg.add_argument("input_dir")
    pg.add_argument("--state", required=True)
    pg.set_defaults(fn=cmd_ingest)

    pt = sub.add_parser("wet")
    pt.add_argument("inputs", nargs="+")
    pt.add_argument("--output", required=True)
    pt.add_argument("--wat", action="store_true",
                    help="emit WAT metadata records instead of WET text")
    pt.add_argument("--files", type=int, default=None,
                    help="repartition output into N files")
    pt.set_defaults(fn=cmd_wet)

    pj = sub.add_parser("cdxj")
    pj.add_argument("inputs", nargs="+")
    pj.add_argument("--cdx11", action="store_true",
                    help="classic 11-field CDX (' CDX N b a m s k r M S "
                         "V g') instead of CDXJ")
    pj.set_defaults(fn=cmd_cdxj)

    pz = sub.add_parser("zipnum")
    pz.add_argument("inputs", nargs="+")
    pz.add_argument("--out", required=True, help="cluster output dir")
    pz.add_argument("--lines-per-block", type=int, default=3000)
    pz.add_argument("--cdx11", action="store_true",
                    help="pack classic 11-field CDX lines instead of CDXJ")
    pz.set_defaults(fn=cmd_zipnum)

    pm = sub.add_parser("compact")
    pm.add_argument("cluster", nargs="+", help="input ZipNum cluster dirs")
    pm.add_argument("--out", required=True, help="compacted cluster dir")
    pm.add_argument("--lines-per-block", type=int, default=3000)
    pm.add_argument("--dedup", action="store_true",
                    help="drop byte-identical lines across inputs")
    pm.set_defaults(fn=cmd_compact)

    pl = sub.add_parser("lookup")
    pl.add_argument("cluster", nargs="+",
                    help="ZipNum cluster dir(s); several = query-time "
                         "merge (incremental indexing)")
    pl.add_argument("prefix", help="urlkey prefix to look up")
    pl.add_argument("--page", type=int, default=None,
                    help="0-based page of --page-size blocks (single "
                         "cluster only)")
    pl.add_argument("--page-size", type=int, default=1,
                    help="page size in ZipNum blocks (IA pageSize)")
    pl.add_argument("--show-num-pages", action="store_true",
                    help="print the page count (IA showNumPages)")
    pl.set_defaults(fn=cmd_lookup)

    pq = sub.add_parser("cdxq")
    pq.add_argument("inputs", nargs="+", help="CDXJ/CDX11 index file(s)")
    pq.add_argument("--url", default=None)
    pq.add_argument("--match-type", default="exact",
                    choices=["exact", "prefix", "host", "domain"])
    pq.add_argument("--from", dest="from_ts", default=None,
                    help="1-14 digit timestamp lower bound (pads down)")
    pq.add_argument("--to", dest="to_ts", default=None,
                    help="1-14 digit timestamp upper bound (pads UP)")
    pq.add_argument("--filter", action="append",
                    help="[!]field:regex, repeatable (anchored match)")
    pq.add_argument("--collapse", default=None, help="field or field:N")
    pq.add_argument("--limit", type=int, default=None)
    pq.add_argument("--reverse", action="store_true")
    pq.add_argument("--fl", default=None,
                    help="comma-separated output fields")
    pq.add_argument("--cdx11", action="store_true",
                    help="inputs are classic 11-field CDX")
    pq.set_defaults(fn=cmd_cdxq)

    pd = sub.add_parser("diff")
    pd.add_argument("inputs", nargs="+", help="CDXJ/CDX11 index file(s)")
    pd.add_argument("--a-from", required=True,
                    help="window A lower bound (1-14 digits, pads down)")
    pd.add_argument("--a-to", required=True,
                    help="window A upper bound (pads UP)")
    pd.add_argument("--b-from", required=True)
    pd.add_argument("--b-to", required=True)
    pd.add_argument("--list", action="store_true",
                    help="per-urlkey TSV lines instead of the summary")
    pd.add_argument("--cdx11", action="store_true",
                    help="inputs are classic 11-field CDX")
    pd.set_defaults(fn=cmd_diff)

    pu = sub.add_parser("audit")
    pu.add_argument("inputs", nargs="+",
                    help="text file(s) with one url per line")
    pu.add_argument("--robots-dir", required=True,
                    help="directory of robots.txt bodies, one file per "
                         "host (file name = host)")
    pu.add_argument("--user-agent", default="*")
    pu.add_argument("--all", action="store_true",
                    help="print every url with its verdict, not just "
                         "denials")
    pu.set_defaults(fn=cmd_audit)

    pf = sub.add_parser("fetch")
    pf.add_argument("--index", required=True,
                    help="CDXJ index path/glob (output of the cdxj verb)")
    pf.add_argument("--cdx11", action="store_true",
                    help="the index is classic 11-field CDX "
                         "(output of cdxj --cdx11)")
    pf.add_argument("--base", required=True,
                    help="directory the index's filename column resolves "
                         "against")
    pf.add_argument("--urlkey-prefix", default=None)
    pf.add_argument("--status", type=int, default=None)
    pf.add_argument("--mime", default=None)
    pf.add_argument("--output", default=None,
                    help="write fetched records as .warc.gz here instead "
                         "of listing them")
    pf.add_argument("--files", type=int, default=None)
    pf.set_defaults(fn=cmd_fetch)

    pa = sub.add_parser("archive")
    pa.add_argument("input", nargs="?", default=None,
                    help="pages parquet path (omit with --pages)")
    pa.add_argument("--output", required=True)
    pa.add_argument("--pages", type=int, default=0,
                    help="archive a synthetic pages corpus of this size")
    pa.add_argument("--files", type=int, default=None)
    pa.add_argument("--dedup", action="store_true",
                    help="write duplicate payloads as revisit records")
    pa.set_defaults(fn=cmd_archive)

    pw = sub.add_parser("crawl")
    pw.add_argument("--seeds", type=int, default=1000)
    pw.add_argument("--rounds", type=int, default=3)
    pw.add_argument("--state", required=True)
    pw.add_argument("--pages", type=int, default=0,
                    help="crawl a synthetic pages corpus of this size with "
                         "real link extraction (0 = synthetic expansion)")
    pw.add_argument("--archive", default=None,
                    help="with --pages: write every fetched page as "
                         ".warc.gz to this directory after the crawl")
    pw.add_argument("--recrawl-ttl", type=int, default=0,
                    help="re-fetch urls whose last fetch is at least this "
                         "many rounds old (0 = never re-fetch)")
    pw.set_defaults(fn=cmd_crawl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
