"""ZipNum sharded index (sources/zipnum): round-trip exactness vs the
flat CDXJ line set, prefix-lookup equivalence with a full scan, and
block-level pruning actually skipping blocks."""

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from warcio_spark.operators.indexer import index_cdxj
from warcio_spark.sources.warc import read_warc
from warcio_spark.sources.zipnum import (
    SUMMARY_NAME,
    read_summary,
    read_zipnum,
    write_zipnum,
    zipnum_prefix,
)

CORPUS = "/root/reference/test/data"


def _synthetic_lines(spark, n=500):
    d = F.col("id")
    s = lambda x: x.cast("string")  # noqa: E731
    line = F.concat(
        F.lit("com,example,host"), s(d % 41), F.lit(")/p/"), s(d),
        F.lit(" 2024"), F.lpad(s(d % 12 + 1), 2, "0"),
        F.lpad(s(d % 28 + 1), 2, "0"), F.lit("120000"),
        F.lit(' {"url": "http://host'), s(d % 41),
        F.lit('.example.com/p/'), s(d), F.lit('"}'),
    )
    return spark.range(n).select(line.alias("line"))


def test_roundtrip_exact_synthetic(spark, tmp_path):
    out = str(tmp_path / "cluster")
    lines = _synthetic_lines(spark)
    write_zipnum(lines, out, lines_per_block=37, num_parts=5)
    got = sorted(r["line"] for r in read_zipnum(spark, out).collect())
    want = sorted(r["line"] for r in lines.collect())
    assert got == want
    # summary accounting: block line counts sum to the corpus
    summ = read_summary(spark, out).collect()
    assert sum(r["n_lines"] for r in summ) == len(want)
    assert all(r["n_lines"] <= 37 for r in summ)
    # summary keys are the first "urlkey ts" of each block, in order
    keys = [r["key"] for r in summ]
    assert keys == sorted(keys)


def test_roundtrip_real_corpus_cdxj(spark, tmp_path):
    recs = read_warc(spark, os.path.join(CORPUS, "example.warc.gz"))
    lines = index_cdxj(recs).select("line")
    out = str(tmp_path / "cluster")
    write_zipnum(lines, out, lines_per_block=2, num_parts=2)
    got = sorted(r["line"] for r in read_zipnum(spark, out).collect())
    assert got == sorted(r["line"] for r in lines.collect())
    assert len(got) > 0


def test_prefix_lookup_equals_full_scan(spark, tmp_path):
    out = str(tmp_path / "cluster")
    lines = _synthetic_lines(spark, 400)
    write_zipnum(lines, out, lines_per_block=19, num_parts=4)
    for prefix in ("com,example,host7)/", "com,example,host13)/p/13",
                   "com,example,nosuch"):
        got = sorted(
            r["line"] for r in zipnum_prefix(spark, out, prefix).collect())
        want = sorted(
            r["line"]
            for r in lines.filter(F.col("line").startswith(prefix)).collect())
        assert got == want, prefix


def test_prefix_lookup_prunes_blocks(spark, tmp_path):
    out = str(tmp_path / "cluster")
    write_zipnum(_synthetic_lines(spark, 500), out,
                 lines_per_block=13, num_parts=4)
    n_blocks = read_summary(spark, out).count()
    assert n_blocks > 10
    # reproduce the survivor filter and check it's a small subset
    from pyspark.sql import Window

    specs = read_summary(spark, out)
    prefix = "com,example,host9)/"
    hi = prefix + "￿"
    w = Window.orderBy("part", "offset")
    surv = (
        specs.withColumn("nk", F.lead("key").over(w))
        .filter((F.col("key") <= hi)
                & (F.col("nk").isNull() | (F.col("nk") >= prefix)))
        .count()
    )
    assert surv < n_blocks / 2
    # and the pruned lookup still finds every match
    got = zipnum_prefix(spark, out, prefix).count()
    assert got == 500 // 41 + (1 if 9 < 500 % 41 else 0)


def test_blocks_are_independent_gzip_members(spark, tmp_path):
    out = str(tmp_path / "cluster")
    write_zipnum(_synthetic_lines(spark, 100), out,
                 lines_per_block=7, num_parts=2)
    summ = sorted(read_summary(spark, out).collect(),
                  key=lambda r: (r["part"], r["offset"]))
    # each (offset, length) span decompresses standalone
    for r in summ[:5]:
        with open(os.path.join(out, r["part"]), "rb") as f:
            f.seek(r["offset"])
            raw = gzip.decompress(f.read(r["length"]))
        assert len(raw.decode().splitlines()) == r["n_lines"]
    # part files concatenated in pid order are globally sorted
    all_lines = []
    for p in sorted(glob.glob(os.path.join(out, "part-*.gz"))):
        all_lines.extend(gzip.decompress(open(p, "rb").read())
                         .decode().splitlines())
    assert all_lines == sorted(all_lines)
    assert os.path.exists(os.path.join(out, SUMMARY_NAME))


def test_rejects_bad_block_size(spark, tmp_path):
    with pytest.raises(ValueError):
        write_zipnum(_synthetic_lines(spark, 5), str(tmp_path / "c"), 0)


def test_block_summary_matches_written_cluster_single_part(spark, tmp_path):
    from warcio_spark.sources.zipnum import zipnum_block_summary

    lines = _synthetic_lines(spark, 120)
    out = str(tmp_path / "cluster")
    write_zipnum(lines, out, lines_per_block=11, num_parts=1)
    written = sorted(read_summary(spark, out).collect(),
                     key=lambda r: r["offset"])
    tracker = []
    computed = sorted(
        zipnum_block_summary(lines, 11, persist_tracker=tracker).collect(),
        key=lambda r: r["block_id"])
    assert [(r["key"], r["n_lines"]) for r in written] == [
        (r["first_key"], r["n_lines"]) for r in computed]
    for c in tracker:
        c.unpersist()


def test_pagination_pages_union_equals_prefix(spark, tmp_path):
    from warcio_spark.sources.zipnum import zipnum_num_pages, zipnum_page

    out = str(tmp_path / "cluster")
    lines = _synthetic_lines(spark, 400)
    write_zipnum(lines, out, lines_per_block=19, num_parts=4)
    for prefix in (None, "com,example,host7)/", "com,example,nosuch"):
        n_blocks = (read_summary(spark, out).count() if prefix is None
                    else None)
        pages = zipnum_num_pages(spark, out, 3, prefix=prefix)
        if prefix is None:
            assert pages == -(-n_blocks // 3)
        got = []
        for p in range(pages):
            got.extend(r["line"]
                       for r in zipnum_page(spark, out, p, 3,
                                            prefix=prefix).collect())
        if prefix is None:
            want = [r["line"] for r in lines.collect()]
        else:
            want = [r["line"] for r in
                    lines.filter(F.col("line").startswith(prefix)).collect()]
        assert sorted(got) == sorted(want), prefix
        # pages are disjoint: union size == sum of page sizes
        assert len(got) == len(set(got)) or len(got) == len(want)
        # out-of-range page is empty, not an error
        assert zipnum_page(spark, out, pages, 3, prefix=prefix).count() == 0


def test_pagination_page_fetches_only_its_blocks(spark, tmp_path):
    from warcio_spark.sources.zipnum import zipnum_page

    out = str(tmp_path / "cluster")
    write_zipnum(_synthetic_lines(spark, 300), out,
                 lines_per_block=13, num_parts=3)
    summ = read_summary(spark, out).collect()
    page0 = zipnum_page(spark, out, 0, 2).count()
    # first two blocks in cluster order
    want = sum(r["n_lines"] for r in
               sorted(summ, key=lambda r: (r["part"], r["offset"]))[:2])
    assert page0 == want


def test_pagination_validation(spark, tmp_path):
    from warcio_spark.sources.zipnum import zipnum_num_pages, zipnum_page

    out = str(tmp_path / "cluster")
    write_zipnum(_synthetic_lines(spark, 50), out, lines_per_block=7,
                 num_parts=2)
    with pytest.raises(ValueError):
        zipnum_num_pages(spark, out, 0)
    with pytest.raises(ValueError):
        zipnum_page(spark, out, 0, -1)
    with pytest.raises(ValueError):
        zipnum_page(spark, out, -1, 2)


def test_paged_block_summary_matches_disk_faces(spark, tmp_path):
    """The pure-DataFrame pagination twin agrees with the materialized
    cluster: same page count, same per-page block/line accounting
    (single-shard cluster, where block ids align 1:1)."""
    from warcio_spark.sources.zipnum import (
        paged_block_summary, zipnum_num_pages)

    out = str(tmp_path / "cluster")
    lines = _synthetic_lines(spark, 200)
    write_zipnum(lines, out, lines_per_block=11, num_parts=1)
    keep = []
    pages = paged_block_summary(lines, 11, 4, persist_tracker=keep)
    rows = {r["page"]: r for r in pages.collect()}
    for df in keep:
        df.unpersist()
    assert len(rows) == zipnum_num_pages(spark, out, 4)
    summ = sorted(read_summary(spark, out).collect(),
                  key=lambda r: (r["part"], r["offset"]))
    for p, r in rows.items():
        blocks = summ[p * 4:(p + 1) * 4]
        assert r["n_blocks"] == len(blocks)
        assert r["n_lines"] == sum(b["n_lines"] for b in blocks)
        assert r["first_key"] == blocks[0]["key"]
        assert r["last_key"] == blocks[-1]["key"]


def test_compact_clusters_roundtrip_and_lookup(spark, tmp_path):
    """compact_zipnum merges historical + delta clusters into one new
    cluster: line multiset preserved (dedup=False), duplicate lines from
    overlapping deltas dropped with dedup=True, prefix lookups on the
    compacted cluster match the query-time multi-cluster merge, and the
    compacted summary is in global key order."""
    from warcio_spark.sources.zipnum import (
        compact_zipnum,
        zipnum_prefix_multi,
    )

    hist = str(tmp_path / "hist")
    d1 = str(tmp_path / "delta1")
    d2 = str(tmp_path / "delta2")
    # historical: ids 0..299; deltas overlap on purpose (250..349, 300..399)
    all_lines = _synthetic_lines(spark, 400).collect()
    lines = [r["line"] for r in all_lines]
    def _df(lo, hi):
        return spark.createDataFrame(
            [(ln,) for ln in lines[lo:hi]], ["line"])
    write_zipnum(_df(0, 300), hist, lines_per_block=23, num_parts=4)
    write_zipnum(_df(250, 350), d1, lines_per_block=7, num_parts=2)
    write_zipnum(_df(300, 400), d2, lines_per_block=7, num_parts=2)

    out = str(tmp_path / "compacted")
    compact_zipnum(spark, [hist, d1, d2], out, lines_per_block=23,
                   num_parts=3)
    got = sorted(r["line"] for r in read_zipnum(spark, out).collect())
    want = sorted(lines[0:300] + lines[250:350] + lines[300:400])
    assert got == want  # multiset: overlaps preserved by default

    out2 = str(tmp_path / "compacted_dedup")
    compact_zipnum(spark, [hist, d1, d2], out2, lines_per_block=23,
                   num_parts=3, dedup=True)
    got2 = sorted(r["line"] for r in read_zipnum(spark, out2).collect())
    assert got2 == sorted(set(lines))

    # lookup equivalence: compacted+dedup == query-time merge, deduped
    for prefix in ("com,example,host7)/", "com,example,host13)/p/13",
                   "com,example,nosuch"):
        merged = sorted(set(
            r["line"] for r in
            zipnum_prefix_multi(spark, [hist, d1, d2], prefix).collect()))
        compacted = sorted(
            r["line"] for r in zipnum_prefix(spark, out2, prefix).collect())
        assert compacted == merged, prefix

    # compacted summary in global key order; block accounting holds
    summ = read_summary(spark, out2).collect()
    keys = [r["key"] for r in summ]
    assert keys == sorted(keys)
    assert sum(r["n_lines"] for r in summ) == len(got2)


def test_compact_cli_parity(spark, tmp_path):
    """CLI compact verb == library compact_zipnum (dedup path)."""
    from warcio_spark.cli import main as cli_main
    from warcio_spark.sources.zipnum import compact_zipnum

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    all_lines = [r["line"] for r in _synthetic_lines(spark, 120).collect()]
    write_zipnum(spark.createDataFrame([(x,) for x in all_lines[:80]],
                                       ["line"]), a,
                 lines_per_block=11, num_parts=2)
    write_zipnum(spark.createDataFrame([(x,) for x in all_lines[60:]],
                                       ["line"]), b,
                 lines_per_block=11, num_parts=2)
    out_cli = str(tmp_path / "out_cli")
    assert cli_main(["compact", a, b, "--out", out_cli,
                     "--lines-per-block", "13", "--dedup"]) == 0
    out_lib = str(tmp_path / "out_lib")
    compact_zipnum(spark, [a, b], out_lib, lines_per_block=13, dedup=True)
    got = sorted(r["line"] for r in read_zipnum(spark, out_cli).collect())
    want = sorted(r["line"] for r in read_zipnum(spark, out_lib).collect())
    assert got == want == sorted(set(all_lines))
