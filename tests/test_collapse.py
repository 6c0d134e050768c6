"""CDX collapse= (operators/indexer.collapse_captures): wayback
adjacency semantics — change-back captures survive (A B A -> A B A),
timestamp:N prefix form, NULL keys, python oracle, parallelism."""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.indexer import collapse_captures


def _oracle(rows, key_of):
    by = defaultdict(list)
    for r in rows:
        by[r[0]].append(r)
    out = []
    for k, caps in by.items():
        caps.sort(key=lambda r: (r[1], r[2]))
        prev = object()  # matches nothing
        for r in caps:
            ck = key_of(r)
            if ck is None or prev is None or ck != prev:
                out.append(r)
            prev = ck
    return sorted(out)


def _run(spark, rows, parts=None, **kw):
    df = spark.createDataFrame(
        rows, "urlkey string, timestamp string, url string, digest string")
    if parts:
        df = df.repartition(parts)
    return sorted(tuple(r) for r in collapse_captures(df, **kw).collect())


def test_digest_change_back_survives(spark):
    rows = [
        ("k)/", "20240101000000", "http://k/", "A"),
        ("k)/", "20240102000000", "http://k/", "A"),  # squashed
        ("k)/", "20240103000000", "http://k/", "B"),
        ("k)/", "20240104000000", "http://k/", "A"),  # change-back KEPT
        ("k)/", "20240105000000", "http://k/", "A"),  # squashed
        # other urlkey: its own adjacency stream
        ("m)/", "20240101000000", "http://m/", "A"),
    ]
    got = _run(spark, rows, field="digest")
    assert [r[1] for r in got if r[0] == "k)/"] == [
        "20240101000000", "20240103000000", "20240104000000"]
    assert len([r for r in got if r[0] == "m)/"]) == 1


def test_timestamp_prefix_form(spark):
    rows = [("k)/", "2024%02d%02d000000" % (m, dd), "http://k/", "D")
            for m in (1, 2) for dd in (1, 2, 3)]
    got = _run(spark, rows, field="timestamp", prefix=6)
    assert [r[1] for r in got] == ["20240101000000", "20240201000000"]
    # prefix=8 keeps one per day
    assert len(_run(spark, rows, field="timestamp", prefix=8)) == 6


def test_null_keys_always_survive(spark):
    rows = [
        ("k)/", "20240101000000", "http://k/", "A"),
        ("k)/", "20240102000000", "http://k/", None),
        ("k)/", "20240103000000", "http://k/", None),
        ("k)/", "20240104000000", "http://k/", "A"),
    ]
    got = _run(spark, rows, field="digest")
    assert len(got) == 4


def test_matches_python_oracle_pseudorandom(spark):
    rows = []
    for i in range(500):
        rows.append(("u%d)/" % (i % 23),
                     "2024%010d" % ((i * 7919) % 10**10),
                     "http://u%d/" % (i % 23),
                     "D%d" % ((i * 13) % 4)))
    exp = _oracle(rows, lambda r: r[3])
    got = _run(spark, rows, field="digest")
    assert got == exp
    exp6 = _oracle(rows, lambda r: r[1][:6])
    got6 = _run(spark, rows, field="timestamp", prefix=6)
    assert got6 == exp6


def test_narrow_projection_without_url_column(spark):
    # (urlkey, timestamp, digest) frames — the change_rate_table input
    # shape — must work: the url tie-break is skipped when absent
    df = spark.createDataFrame(
        [("k)/", "20240101000000", "A"), ("k)/", "20240102000000", "A"),
         ("k)/", "20240103000000", "B")],
        "urlkey string, timestamp string, digest string")
    got = collapse_captures(df, field="digest").collect()
    assert sorted(r.timestamp for r in got) == [
        "20240101000000", "20240103000000"]


def test_parallelism_invariance(spark):
    rows = [("u%d)/" % (i % 7), "20240%d01000000" % (i % 9 + 1),
             "http://u%d/" % (i % 7), "D%d" % (i % 3))
            for i in range(300)]
    a = _run(spark, rows, field="digest")
    b = _run(spark, rows, parts=16, field="digest")
    assert a == b
