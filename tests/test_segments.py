"""WARC segment reassembly (operators/segments.reassemble_segments):
hand cases per spec path (WARC 1.1 §§5.18-5.20), byte-identity against a
real reference-corpus payload split at arbitrary boundaries, python
oracle over a randomized universe, parallelism invariance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcio_spark.operators.segments import reassemble_segments

SCHEMA = (
    "record_id string, rec_type string, segment_number int, "
    "segment_origin_id string, segment_total_length long, payload binary"
)


def _run(spark, rows, parts=None):
    df = spark.createDataFrame(rows, SCHEMA)
    if parts:
        df = df.repartition(parts)
    return {
        r.origin_id: (
            r.rec_type,
            bytes(r.payload) if r.payload is not None else None,
            r.n_segments,
            r.actual_length,
            r.declared_total,
            r.complete,
        )
        for r in reassemble_segments(df).collect()
    }


def _seg_rows(origin, rec_type, parts, total="auto", skip=(), dup=()):
    """Build head+continuation rows for one logical record.

    ``parts`` is the list of payload bytes per segment; ``total`` =
    'auto' declares the true total on the last segment, a number
    declares that instead, None declares nothing; ``skip`` drops the
    given 1-based segment numbers; ``dup`` repeats them."""
    rows = []
    n = len(parts)
    for i, part in enumerate(parts, start=1):
        if i in skip:
            continue
        declared = None
        if i == n and total is not None:
            declared = sum(len(p) for p in parts) if total == "auto" else total
        reps = 2 if i in dup else 1
        for _ in range(reps):
            rows.append(
                (
                    origin if i == 1 else "<%s/seg%d>" % (origin, i),
                    rec_type if i == 1 else "continuation",
                    i,
                    None if i == 1 else origin,
                    declared,
                    bytearray(part),
                )
            )
    return rows


def test_hand_cases(spark):
    rows = (
        # unsegmented passthrough
        [("<id:plain>", "response", None, None, None, bytearray(b"whole"))]
        # clean 3-segment record, total declared on the last segment
        + _seg_rows("<id:ok>", "response", [b"aa", b"bbb", b"c"])
        # gap: segment 2 missing
        + _seg_rows("<id:gap>", "response", [b"x", b"y", b"z"], skip=(2,))
        # duplicate segment number: deterministic order, incomplete
        + _seg_rows("<id:dup>", "resource", [b"p", b"q"], dup=(2,))
        # declared total disagrees with actual bytes
        + _seg_rows("<id:short>", "response", [b"ab", b"cd"], total=99)
        # last segment never declared a total (spec violation)
        + _seg_rows("<id:nototal>", "response", [b"m", b"n"], total=None)
        # orphan continuations: head (segment 1) never arrived
        + [
            ("<id:orph/2>", "continuation", 2, "<id:orphan>", None,
             bytearray(b"tail")),
            ("<id:orph/3>", "continuation", 3, "<id:orphan>", 4,
             bytearray(b"tail")),
        ]
    )
    got = _run(spark, rows)

    assert got["<id:plain>"] == ("response", b"whole", 1, 5, None, True)
    assert got["<id:ok>"] == ("response", b"aabbbc", 3, 6, 6, True)
    # gap: bytes stitch in order of what's present, complete=false
    assert got["<id:gap>"] == ("response", b"xz", 2, 2, 3, False)
    # duplicate seg 2: both copies kept in sorted order, incomplete
    assert got["<id:dup>"] == ("resource", b"pqq", 3, 3, 2, False)
    assert got["<id:short>"] == ("response", b"abcd", 2, 4, 99, False)
    assert got["<id:nototal>"] == ("response", b"mn", 2, 2, None, False)
    # no head: rec_type NULL, incomplete
    assert got["<id:orphan>"] == (None, b"tailtail", 2, 8, 4, False)


def test_reference_payload_byte_identity(spark, corpus_dir, warcio):
    """Split a real response payload from the reference corpus at
    arbitrary boundaries and verify the reassembled block is
    byte-identical to what the reference's own iterator reads."""
    from warcio.archiveiterator import ArchiveIterator

    path = os.path.join(corpus_dir, "example.warc")
    with open(path, "rb") as fh:
        recs = [
            r.raw_stream.read()
            for r in ArchiveIterator(path and fh, no_record_parse=True)
            if r.rec_type == "response"
        ]
    assert recs
    block = recs[0]
    cuts = [0, 13, 100, 101, len(block) // 2, len(block)]
    parts = [block[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]
    rows = _seg_rows("<id:ref>", "response", parts)
    got = _run(spark, rows)
    assert got["<id:ref>"] == (
        "response", block, len(parts), len(block), len(block), True,
    )


def _oracle(rows):
    by = {}
    for rid, rtype, seg, origin, total, part in rows:
        if seg is None:
            by[rid] = (rtype, bytes(part), 1, len(part), None, True)
            continue
        key = origin if origin is not None else rid
        g = by.setdefault(key, [])
        g.append((seg, bytes(part), rtype if seg == 1 and
                  rtype != "continuation" else None, total))
    out = {}
    for key, v in by.items():
        if isinstance(v, tuple):
            out[key] = v
            continue
        v.sort(key=lambda t: (t[0], t[1]))
        payload = b"".join(p for _, p, _, _ in v)
        segs = [s for s, _, _, _ in v]
        head = next((h for _, _, h, _ in v if h), None)
        total = max((t for _, _, _, t in v if t is not None), default=None)
        contiguous = (
            min(segs) == 1 and max(segs) == len(segs)
            and len(set(segs)) == len(segs)
        )
        complete = bool(
            head and contiguous and total is not None
            and total == len(payload)
        )
        out[key] = (head, payload, len(segs), len(payload), total, complete)
    return out


def test_python_oracle_randomized(spark):
    import random

    rng = random.Random(421)
    rows = []
    for i in range(120):
        mode = i % 6
        if mode == 0:
            rows.append(
                ("<id:p%d>" % i, "response", None, None, None,
                 bytearray(rng.randbytes(rng.randrange(0, 40)))))
            continue
        parts = [
            rng.randbytes(rng.randrange(1, 30))
            for _ in range(rng.randrange(2, 6))
        ]
        kw = {}
        if mode == 2:
            kw["skip"] = (rng.randrange(2, len(parts) + 1),)
        elif mode == 3:
            kw["dup"] = (rng.randrange(1, len(parts) + 1),)
        elif mode == 4:
            kw["total"] = rng.randrange(0, 200)
        elif mode == 5:
            kw["total"] = None
        rows.extend(
            _seg_rows("<id:r%d>" % i, "response",
                      [bytearray(p) for p in parts], **kw))
    want = _oracle(rows)
    assert _run(spark, rows) == want
    # parallelism invariance: scattering segments across partitions
    # (the multi-file reality) changes nothing
    assert _run(spark, rows, parts=7) == want
