"""Multimodal column plumbing: Arrow batch shapes, JVM-side kind pruning,
and the optional-codec contract (PIL when importable, deterministic stub
otherwise — the same optional-dependency treatment the reference gives
brotli, warcio/bufferedreaders.py:25-36)."""

import pytest
from pyspark.sql import functions as F

from warcio_spark.operators import multimodal as mm


def test_image_features_stub_deterministic(spark):
    media = mm.synth_media(spark, 90, partitions=4)
    a = {r.media_id: (r.width, r.height, r.channels, tuple(r.features))
         for r in mm.image_features(media, codec="stub").collect()}
    b = {r.media_id: (r.width, r.height, r.channels, tuple(r.features))
         for r in mm.image_features(media.repartition(9), codec="stub").collect()}
    assert a == b  # partitioning-invariant
    assert len(a) == 30  # only kind == image crosses the Arrow hop
    assert all(len(v[3]) == 16 for v in a.values())


def test_frame_sample_plan_counts(spark):
    media = mm.synth_media(spark, 30)
    rows = mm.frame_sample_plan(media, every_n_sec=5).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_ts)
    for mid, ts in by_id.items():
        dur = (mid % 30) + 1
        assert ts == list(range(0, dur + 1, 5))


def test_decode_image_optional_codec_contract():
    """Without PIL the decode falls back to the deterministic stub; with it,
    a real 1-pixel PNG decodes to its true dimensions. Exactly one branch
    runs per environment — this sandbox exercises the stub branch, a
    PIL-equipped cluster exercises the codec branch."""
    if not mm.HAS_PIL:
        out = mm.decode_image(b"media-bytes-7")
        assert out == mm._decode_image_stub(b"media-bytes-7")
        assert mm.decode_image(b"") is None and mm.decode_image(None) is None
        return
    import io

    buf = io.BytesIO()
    mm._PILImage.new("RGB", (3, 2)).save(buf, format="PNG")
    w, h, c, feat = mm.decode_image(buf.getvalue())
    assert (w, h, c) == (3, 2, 3)
    assert len(feat) == 16
    # undecodable bytes -> NULL row, not a task failure
    assert mm.decode_image(b"not an image") is None
