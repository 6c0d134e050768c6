"""Presence-reporting tests for the two optional-dependency branches the
sandbox can't exercise (VERDICT r4 "what's missing" #1).

These must NEVER silently skip: when the package is absent they XFAIL
with a reason (the gap stays visible in every test report); the moment
the environment gains fsspec or Pillow they run the real branch —
``remote_fs.open_stream``'s fsspec fallback and ``_decode_image_pil`` —
and PASS, with no code change needed."""

import pytest


def test_fsspec_fallback_branch():
    try:
        import fsspec  # noqa: F401
    except ImportError:
        pytest.xfail(
            "fsspec not installed in this sandbox — open_stream's fsspec "
            "fallback (the production object-store path) has never "
            "executed here; install fsspec and this test runs it"
        )
    from warcio_spark.sources.remote_fs import open_stream

    with fsspec.open("memory://ws/probe.bin", "wb") as f:
        f.write(b"fsspec-branch-live")
    with open_stream("memory://ws/probe.bin", "rb") as f:
        assert f.read() == b"fsspec-branch-live"


def test_pil_decode_branch():
    try:
        from PIL import Image
    except ImportError:
        pytest.xfail(
            "Pillow not installed in this sandbox — _decode_image_pil "
            "(the production image decode) has never executed here; "
            "install Pillow and this test runs it"
        )
    import io

    from warcio_spark.operators.multimodal import decode_image

    img = Image.new("RGB", (8, 4))
    img.putdata([(x * 32, 0, 0) for _ in range(4) for x in range(8)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = decode_image(buf.getvalue(), codec="pil")
    assert out is not None
    w, h, c, feat = out
    assert (w, h, c) == (8, 4, 3)
    assert len(feat) == 16 and all(-1.0 <= v <= 1.0 for v in feat)
    # malformed blob -> None (NULL row), never an exception
    assert decode_image(b"not an image", codec="pil") is None
