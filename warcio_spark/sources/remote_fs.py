"""Minimal remote-filesystem plug point for non-file, non-http schemes.

``open_stream`` is what the ranged WARC reader calls for s3:// / gs:// /
abfs:// style URIs (the reference covers the same surface with its S3
loader, /root/reference/test/test_s3.py:129-151). Resolution order:

1. a scheme registered here via :func:`register_filesystem` — a plain
   ``(path, mode) -> file-like`` opener. This is how an environment
   without fsspec plugs in a custom store, and how tests exercise the
   object-store branch end-to-end (executors included);
2. fsspec, when importable — the production path for real object stores;
3. a clear ImportError naming fsspec.

The registry must be consultable inside Spark python workers, so openers
have to be importable module-level functions resolving purely from the
path (no driver-held state). The builtin ``mock://`` scheme does exactly
that: ``mock:///abs/path`` opens ``/abs/path`` through the full
remote-scheme code path (dispatch, open, seek, read) — a local-disk
stand-in for an object store, the same trick the reference's moto-backed
S3 tests use. It is OPT-IN: set ``WARCIO_SPARK_MOCK_FS=1`` in the
environment (before the Spark JVM spawns, so python workers inherit it)
— the production registry is empty by default, so an unknown object-store
URI can never silently open a local file.
"""

from __future__ import annotations

import io
import os


def _open_mock(path: str, mode: str = "rb"):
    # mock:///abs/path -> /abs/path (authority-less form keeps it trivial)
    local = path.split("://", 1)[1]
    if not local.startswith("/"):
        raise ValueError(
            "mock:// paths embed an absolute path: mock:///a/b, got "
            + path
        )
    return open(local, mode)


_REGISTRY: dict = {}


def register_filesystem(scheme: str, opener) -> None:
    """Register ``opener(path, mode) -> file-like`` for a URI scheme.
    The opener must be importable on executors (a module-level function,
    not a closure over driver state)."""
    _REGISTRY[scheme.lower()] = opener


def open_stream(path: str, mode: str = "rb") -> io.IOBase:
    scheme = path.split("://", 1)[0].lower() if "://" in path else ""
    opener = _REGISTRY.get(scheme)
    if (opener is None and scheme == "mock"
            and os.environ.get("WARCIO_SPARK_MOCK_FS") == "1"):
        # checked dynamically (not at import) so the flag works no matter
        # when this module was first imported in driver or worker
        opener = _open_mock
    if opener is not None:
        return opener(path, mode)
    try:
        import fsspec
    except ImportError as e:
        raise ImportError(
            "reading scheme '{0}://' needs fsspec on the executors (or a "
            "warcio_spark.sources.remote_fs.register_filesystem opener)".format(
                scheme
            )
        ) from e
    return fsspec.open(path, mode).open()
