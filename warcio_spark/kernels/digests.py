"""Digest kernels: sha1-base32 WARC digests + RFC-3548 normalizing compare.

Reference semantics (studied, not copied):
- "algo:BASE32" digest strings, sha1 default: warcio/utils.py:97-106
- normalize b16/b64/b64url to b32 before compare:
  warcio/digestverifyingreader.py:111-158
- "algo:value" split: warcio/digestverifyingreader.py:161-166
"""

from __future__ import annotations

import base64
import hashlib

_B64_URLSAFE_ALT = b"-_"


def digest_b32(data: bytes, algo: str = "sha1") -> str:
    """'algo:BASE32(hash(data))' — the WARC digest string format."""
    h = hashlib.new(algo)
    h.update(data)
    return algo + ":" + base64.b32encode(h.digest()).decode("ascii")


def split_digest(digest: str):
    """Split 'algo:value'. Raises ValueError when there is no ':'."""
    algo, sep, value = digest.partition(":")
    if sep != ":":
        raise ValueError("could not parse digest algorithm out of " + digest)
    return algo, value


def normalize_to_b32(value: str, b32_len: int) -> str:
    """Re-encode a digest value (b32/b16/b64/b64url) as base32.

    ``b32_len`` is the length the base32 form is expected to have (taken from
    a locally computed digest of the same algorithm). Values already at that
    length are returned unchanged; longer values are treated as base16,
    shorter as base64 (url-safe alphabet when '-'/'_' present).
    """
    if len(value) == b32_len:
        return value
    if len(value) > b32_len:
        binary = base64.b16decode(value, casefold=True)
    elif "-" in value or "_" in value:
        binary = base64.b64decode(value, altchars=_B64_URLSAFE_ALT)
    else:
        binary = base64.b64decode(value)
    return base64.b32encode(binary).decode("ascii")


def digests_match(computed_b32_digest: str, claimed_digest: str):
    """Compare a locally computed 'algo:B32' digest to a claimed WARC digest.

    Returns True/False, or None when either side is missing.
    """
    if not computed_b32_digest or not claimed_digest:
        return None
    _, our_value = split_digest(computed_b32_digest)
    _, warc_value = split_digest(claimed_digest)
    try:
        warc_b32 = normalize_to_b32(warc_value, len(our_value))
    except Exception:
        return False
    return our_value == warc_b32


def verify_payload(data: bytes, claimed_digest: str):
    """Hash ``data`` with the algorithm named in ``claimed_digest`` and compare.

    Returns (ok: bool|None, problem: str|None). Unknown algorithm names are a
    problem (not a failed compare), mirroring the reference checker.
    """
    if not claimed_digest:
        return None, None
    try:
        algo, _ = split_digest(claimed_digest)
    except ValueError:
        return None, "unknown hash algorithm name"
    try:
        computed = digest_b32(data, algo)
    except ValueError:
        return None, "unknown hash algorithm name"
    ok = digests_match(computed, claimed_digest)
    if ok is False:
        return False, "digest failed: {}".format(claimed_digest)
    return ok, None
