"""URL kernels: RFC-3986 canonicalization + host extraction (north rule F12).

The canonical form feeds the murmur3 seen-set key (Spark's built-in
``hash()`` IS Murmur3_x86_32) and the per-host politeness partitioning.
Rules implemented (RFC 3986 §6.2.2-6.2.3 syntax-based normalization):

- scheme + host lowercased; userinfo dropped for seen-set purposes
- default ports removed (http:80, https:443)
- dot-segments resolved in the path; empty path -> '/'
- percent-encodings: unreserved characters decoded, others uppercased
- fragment stripped
- the reference's two URI repairs are applied first: '<uri>' unwrap
  (warcio/recordloader.py:257-261) and ' ' -> '%20'
  (warcio/recordloader.py:263-266)
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RX = re.compile(r"%([0-9a-fA-F]{2})")


def repair_uri(uri: str) -> str:
    """The reference's WARC-Target-URI fixups."""
    if uri.startswith("<") and uri.endswith(">"):
        uri = uri[1:-1]
    if " " in uri:
        uri = uri.replace(" ", "%20")
    return uri


def _norm_pct(s: str) -> str:
    """Decode %XX for unreserved chars, uppercase the rest."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RX.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve trailing slash semantics of '.' / '..' final segments
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize_url(url: str) -> str:
    """RFC-3986 syntax-normalized form; returns input unchanged when it has
    no parseable scheme+netloc."""
    if not url:
        return url
    url = repair_uri(url.strip())
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url

    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = None
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = "{0}:{1}".format(host, port)

    path = _norm_pct(parts.path) or "/"
    path = _remove_dot_segments(path)
    query = _norm_pct(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str):
    """Registered host (lowercased) for per-host politeness grouping."""
    if not url:
        return None
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return None
    return host.lower() if host else None
