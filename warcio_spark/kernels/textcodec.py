"""Text/byte codec kernels with warcio-compatible fallback semantics.

Pure-Python, Spark-free: importable standalone for unit tests and wrapped as
vectorized pandas UDFs in ``warcio_spark.functions``.

Reference semantics (studied, not copied):
- utf-8 decode with iso-8859-1 fallback: warcio/statusandheaders.py:329-336,
  warcio/utils.py:23-32
- RFC 8187/5987 percent-encoding of non-ascii header values:
  warcio/statusandheaders.py:16,183-208
"""

from __future__ import annotations

import re
from urllib.parse import quote

# value inside `="..."` or `='...'` up to `;` or quote — the parameter-value
# shape used when %-encoding individual params of a structured header value.
_PARAM_VALUE_RX = re.compile(r'[=]["\']?([^;"]+)["\']?(?=[;]?)')


def decode_fallback(raw: bytes) -> str:
    """bytes -> str, utf-8 first, iso-8859-1 on failure (warcio header rule)."""
    if isinstance(raw, str):
        return raw
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("iso-8859-1")


def is_ascii(s: str) -> bool:
    try:
        s.encode("ascii")
        return True
    except (UnicodeEncodeError, UnicodeDecodeError):
        return False


def percent_encode_header_value(value: str, encoding: str = "UTF-8") -> str:
    """Encode one non-ascii header value per RFC 8187 sec 3.2.3 / RFC 5987.

    - value without ';': percent-encode the whole value
    - structured value: rewrite each ``=value`` param as ``*=UTF-8''%xx..``;
      if the regex matches nothing, percent-encode the whole value.
    """
    if is_ascii(value):
        return value

    if ";" not in value:
        return quote(value)

    def repl(m: re.Match) -> str:
        return "*={0}''".format(encoding) + quote(m.group(1))

    new_value = _PARAM_VALUE_RX.sub(repl, value)
    if new_value == value:
        new_value = quote(value)
    return new_value


def percent_encode_non_ascii_headers(headers):
    """Return a new header list with non-ascii values %-encoded (names kept)."""
    out = []
    for name, value in headers:
        if value is not None and not is_ascii(value):
            value = percent_encode_header_value(value)
        out.append((name, value))
    return out
