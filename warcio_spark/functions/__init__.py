"""Column-level functions: JVM-side expressions where possible, Arrow-batched
pandas UDFs for warcio-exact byte semantics.

Everything here is a drop-in for ``pyspark.sql.functions`` style usage:

    from warcio_spark import functions as WF
    df.select(WF.header_get("http_headers", "content-type"))

JVM expressions (whole-stage codegen, no Python):
    header_get, statuscode, fix_target_uri, url_hash64, record_census...
pandas UDFs (Arrow batch transfer, per-cell kernels):
    sha1_b32, extract_content, decode_text, canonicalize_url, url_host...
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warcio_spark.kernels import chrono as _chrono
from warcio_spark.kernels import digests as _digests
from warcio_spark.kernels import payload as _payload
from warcio_spark.kernels import textcodec as _textcodec
from warcio_spark.kernels import urls as _urls

# ---------------------------------------------------------------------------
# JVM-side expressions (stay inside whole-stage codegen)
# ---------------------------------------------------------------------------


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def header_get(headers, name: str) -> Column:
    """First header value with case-insensitive name — the reference's
    get_header (warcio/statusandheaders.py:34-44) as a higher-order filter
    over the ordered headers array; order-preserving, duplicate-safe."""
    low = name.lower()
    matches = F.filter(_c(headers), lambda h: F.lower(h["name"]) == F.lit(low))
    # try_element_at: absent header -> NULL (plain element_at raises under
    # ANSI mode, the Spark 4 default)
    return F.try_element_at(matches, F.lit(1))["value"]


def statuscode(statusline) -> Column:
    """Status code off the http statusline (warcio/statusandheaders.py:77-83)."""
    return F.split_part(_c(statusline), F.lit(" "), F.lit(1))


def fix_target_uri(url) -> Column:
    """wget '<uri>' unwrap + space->%20 (warcio/recordloader.py:245-268) as
    pure Catalyst expressions (stays in whole-stage codegen)."""
    u = F.regexp_replace(_c(url), r"^<(.*)>$", r"$1")
    return F.replace(u, F.lit(" "), F.lit("%20"))


def url_hash64(url_canon) -> Column:
    """64-bit seen-set key: xxhash64 of the canonical url. (F.hash is
    Murmur3_x86_32 — 32 bits collides at 10^10 keys; xxhash64 is the
    built-in 64-bit hash.)"""
    return F.xxhash64(_c(url_canon))


def url_hash32(url_canon) -> Column:
    """Murmur3_x86_32 of the canonical url (Spark's built-in hash)."""
    return F.hash(_c(url_canon))


def header_filter_out(headers, *names) -> Column:
    """Drop headers by name, case-insensitive (the writer's header_filter
    hook, warcio/recordbuilder.py:33-36)."""
    lows = [n.lower() for n in names]
    return F.filter(
        _c(headers),
        lambda h: ~F.lower(h["name"]).isin(lows),
    )


def assemble_url(verb, request_target, host_header, default_scheme="http") -> Column:
    """F11: absolute URL from request verb/path + Host header, mirroring the
    capture contract (warcio/capture_http.py:203-238): CONNECT targets and
    absolute-form targets pass through; origin-form targets get
    scheme://host prepended."""
    v, t, h = _c(verb), _c(request_target), _c(host_header)
    return (
        F.when(v == "CONNECT", F.concat(F.lit("https://"), t))
        .when(t.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), t)
        .otherwise(F.concat(F.lit(default_scheme + "://"), h, t))
    )


def limit_payload(payload, max_bytes, outer_limit=None) -> Column:
    """W5: LimitReader as an expression — byte-cap a binary payload; nested
    limits take the min (warcio/limitreader.py:59-62)."""
    limit = F.lit(max_bytes) if not isinstance(max_bytes, Column) else max_bytes
    if outer_limit is not None:
        outer = F.lit(outer_limit) if not isinstance(outer_limit, Column) else outer_limit
        limit = F.least(limit, outer)
    return F.substring(_c(payload), 1, limit)


def iso_warc_date(ts, use_micros: bool = False) -> Column:
    """timestamp -> WARC-Date string (warcio/timeutils.py:105-127)."""
    fmt = "yyyy-MM-dd'T'HH:mm:ss" + (".SSSSSS" if use_micros else "") + "'Z'"
    return F.date_format(_c(ts), fmt)


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs (warcio-exact byte semantics)
# ---------------------------------------------------------------------------


def _map_series(s: pd.Series, fn):
    return s.map(lambda v: fn(v) if v is not None else None)


@F.pandas_udf(T.StringType())
def sha1_b32(data: pd.Series) -> pd.Series:
    """'sha1:BASE32' WARC digest (warcio/utils.py:97-106)."""
    return _map_series(data, lambda b: _digests.digest_b32(bytes(b)))


@F.pandas_udf(T.BooleanType())
def digest_matches(data: pd.Series, claimed: pd.Series) -> pd.Series:
    """RFC-3548-normalized digest verify
    (warcio/digestverifyingreader.py:111-158)."""

    def check(row):
        b, c = row
        if b is None or c is None:
            return None
        ok, _ = _digests.verify_payload(bytes(b), c)
        return ok

    return pd.Series(map(check, zip(data, claimed)), dtype="object")


@F.pandas_udf(T.BinaryType())
def extract_content(payload: pd.Series, content_encoding: pd.Series,
                    transfer_encoding: pd.Series) -> pd.Series:
    """content_stream() composition: de-chunk if chunked, then decompress
    supported encodings (warcio/recordloader.py:27-44) — the byte-identical
    text extraction path."""

    def run(row):
        p, ce, te = row
        if p is None:
            return None
        return _payload.extract_content(bytes(p), ce, te)

    return pd.Series(
        map(run, zip(payload, content_encoding, transfer_encoding)), dtype="object"
    )


@F.pandas_udf(T.StringType())
def extract_http_text(html: pd.Series, url: pd.Series) -> pd.Series:
    """Full response-payload text path: parse the HTTP status+headers out of
    the raw payload (loader gating semantics: only http:/https: urls,
    case-sensitive, warcio/recordloader.py:59,183-185), de-chunk/decode the
    body per Transfer-/Content-Encoding, decode with the utf-8/iso-8859-1
    fallback — the byte-identical `html -> text` derivation of the pages
    table (BASELINE input_hint)."""
    from warcio_spark.kernels.parse import _Cursor, _parse_status_headers, header_get

    def run(row):
        b, u = row
        if b is None:
            return None
        body = bytes(b)
        if not (u or "").startswith(("http:", "https:")):
            return _textcodec.decode_fallback(body)
        cur = _Cursor(body)
        try:
            block = _parse_status_headers(cur, None, (), False)
        except EOFError:
            return _textcodec.decode_fallback(body)
        if not block["statusline"] and not block["headers"]:
            return _textcodec.decode_fallback(body[cur.pos:])
        payload = body[cur.pos:]
        content = _payload.extract_content(
            payload,
            header_get(block["headers"], "content-encoding"),
            header_get(block["headers"], "transfer-encoding"),
        )
        return _textcodec.decode_fallback(content)

    return pd.Series(map(run, zip(html, url)), dtype="object")


_HTTP_META_TYPE = T.StructType(
    [
        T.StructField("status", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@F.pandas_udf(_HTTP_META_TYPE)
def parse_http_response(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """extract_http_text plus the response metadata a crawler acts on —
    status code and Location header — in the SAME single Arrow hop (never
    decode the payload twice to learn its status). Non-http(s) urls get
    NULL status/location and the raw-block fallback text, mirroring the
    loader's case-sensitive scheme gate."""
    from warcio_spark.kernels.parse import (
        _Cursor,
        _parse_status_headers,
        header_get,
    )

    def run(row):
        b, u = row
        if b is None:
            return (None, None, None)
        body = bytes(b)
        if not (u or "").startswith(("http:", "https:")):
            return (None, None, _textcodec.decode_fallback(body))
        cur = _Cursor(body)
        try:
            block = _parse_status_headers(cur, None, (), False)
        except EOFError:
            return (None, None, _textcodec.decode_fallback(body))
        if not block["statusline"] and not block["headers"]:
            return (None, None, _textcodec.decode_fallback(body[cur.pos:]))
        status = None
        first = block["statusline"].split(" ", 1)[0]
        if first.isdigit():
            status = int(first)
        location = header_get(block["headers"], "location")
        content = _payload.extract_content(
            body[cur.pos:],
            header_get(block["headers"], "content-encoding"),
            header_get(block["headers"], "transfer-encoding"),
        )
        return (status, location, _textcodec.decode_fallback(content))

    out = [run(r) for r in zip(html, url)]
    return pd.DataFrame(out, columns=["status", "location", "text"])


@F.pandas_udf(T.StringType())
def decode_text(data: pd.Series) -> pd.Series:
    """bytes -> str with the utf-8 / iso-8859-1 fallback
    (warcio/statusandheaders.py:329-336)."""
    return _map_series(data, lambda b: _textcodec.decode_fallback(bytes(b)))


import re as _re

# urls matching this (and free of dot-segments) are ALREADY canonical:
# lowercase scheme+host, no port/userinfo/percent/space/fragment, explicit
# path — the hot-path majority of a well-formed frontier skips the Python
# kernel entirely (vectorized regex instead of per-url urlsplit)
_CANON_FAST_RX = _re.compile(
    r"^https?://[a-z0-9\-]+(\.[a-z0-9\-]+)*/[A-Za-z0-9_\-./~]*"
    r"(\?[A-Za-z0-9_\-=&.]+)?$"  # >=1 query char: the kernel strips a bare
    # trailing '?' (urlunsplit), so 'http://h/p?' must take the kernel path
    # or the two spellings of one url would get different url_hash values
)


# the same fast-path condition as JVM expressions, for split-union plans:
# rows matching this are ALREADY canonical and never need to cross into
# Python at all (see with_canonical_url)
_CANON_FAST_RX_JAVA = (
    r"^https?://[a-z0-9\-]+(\.[a-z0-9\-]+)*/[A-Za-z0-9_\-./~]*"
    r"(\?[A-Za-z0-9_\-=&.]+)?$"
)


def is_canonical_expr(url) -> Column:
    """JVM-side (codegen) test equivalent to the pUDF's fast path: True =>
    canonicalize_url(url) == url. Exactness is pinned by
    tests/test_urlnorm.py::test_fast_path_regex_means_already_canonical and
    the split-union equivalence test."""
    u = _c(url)
    return (
        u.rlike(_CANON_FAST_RX_JAVA)
        & ~u.contains("/./")
        & ~u.contains("/../")
        & ~u.endswith("/.")
        & ~u.endswith("/..")
    )


def with_canonical_url(df, url_col: str = "url",
                       out_col: str = "url_canon"):
    """Add the canonical-url column with a JVM-side split-union: the
    already-canonical majority (a Zipf-clean frontier is typically >80%)
    takes a pure-codegen passthrough and NEVER crosses the Arrow boundary;
    only the slow minority runs the Python kernel. This is the scaling
    lever for the keys stage: in local mode every python worker competes
    with a JVM task thread for the same core, and on a cluster the Arrow
    hop is the dominant per-row cost."""
    # coalesce: a NULL url must fall into the slow branch (NULL rlike NULL
    # would drop the row from BOTH filters), where the kernel yields NULL
    cond = F.coalesce(is_canonical_expr(F.col(url_col)), F.lit(False))
    fast = df.filter(cond).withColumn(out_col, F.col(url_col))
    slow = df.filter(~cond).withColumn(out_col, canonicalize_url(F.col(url_col)))
    return fast.unionByName(slow)


@F.pandas_udf(T.StringType())
def canonicalize_url(url: pd.Series) -> pd.Series:
    """RFC-3986 canonical form (north rule F12). Vectorized fast path for
    already-canonical urls; full kernel for the rest."""
    fast = (
        url.str.match(_CANON_FAST_RX, na=False)
        & ~url.str.contains("/./", regex=False, na=False)
        & ~url.str.contains("/../", regex=False, na=False)
        & ~url.str.endswith(("/.", "/.."), na=False)
    )
    out = url.copy()
    slow = ~fast
    if slow.any():
        out[slow] = url[slow].map(
            lambda u: _urls.canonicalize_url(u) if u is not None else None
        )
    return out


@F.pandas_udf(T.StringType())
def url_host(url: pd.Series) -> pd.Series:
    """Lowercased hostname for politeness grouping."""
    return _map_series(url, _urls.url_host)


# charset label inside a meta tag's attribute soup (covers both
# <meta charset=X> and <meta http-equiv=content-type content="...charset=X">
# — the label is what matters, not which attribute carried it) and inside a
# Content-Type header value. HTML5 prescan discipline: first 1024 bytes.
_META_CHARSET_RX = \
    "(?i)<meta\\s[^>]{0,255}?charset\\s*=\\s*[\"']?\\s*([a-zA-Z0-9._:-]+)"
_CT_CHARSET_RX = "(?i)charset\\s*=\\s*\"?([^\";\\s]+)"
SNIFF_PRESCAN_BYTES = 1024


def sniff_charset_expr(prefix, content_type=None) -> Column:
    """Declared character encoding from an (already byte-transparent)
    document prefix string + optional Content-Type header value — the
    HTML5 encoding-sniffing precedence as pure codegen:

    1. BOM (utf-8 / utf-16le / utf-16be) — authoritative;
    2. ``charset=`` parameter of the Content-Type value;
    3. ``<meta charset=..>`` / ``<meta http-equiv .. charset=..>`` within
       the prefix (callers pass the first SNIFF_PRESCAN_BYTES);
    4. NULL — caller falls back to the utf-8/latin-1 ladder
       (``kernels.textcodec.decode_fallback``).

    The label is lowercased but NOT validated — ``decode_with_charset``
    treats unknown labels as undeclared. ``prefix`` must be a
    byte-transparent string (each byte one codepoint, e.g. the
    ISO-8859-1 decode ``sniff_charset`` performs); BOM bytes then test
    as plain startswith."""
    p = _c(prefix)
    bom = (
        F.when(p.startswith("\ufeff"), F.lit("utf-8"))  # already-decoded BOM
        .when(p.startswith("\xef\xbb\xbf"), F.lit("utf-8"))
        .when(p.startswith("\xff\xfe"), F.lit("utf-16le"))
        .when(p.startswith("\xfe\xff"), F.lit("utf-16be"))
    )
    meta = F.nullif(F.regexp_extract(p, _META_CHARSET_RX, 1), F.lit(""))
    out = bom
    if content_type is not None:
        hdr = F.nullif(
            F.regexp_extract(F.coalesce(_c(content_type), F.lit("")),
                             _CT_CHARSET_RX, 1),
            F.lit(""))
        out = F.coalesce(out, hdr)
    return F.lower(F.coalesce(out, meta))


def sniff_charset(payload, headers=None) -> Column:
    """``sniff_charset_expr`` over a BINARY payload column: the first
    SNIFF_PRESCAN_BYTES are made byte-transparent with an ISO-8859-1
    decode (1 byte = 1 codepoint, lossless for pattern matching) and the
    Content-Type value comes from the ordered ``headers`` array when
    given. Pure codegen — the sniff itself never crosses the Arrow
    boundary; only the actual non-fallback decode does
    (``decode_with_charset``)."""
    prefix = F.decode(F.substring(_c(payload), 1, SNIFF_PRESCAN_BYTES),
                      "ISO-8859-1")
    ct = header_get(headers, "content-type") if headers is not None else None
    return sniff_charset_expr(prefix, ct)


@F.pandas_udf(T.StringType())
def decode_with_charset(payload: pd.Series, charset: pd.Series) -> pd.Series:
    """bytes -> str honoring a sniffed charset label, vectorized:
    a known label decodes with errors='replace' (a declared encoding is
    authoritative even over mangled bytes — the browser rule); an
    unknown/NULL label falls back to the warcio utf-8/latin-1 ladder
    (``decode_fallback``), so undeclared content behaves exactly like
    the reference text path. BOM bytes of a matching declared encoding
    are stripped (the decoded text starts at the content)."""
    import codecs

    from warcio_spark.kernels.textcodec import decode_fallback

    def one(raw, label):
        if raw is None:
            return None
        raw = bytes(raw)
        if label is None:
            return decode_fallback(raw)
        try:
            info = codecs.lookup(label)
        except LookupError:
            return decode_fallback(raw)
        if info.name == "utf-8" and raw[:3] == b"\xef\xbb\xbf":
            raw = raw[3:]
        elif info.name == "utf-16-le" and raw[:2] == b"\xff\xfe":
            raw = raw[2:]
        elif info.name == "utf-16-be" and raw[:2] == b"\xfe\xff":
            raw = raw[2:]
        return raw.decode(info.name, errors="replace")

    return pd.Series(
        [one(r, c) for r, c in zip(payload, charset)], dtype="object")


# click/campaign identifiers every major analytics stack appends to urls —
# the classic source of spurious url-level duplicates in a crawl (the same
# document under utm_source=twitter / =rss / =newsletter). Exact names only;
# the utm_ FAMILY is matched by prefix (see strip_tracking_params).
DEFAULT_TRACKING_PARAMS = (
    "gclid", "gbraid", "wbraid", "dclid", "fbclid", "msclkid", "twclid",
    "igshid", "yclid", "mc_cid", "mc_eid", "_hsenc", "_hsmi", "mkt_tok",
    "oly_anon_id", "oly_enc_id", "vero_id", "wickedid", "s_cid",
)
DEFAULT_TRACKING_PREFIXES = ("utm_",)


def strip_tracking_params(url, params=None, prefixes=None) -> Column:
    """Remove tracking query parameters from a url — pure codegen
    (regexp split of the query segment, HOF filter on the key, rejoin).

    Semantics (mirrored by the DuckDB oracle + pytest):
    * the query segment is everything between the FIRST ``?`` and the
      first ``#`` (or end); the fragment and any later ``?`` inside it
      pass through untouched;
    * a parameter is dropped when its key (text before the first ``=``,
      lowercased) equals one of ``params`` or starts with one of
      ``prefixes`` — values and bare keys both count;
    * surviving parameters keep their order and exact bytes (no
      re-encoding, empty ``&&`` segments survive verbatim);
    * when nothing survives the ``?`` is dropped too.

    Compose BEFORE canonicalization / frontier keys: dedup then treats
    ``...?utm_source=a`` and ``...?utm_source=b`` as one url. This is a
    deliberately separate opt-in step — the canonical kernel itself stays
    byte-parity-locked to the reference crawl ordering, which does NOT
    strip params."""
    u = _c(url)
    names = [p.lower() for p in
             (DEFAULT_TRACKING_PARAMS if params is None else params)]
    prefs = [p.lower() for p in
             (DEFAULT_TRACKING_PREFIXES if prefixes is None else prefixes)]
    pre = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[^?#]*\?([^#]*)", 1)
    frag = F.regexp_extract(u, r"(#.*)$", 1)

    def keep(p: Column) -> Column:
        key = F.lower(F.split_part(p, F.lit("="), F.lit(1)))
        dropped = F.lit(False)
        if names:
            dropped = key.isin(*names)
        for pf in prefs:
            dropped = dropped | key.startswith(pf)
        return ~dropped

    kept = F.array_join(F.filter(F.split(query, "&", -1), keep), "&")
    has_query = u.rlike(r"^[^#]*\?")
    return F.when(~has_query, u).otherwise(
        F.concat(
            pre,
            F.when(kept == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), kept)),
            frag,
        )
    )


def url_host_expr(url) -> Column:
    """JVM-side host extraction for canonicalized urls: lower(try_parse_url)
    with IPv6 brackets stripped — codegen, no Python hop. Only safe AFTER
    canonicalization (try_parse_url returns NULL for space-containing urls,
    which canonicalization has already %-encoded)."""
    host = F.lower(F.try_parse_url(_c(url), F.lit("HOST")))
    return F.regexp_replace(host, r"^\[(.*)\]$", r"$1")


@F.pandas_udf(T.StringType())
def ts14_to_iso(ts14: pd.Series) -> pd.Series:
    """Lenient 14-digit timestamp -> ISO (pad-up + clamp,
    warcio/timeutils.py:199-354)."""
    return _map_series(ts14, _chrono.ts14_to_iso)


@F.pandas_udf(T.TimestampType())
def ts14_to_timestamp(ts14: pd.Series) -> pd.Series:
    return pd.Series(
        [_chrono.ts14_to_datetime(v) if v is not None else None for v in ts14],
        dtype="datetime64[us]",
    )


@F.pandas_udf(T.StringType())
def http_date_to_iso(http_date: pd.Series) -> pd.Series:
    """RFC-2822 GMT date -> ISO (warcio/timeutils.py:74-102)."""
    return _map_series(
        http_date,
        lambda s: _chrono.datetime_to_iso(_chrono.http_date_to_datetime(s)),
    )


@F.pandas_udf(T.BinaryType())
def gzip_member(data: pd.Series) -> pd.Series:
    """Per-record gzip member, level 9 (warcio/warcwriter.py:113-127) —
    keeps serialized WARC output splittable."""
    return _map_series(data, lambda b: _payload.gzip_member_compress(bytes(b)))


@F.pandas_udf(T.BinaryType())
def gunzip_member(data: pd.Series) -> pd.Series:
    """First-member gzip decode with not-compressed passthrough."""
    return _map_series(data, lambda b: _payload.decode_content(bytes(b), "gzip"))


def surt_key(url) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) url key — the
    pywb/OpenWayback CDX index key — as pure Catalyst expressions (stays
    in whole-stage codegen, no python): lowercase; scheme, userinfo and
    port dropped; leading ``www.`` dropped (pywb's default canon); host
    components reversed and comma-joined; ``)`` + path; query args sorted
    (binary order) behind ``?``; fragment dropped. Expects an absolute
    http(s) URL — compose after ``with_canonical_url`` for messy input.

    ``http://www.Host.com:80/A/b?b=2&a=1#f`` -> ``com,host)/a/b?a=1&b=2``
    """
    u = F.lower(_c(url))
    host = F.regexp_replace(
        F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1),
        r"^www\.", "",
    )
    pathq = F.regexp_replace(  # path+query, fragment stripped
        F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([/?#].*)?$", 1),
        r"#.*$", "",
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    qs = F.regexp_extract(pathq, r"\?(.*)$", 1)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev_host,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(
            qs == "", F.lit("")
        ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(qs, "&")), "&"))),
    )
