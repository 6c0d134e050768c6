"""Charset sniffing + decode (functions.sniff_charset/_expr,
decode_with_charset): HTML5 prescan precedence (BOM > Content-Type >
meta), BOM stripping, codec fallback ladder — pinned against hand bytes
and a python codecs oracle."""

from pyspark.sql import functions as F

from warcio_spark.functions import (
    decode_with_charset,
    sniff_charset,
    sniff_charset_expr,
)
from warcio_spark.kernels.textcodec import decode_fallback


def _sniff(spark, payload: bytes, headers=None):
    hcol = None
    if headers is not None:
        hcol = F.array(*[
            F.struct(F.lit(n).alias("name"), F.lit(v).alias("value"))
            for n, v in headers
        ])
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    return df.select(
        sniff_charset(F.col("payload"), hcol).alias("c")).collect()[0].c


def test_sniff_precedence(spark):
    # BOM beats header beats meta
    body = b'<meta charset="koi8-r">hello'
    assert _sniff(spark, b"\xef\xbb\xbf" + body,
                  [("Content-Type", "text/html; charset=windows-1251")]) \
        == "utf-8"
    assert _sniff(spark, b"\xff\xfe" + body) == "utf-16le"
    assert _sniff(spark, b"\xfe\xff" + body) == "utf-16be"
    assert _sniff(spark, body,
                  [("Content-Type", "text/html; charset=Windows-1251")]) \
        == "windows-1251"
    assert _sniff(spark, body) == "koi8-r"
    assert _sniff(spark, b"plain ascii, nothing declared") is None
    # content-type without charset param falls through to meta
    assert _sniff(spark, body, [("Content-Type", "text/html")]) == "koi8-r"


def test_sniff_meta_variants(spark):
    cases = [
        (b'<META CHARSET=UTF-8>', "utf-8"),
        (b"<meta charset='Shift_JIS'>", "shift_jis"),
        (b'<meta http-equiv="Content-Type" '
         b'content="text/html; charset=iso-8859-2">', "iso-8859-2"),
        (b'<p>charset=evil</p><meta charset=big5>', "big5"),
        (b'<metacharset=x>', None),      # not a meta tag boundary
        (b'<meta name=viewport>', None),  # no charset anywhere
    ]
    for payload, want in cases:
        assert _sniff(spark, payload) == want, payload
    # prescan window: a meta past 1024 bytes is NOT seen
    far = b" " * 1100 + b'<meta charset="koi8-r">'
    assert _sniff(spark, far) is None


def test_decode_with_charset_real_codecs(spark):
    ru = "Привет мир"
    cases = [
        (ru.encode("windows-1251"), "windows-1251", ru),
        (ru.encode("koi8-r"), "koi8-r", ru),
        (b"\xef\xbb\xbf" + ru.encode("utf-8"), "utf-8", ru),   # BOM stripped
        (b"\xff\xfe" + ru.encode("utf-16-le"), "utf-16le", ru),
        (b"\xfe\xff" + ru.encode("utf-16-be"), "utf-16be", ru),
        ("ärger".encode("iso-8859-1"), "iso-8859-1", "ärger"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b), c) for i, (b, c, _) in enumerate(cases)],
        "i int, payload binary, charset string")
    got = {r.i: r.text for r in df.select(
        "i", decode_with_charset("payload", "charset").alias("text")
    ).collect()}
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, i


def test_decode_with_charset_fallback_ladder(spark):
    """NULL / unknown labels behave exactly like decode_fallback."""
    raw_utf8 = "naïve café".encode("utf-8")
    raw_latin = "na\xefve".encode("iso-8859-1")
    rows = [
        (0, bytearray(raw_utf8), None),
        (1, bytearray(raw_latin), None),
        (2, bytearray(raw_utf8), "no-such-charset-9"),
        (3, None, "utf-8"),
    ]
    df = spark.createDataFrame(rows, "i int, payload binary, charset string")
    got = {r.i: r.text for r in df.select(
        "i", decode_with_charset("payload", "charset").alias("text")
    ).collect()}
    assert got[0] == decode_fallback(raw_utf8)
    assert got[1] == decode_fallback(raw_latin)
    assert got[2] == decode_fallback(raw_utf8)
    assert got[3] is None
    # declared-but-wrong encoding is authoritative: replace, not ladder
    df2 = spark.createDataFrame(
        [(bytearray(b"\xff\xfd invalid utf8"), "utf-8")],
        "payload binary, charset string")
    txt = df2.select(
        decode_with_charset("payload", "charset").alias("t")).collect()[0].t
    assert txt == b"\xff\xfd invalid utf8".decode("utf-8", errors="replace")


def test_sniff_plus_decode_end_to_end(spark):
    """The composed path: sniff the label from bytes+header, decode with
    it — the opt-in fidelity tier above the decode_fallback contract."""
    ru = "Русский текст страницы"
    payload = ('<meta http-equiv="Content-Type" '
               'content="text/html; charset=windows-1251">'
               "<p>" + ru + "</p>").encode("windows-1251")
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    out = df.select(
        decode_with_charset(
            "payload", sniff_charset(F.col("payload"))).alias("text")
    ).collect()[0].text
    assert ru in out
    # without sniffing, the fallback ladder mangles it (latin-1 view)
    assert ru not in decode_fallback(payload)


def test_sniff_charset_expr_on_strings(spark):
    """The string-prefix form used by the driver query (byte-transparent
    input contract)."""
    df = spark.createDataFrame(
        [("<meta charset=GBK>x", "text/html"),
         ("plain", "text/html; charset=EUC-JP"),
         ("plain", None)],
        "prefix string, ct string")
    got = [r.c for r in df.select(
        sniff_charset_expr("prefix", F.col("ct")).alias("c")).collect()]
    assert got == ["gbk", "euc-jp", None]
