"""Bitext candidate mining: cross-language page pairs for parallel-text
(translation) corpora, CCAligned/CCMatrix-style, from declared hreflang
alternate links instead of URL-pattern heuristics.

The pipeline shape the web-scale bitext corpora use: a page that
declares ``<link rel=alternate hreflang=..>`` twins is a high-precision
signal that the linked URLs are translations of each other; pairing
those fetched documents (then gating on basic comparability) yields the
candidate set a downstream aligner scores.  The declared-link variant is
the precision-first first stage; the reference ecosystem's crawlers
capture exactly the headers/markup this mines (warcio carries the
records; extraction is ours — see operators/links.hreflang_alternates
for the tag extraction these edges come from).

``bitext_candidates`` takes the alternate edges plus per-page facts and
emits one row per unordered candidate pair with the gate verdict, so a
caller can either filter ``candidate`` or inspect why pairs failed.

Scale shape: two equi shuffle joins on url (pages can be the 100 TB
side; edges are the sliver), one distinct on the canonicalized pair key.
No UDF, no explode, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a pair is length-comparable when the shorter side is at least this
# fraction of the longer (the classic bitext pre-filter; translations
# rarely differ by more than ~2x in characters)
MIN_LEN_RATIO = 0.5


def bitext_candidates(
    alternates: DataFrame,
    pages: DataFrame,
    min_len_ratio: float = MIN_LEN_RATIO,
) -> DataFrame:
    """Candidate translation pairs from hreflang edges + page facts.

    ``alternates``: (src_url, hreflang, alternate) — the output shape of
    ``links.hreflang_alternates``.  ``x-default`` edges are dropped (they
    mark the language-picker page, not a translation).

    ``pages``: (url, lang, n_chars) — fetched-page facts: detected
    language and extracted-text length.  Only pages present here can
    form pairs (an alternate pointing at an unfetched URL is silently
    out, as in the real pipeline: you can't align text you don't have).

    Output, one row per unordered pair (url_a < url_b):

    - ``url_a``, ``lang_a``, ``url_b``, ``lang_b`` — fetched facts;
    - ``declared_lang`` — the hreflang value on the edge that produced
      the pair (min across duplicate/reciprocal edges, for determinism);
    - ``len_ratio`` — min(n_chars)/max(n_chars), rounded to 6 places
      (0.0 when the longer side is empty);
    - ``lang_agrees`` — the fetched language of the edge target equals
      the primary subtag of the declared hreflang; for reciprocal pairs
      this is the conjunction across both directions (min over boolean
      = AND);
    - ``candidate`` — the gate: different fetched languages AND
      ``len_ratio >= min_len_ratio`` AND ``lang_agrees``, again
      AND-folded across directions — a pair is a candidate only if
      every edge that produced it passes.
    """
    edges = alternates.filter(
        (F.col("hreflang") != "x-default")
        & F.col("alternate").isNotNull()
        & (F.col("src_url") != F.col("alternate"))
    ).select(
        "src_url",
        F.col("hreflang").alias("declared_lang"),
        "alternate",
    )
    src = pages.select(
        F.col("url").alias("src_url"),
        F.col("lang").alias("src_lang"),
        F.col("n_chars").alias("src_chars"),
    )
    dst = pages.select(
        F.col("url").alias("alternate"),
        F.col("lang").alias("dst_lang"),
        F.col("n_chars").alias("dst_chars"),
    )
    joined = edges.join(src, "src_url").join(dst, "alternate")

    # primary subtag of the declared hreflang ("de-AT" -> "de")
    primary = F.split_part(F.col("declared_lang"), F.lit("-"), F.lit(1))
    lang_agrees = F.col("dst_lang") == primary

    a_first = F.col("src_url") < F.col("alternate")
    url_a = F.when(a_first, F.col("src_url")).otherwise(F.col("alternate"))
    url_b = F.when(a_first, F.col("alternate")).otherwise(F.col("src_url"))
    lang_a = F.when(a_first, F.col("src_lang")).otherwise(F.col("dst_lang"))
    lang_b = F.when(a_first, F.col("dst_lang")).otherwise(F.col("src_lang"))
    chars_a = F.when(a_first, F.col("src_chars")).otherwise(F.col("dst_chars"))
    chars_b = F.when(a_first, F.col("dst_chars")).otherwise(F.col("src_chars"))

    lo, hi = F.least(chars_a, chars_b), F.greatest(chars_a, chars_b)
    len_ratio = F.round(
        F.when(hi > 0, lo.cast("double") / hi).otherwise(F.lit(0.0)), 6
    )
    pairs = joined.select(
        url_a.alias("url_a"),
        lang_a.alias("lang_a"),
        url_b.alias("url_b"),
        lang_b.alias("lang_b"),
        F.col("declared_lang"),
        len_ratio.alias("len_ratio"),
        lang_agrees.alias("lang_agrees"),
        (
            (F.col("src_lang") != F.col("dst_lang"))
            & (len_ratio >= F.lit(min_len_ratio))
            & lang_agrees
        ).alias("candidate"),
    )
    # both directions of a reciprocal hreflang pair collapse to one row;
    # min() over each fact keeps duplicate-edge resolution deterministic
    # (facts other than declared_lang/lang_agrees/candidate are equal
    # across directions by construction)
    return pairs.groupBy("url_a", "url_b").agg(
        F.min("lang_a").alias("lang_a"),
        F.min("lang_b").alias("lang_b"),
        F.min("declared_lang").alias("declared_lang"),
        F.min("len_ratio").alias("len_ratio"),
        F.min("lang_agrees").alias("lang_agrees"),
        F.min("candidate").alias("candidate"),
    )
