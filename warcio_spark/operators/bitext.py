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

import math
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# Stage 2: sentence alignment (Gale & Church 1993, length-based DP)

# sentence boundary = terminal punctuation followed by whitespace — the
# deterministic JVM-side splitter both the engine and every oracle share
SENT_SPLIT_RX = r"(?<=[.!?])\s+"
# DP is O(len_a * len_b) per pair; the cap bounds the worst page at
# 256^2 = 64k cells, microseconds per pair
MAX_SENTS_PER_PAGE = 256

# bead types with their -100*log(prior) penalties, in tie-break order
# (first listed wins a cost tie): substitution, deletion, insertion,
# contractions, merge — the original Gale-Church inventory
GC_BEADS = (
    (1, 1, 0.0),
    (1, 0, 450.0),
    (0, 1, 450.0),
    (2, 1, 440.0),
    (1, 2, 440.0),
    (2, 2, 515.0),
)
# length-model constants: E[len_b] = c * len_a, Var grows with mean length
GC_C = 1.0
GC_S2 = 6.8
# floor for the two-sided tail probability so 1-0/0-1 beads against long
# sentences stay finite (log of 0 otherwise); any pair this unlikely is
# already dominated by the bead penalty structure
GC_MIN_P = 1e-12

ALIGN_SCHEMA = T.StructType([
    T.StructField("url_a", T.StringType()),
    T.StructField("url_b", T.StringType()),
    T.StructField("a_lo", T.IntegerType()),
    T.StructField("b_lo", T.IntegerType()),
    T.StructField("bead", T.StringType()),
    T.StructField("sent_a", T.StringType()),
    T.StructField("sent_b", T.StringType()),
    T.StructField("cost", T.DoubleType()),
])


def gc_match_cost(la: int, lb: int) -> float:
    """-100*log P(two segments of char lengths la, lb are translations)
    under the Gale-Church length model: delta = (lb - la*c) /
    sqrt((la+lb)*s2/2) is ~N(0,1) for true translations; the cost is the
    two-sided tail probability, floored at GC_MIN_P. Pure function —
    tests/test_bitext.py's independent DP oracle imports the constants but
    re-derives the recurrence."""
    if la == 0 and lb == 0:
        return 0.0
    mean = (la + lb / GC_C) / 2.0
    delta = (lb - la * GC_C) / math.sqrt(mean * GC_S2)
    p = max(math.erfc(abs(delta) / math.sqrt(2.0)), GC_MIN_P)
    return -100.0 * math.log(p)


def _gc_align(lens_a, lens_b):
    """The DP: returns the bead list [(da, db)] tracing the min-cost path.
    Ties break to the earlier GC_BEADS entry via strict-< updates."""
    n, m = len(lens_a), len(lens_b)
    inf = float("inf")
    cost = [[inf] * (m + 1) for _ in range(n + 1)]
    back = [[None] * (m + 1) for _ in range(n + 1)]
    cost[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            base = cost[i][j]
            if base == inf:
                continue
            for da, db, pen in GC_BEADS:
                ii, jj = i + da, j + db
                if ii > n or jj > m:
                    continue
                c = base + pen + gc_match_cost(
                    sum(lens_a[i:ii]), sum(lens_b[j:jj])
                )
                if c < cost[ii][jj]:
                    cost[ii][jj] = c
                    back[ii][jj] = (da, db)
    beads = []
    i, j = n, m
    while i > 0 or j > 0:
        da, db = back[i][j]
        beads.append((i - da, j - db, da, db))
        i, j = i - da, j - db
    beads.reverse()
    return beads, cost[n][m]


def split_sentences(col) -> Column:
    """text -> array<string> of trimmed non-empty sentences, capped at
    MAX_SENTS_PER_PAGE — pure JVM (split/transform/filter/slice), shared by
    the aligner's callers so the Arrow hop receives ready arrays."""
    c = F.col(col) if isinstance(col, str) else col
    sents = F.filter(
        F.transform(
            F.split(c, SENT_SPLIT_RX),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: F.length(s) > 0,
    )
    return F.slice(sents, 1, MAX_SENTS_PER_PAGE)


def align_sentences(pairs: DataFrame, a_col: str = "sents_a",
                    b_col: str = "sents_b") -> DataFrame:
    """Gale-Church sentence alignment over candidate translation pairs —
    the stage-2 aligner the bitext pipeline runs after ``bitext_candidates``
    (CCAligned/CCMatrix mine pairs, then length-align sentences before any
    model scoring; Gale & Church 1993 is the canonical length-based DP).
    The reference ecosystem supplies the fetched payloads these texts come
    from (warcio/recordloader.py:138 content_stream); alignment is ours.

    ``pairs``: one row per candidate pair carrying ``url_a``, ``url_b`` and
    the two sentence arrays (see :func:`split_sentences`). Output: one row
    per aligned bead — (url_a, url_b, a_lo, b_lo, bead "da-db", sent_a,
    sent_b, cost) where sent_a/sent_b join the bead's sentences with a
    single space ('' for the empty side of a 1-0/0-1 bead), a_lo/b_lo are
    the bead's start indices in the capped arrays, and cost is the bead's
    penalty + length-model term rounded to 6 places.

    Scale shape: mapInPandas — embarrassingly parallel over pair rows, NO
    shuffle (the candidate table is already the post-join sliver; at 100 TB
    the heavy joins happened in stage 1). Per-pair DP is pure Python inside
    the Arrow batch but bounded by MAX_SENTS_PER_PAGE^2 cells; the arrays
    arrive pre-split JVM-side so Python never touches raw page text."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ua, ub, sa, sb in zip(
                pdf["url_a"], pdf["url_b"], pdf[a_col], pdf[b_col]
            ):
                sa = list(sa) if sa is not None else []
                sb = list(sb) if sb is not None else []
                lens_a = [len(s) for s in sa]
                lens_b = [len(s) for s in sb]
                for i, j, da, db in _gc_align(lens_a, lens_b)[0]:
                    pen = next(p for xa, xb, p in GC_BEADS
                               if (xa, xb) == (da, db))
                    c = pen + gc_match_cost(
                        sum(lens_a[i:i + da]), sum(lens_b[j:j + db])
                    )
                    rows.append({
                        "url_a": ua, "url_b": ub,
                        "a_lo": i, "b_lo": j,
                        "bead": "%d-%d" % (da, db),
                        "sent_a": " ".join(sa[i:i + da]),
                        "sent_b": " ".join(sb[j:j + db]),
                        "cost": round(c, 6),
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in ALIGN_SCHEMA.fields]
            )

    return pairs.select(
        "url_a", "url_b", F.col(a_col).alias(a_col), F.col(b_col).alias(b_col)
    ).mapInPandas(run, ALIGN_SCHEMA)
