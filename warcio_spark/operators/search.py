"""BM25 keyword scoring and top-k search over the document corpus.

Okapi BM25 (the standard probabilistic-retrieval scoring function):

    score(d, Q) = sum over t in Q of
        idf(t) * tf(t,d) * (k1 + 1)
                 / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Scale shape (the whole design):
- corpus scalars (N, avgdl) are computed by one tiny aggregate job and
  embedded as literals — at scale they are per-snapshot METADATA (a
  production index stores them next to the corpus), and folding them
  into the plan keeps the scoring side free of the degenerate
  1-row-broadcast nested-loop join a constant-key attach compiles to;
- tokens are filtered to the query terms BEFORE the explode, so the
  per-(doc, term) tf aggregation sees O(matching tokens), not
  O(corpus tokens) — for a k-term query this is the posting-list
  volume an inverted index would touch, obtained without maintaining
  one;
- document frequencies aggregate to <= |Q| rows and broadcast;
- the final top-k is an ORDER BY ... LIMIT k =
  TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows), never a full sort;
- everything is built-in expressions — no Python anywhere.

warcio has no search layer; this is part of the beyond-the-reference
corpus-analytics surface (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warcio_spark.operators.textstats import tokens

__all__ = ["bm25_scores", "bm25_topk"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """(id_col, n_matched_terms, score) for every document matching at
    least one query term (exact token match). ``score`` is rounded to
    ``decimals`` so results are engine-portable."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t) for t in query_terms])

    # dl rides along with the doc BEFORE tokens are filtered to Q
    base = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("dl"),
        F.filter(
            tokens(text_col), lambda t: F.array_contains(terms, t)
        ).alias("_qtoks"),
    )

    # corpus scalars: one tiny aggregate job, embedded as literals
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).first()
    n_docs = stats["n_docs"]
    avgdl = float(stats["avgdl"] or 0.0)

    hits = base.filter(F.size("_qtoks") > 0).select(
        id_col, "dl", F.explode("_qtoks").alias("term")
    )
    tf = hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = tf.join(F.broadcast(df_t), "term").select(
        id_col,
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
            )
        ).alias("c"),
    )
    return contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        F.round(F.sum("c"), decimals).alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score (ties broken by ascending
    ``id_col`` so results are deterministic). ORDER BY + LIMIT compiles
    to TakeOrderedAndProject — no full sort."""
    scored = bm25_scores(
        docs, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
