"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark set.

The standard pretraining hygiene step (C4/GPT-3-style "dirty" document
detection): build the benchmark's n-gram set, then mark every corpus
document containing any of those n-grams. Semantics here follow the
simple exact-overlap variant — a document is contaminated iff it shares
at least one word n-gram (default n=8) with any benchmark document.

Scale shape (the whole design):
- benchmark sets are tiny relative to the corpus (MBs vs 100 TB), so
  the benchmark gram set is DISTINCT-ed and broadcast — the corpus-side
  scan never shuffles its exploded grams for the membership test
  (left-semi broadcast join), only the per-doc count aggregation
  shuffles, keyed on doc_id (uniform, unskewed);
- grams are md5-hashed before the join so the broadcast table and the
  shuffle rows carry fixed-width keys, not arbitrary-length text;
- the gram explode is a Generate over a pure-codegen transform(sequence)
  — no Python anywhere.

warcio has no corpus layer; this is part of the beyond-the-reference
training-data surface (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warcio_spark.operators.textstats import tokens


def gram_hashes(text, n: int = 8) -> Column:
    """md5 hashes of the word n-grams of ``text`` (empty array when the
    document has fewer than ``n`` tokens)."""
    toks = tokens(text)

    def gram(i: Column) -> Column:
        return F.md5(F.concat_ws(" ", F.slice(toks, i, n)))

    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, gram)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns one row per ``docs`` row: (id_col, n_shared_ngrams,
    contaminated). ``benchmark`` needs only ``text_col``. Documents that
    ALSO appear in the benchmark will trivially self-match — exclude
    them from ``docs`` upstream if that is not intended.
    """
    # corpus grams ride the exploded-codegen shape (explode the position
    # index, THEN build + md5 each gram in the post-Generate projection):
    # the array-building ``transform`` lambda form is interpreted per
    # element and ~5x slower. Occurrence rows go through the broadcast
    # semi-join WITH duplicates and are distinct-ed per doc only after it
    # — the join drops ~everything, so the (id, g) dedup aggregation runs
    # on the hit sliver, not the corpus. The repartition spreads the
    # gram+md5 projection over all cores when the source collapses to few
    # input splits (e.g. one parquet row-group — the same single-task
    # trap the minhash shingle pass hit); on a real multi-split table it
    # is one cheap round-robin exchange.
    sc = docs.sparkSession.sparkContext
    toks = tokens(text_col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = (
        docs.repartition(sc.defaultParallelism)
        .select(F.col(id_col), toks.alias("_toks"), F.explode(idx).alias("_i"))
        .select(
            id_col,
            F.md5(F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_i"), n))).alias("g"),
        )
    )
    bench = benchmark.select(
        F.explode(gram_hashes(text_col, n)).alias("g")
    ).distinct()
    hits = (
        grams.join(F.broadcast(bench), "g", "left_semi")
        .groupBy(id_col, "g")
        .agg(F.lit(1).alias("_one"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
