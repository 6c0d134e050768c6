"""minhash_dedup_corpus: end-to-end near-dup removal vs a brute-force
Python oracle (all-pairs Jaccard + union-find)."""

import pytest

from warcio_spark.operators.dedup import minhash_dedup_corpus


def _shingles(text, n=3):
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _oracle_survivors(rows, threshold, n=3):
    sh = {i: _shingles(t, n) for i, t in rows}
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = [i for i, _ in rows]
    for a in ids:
        for b in ids:
            if a >= b or not sh[a] or not sh[b]:
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i for i in ids if find(i) == i}


BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for something to eat")


def _variant(k):
    toks = BASE.split()
    toks[k % len(toks)] = f"tweak{k}"
    return " ".join(toks)


ROWS = [
    (0, BASE),
    (1, _variant(1)),   # ~near-dup of 0
    (2, _variant(2)),   # ~near-dup of 0 and 1 (transitive chain)
    (3, "completely unrelated text about spark shuffles and partitions "
        "with enough words to form plenty of distinct shingles here"),
    (4, _variant(1)),   # exact dup of 1
    (5, "short text"),  # too short to shingle at n=3? (2 tokens -> none)
]


def test_survivors_match_bruteforce_oracle(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {
        r["doc_id"]
        for r in minhash_dedup_corpus(docs, threshold=0.7).collect()
    }
    assert got == _oracle_survivors(ROWS, 0.7)


def test_transitive_chain_collapses(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    kept = {
        r["doc_id"]
        for r in minhash_dedup_corpus(docs, threshold=0.7).collect()
    }
    # 0,1,2,4 are one transitive cluster -> only 0 survives
    assert 0 in kept
    assert kept.isdisjoint({1, 2, 4})
    assert {3, 5} <= kept


def test_no_pairs_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(i, f"totally distinct document number {i} "
             + " ".join(f"u{i}w{j}" for j in range(20)))
         for i in range(4)],
        ["doc_id", "text"],
    )
    assert minhash_dedup_corpus(docs, threshold=0.9).count() == 4


def test_full_rows_survive(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    out = minhash_dedup_corpus(docs, threshold=0.7)
    assert set(out.columns) == {"doc_id", "text"}
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[0] == BASE


def test_boilerplate_strip_scoped_threshold(spark):
    """Lines in >= min_docs distinct docs of one scope vanish everywhere;
    below-threshold lines keep every occurrence; scopes are independent."""
    from warcio_spark.operators.dedup import boilerplate_strip

    rows = [
        # source A: 'nav' in 3 docs (boiler), 'rare' in 2 (kept)
        (1, "A", "nav\nrare\nalpha"),
        (2, "A", "nav\nrare\nbeta"),
        (3, "A", "nav\ngamma\nnav"),      # dup line in ONE doc counts once
        # source B: 'nav' appears in only 1 doc there -> kept
        (4, "B", "nav\ndelta"),
        (5, "B", "epsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.doc_id: r for r in
           boilerplate_strip(df, min_docs=3).collect()}
    assert got[1].text_clean == "rare\nalpha"
    assert got[2].text_clean == "rare\nbeta"
    assert got[3].text_clean == "gamma"
    assert (got[3].n_lines_in, got[3].n_lines_kept) == (3, 1)
    assert got[4].text_clean == "nav\ndelta"   # scope B untouched
    assert got[5].text_clean == "epsilon"
    assert all(got[i].n_lines_in == len(rows[i - 1][2].split("\n"))
               for i in got)
