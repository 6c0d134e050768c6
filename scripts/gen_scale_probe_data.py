#!/usr/bin/env python
"""Generate a 10x-scale probe dataset (~sf1.0-shaped) for scale-holding
validation ONLY. This is NOT the driver's data (its sf1.0 generator is not
in the repo); distributions mimic the sf0.1 tables: documents are bags of
the same 31-token vocabulary with the same length/lang/source mix,
embeddings are unit-norm 64-dim float32 with labels 0..9, events follow
the same 30-day / 5-type / uniform-user shape. TPC-H tables are copied
from sf0.1 (their queries are sub-second and not scale-validation
targets). Deterministic (numpy seed 42). Writes to --out (default
/root/sf1g); never touches /root/testdata.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch dup".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.412, 0.151, 0.149, 0.148, 0.140])


def gen_documents(out, n, rng):
    lang = LANGS[rng.choice(len(LANGS), n, p=LANG_P / LANG_P.sum())]
    source = np.char.add("src", rng.integers(0, 20, n).astype(str))
    # token counts sized so n_chars lands in ~44..577 like sf0.1
    ntok = rng.integers(8, 100, n)
    texts = []
    for k in ntok:
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), k)]))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(n_chars),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out, n, rng):
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out, n, rng):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.int64(30 * 24 * 3600 * 1_000_000)
    ts = base + rng.integers(0, span, n)
    types = np.array(["signup", "click", "purchase", "error", "view"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(ts)),
        "user_id": pa.array(rng.integers(0, 15000, n).astype(np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 200, n), 2)),
        "props": pa.array(
            np.char.add(np.char.add('{"k": ',
                                    rng.integers(0, 100, n).astype(str)),
                        "}")),
    })
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sf1g")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--events", type=int, default=1_000_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(args.out, args.docs, rng)
    gen_embeddings(args.out, args.vecs, rng)
    gen_events(args.out, args.events, rng)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        shutil.copyfile(os.path.join(args.src, f"{t}.parquet"),
                        os.path.join(args.out, f"{t}.parquet"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
