#!/usr/bin/env python
"""Generate pinned-golden DuckDB oracles for the deterministic queries whose
semantics aren't SQL-expressible (custom hashing / LSH / WARC corpus /
stubbed codecs).

Each golden is the query's OWN output at the driver's correctness scale
(sf0.01), frozen as a `SELECT ... FROM (VALUES ...)` statement that DuckDB
replays verbatim. That upgrades the driver's weak rows-only check to the
full row-count + schema + value-hash gate: the outputs are deterministic by
construction (fixed seeds, JVM hashes, parity-tested ordering), so any
drift — a partitioning-dependent result, a seed change, a broken kernel —
fails the hash. Regenerate with:

    python scripts/gen_goldens.py          # writes goldens/*.sql

The queries themselves remain independently verified against non-golden
oracles elsewhere: simhash locality + LSH recall in tests/test_dedup_quality,
frontier vs the single-process oracle crawler in tests/test_frontier_parity,
warc parsing field-by-field vs the reference library in
tests/test_kernel_parse_oracle.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_SF = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(REPO, "goldens")

# queries to pin, with the DuckDB type per column kind
GOLDEN_QUERIES = [
    "minhash_incremental",
    "simhash_incremental",
    "cdc_dedup",
    "embedding_near_dup_inc",
    "near_dup_clusters",
    "simhash",
    "minhash_dedup",
    "fingerprint",
    "lsh_topk",
    "embedding_near_dup",
    "frontier_schedule",
    "warc_parse_corpus",
    "wet_extract",
    "multimodal_features",
    "compression_ratio",
    "bitext_align",
]

_DUCK_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        return repr(v)  # shortest round-trip decimal -> identical double
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def golden_sql(df) -> str:
    rows = df.collect()
    names = df.columns
    types = [f.dataType.simpleString() for f in df.schema.fields]
    duck = [_DUCK_TYPES[t] for t in types]
    if not rows:
        cols = ", ".join(
            f"CAST(NULL AS {d}) AS {n}" for n, d in zip(names, duck)
        )
        return f"SELECT {cols} WHERE 1=0"
    vals = ",\n".join(
        "(" + ", ".join(_sql_literal(row[n]) for n in names) + ")" for row in rows
    )
    outer = ", ".join(
        f"CAST({n} AS {d}) AS {n}" for n, d in zip(names, duck)
    )
    return (
        f"SELECT {outer}\nFROM (VALUES\n{vals}\n) AS golden({', '.join(names)})"
    )


INDEPENDENT_ORACLE_TESTS = [
    # the semantic ground the goldens stand on: if any of these fail, a
    # regenerated golden would pin the regression instead of catching it
    "tests/test_dedup_quality.py",
    "tests/test_frontier_parity.py",
    "tests/test_kernel_parse_oracle.py",
    "tests/test_similarity.py",
    "tests/test_links.py",
]


def _guard_independent_oracles() -> str:
    """Refuse to regenerate goldens unless the independent semantic oracles
    pass RIGHT NOW: a pinned golden proves determinism, not correctness, so
    regeneration after a silent behavior regression would mask it. Returns
    a provenance stamp (commit + test summary) for the golden headers."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", *INDEPENDENT_ORACLE_TESTS],
        cwd=REPO, capture_output=True, text=True,
    )
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout + proc.stderr)
        raise SystemExit(
            "REFUSING to regenerate goldens: independent oracle tests failed "
            f"({summary}). Fix the regression first."
        )
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip() or "unknown"
    return f"commit {commit}; oracle gate: {summary}"


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    stamp = _guard_independent_oracles()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gen-goldens")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    qs = entrymod.queries()
    # --only name [name ...]: regenerate a subset (new goldens) without
    # churning the provenance line of every existing one
    only = sys.argv[sys.argv.index("--only") + 1:] if "--only" in sys.argv \
        else None
    for name in (only or GOLDEN_QUERIES):
        assert name in GOLDEN_QUERIES, name
        df = qs[name](spark, GOLDEN_SF)
        sql = golden_sql(df)
        path = os.path.join(OUT_DIR, name + ".sql")
        with open(path, "w") as f:
            f.write(
                f"-- pinned golden oracle for '{name}' at {GOLDEN_SF}\n"
                "-- generated by scripts/gen_goldens.py; the query output is\n"
                "-- deterministic by construction (fixed seeds, JVM hashes,\n"
                "-- parity-tested total ordering)\n"
                f"-- provenance: {stamp}\n" + sql + "\n"
            )
        print(f"{name}: {len(sql)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
