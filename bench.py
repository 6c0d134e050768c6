#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced end-to-end with a noop sink (full materialization, no
driver collect). The frontier round additionally reports URLs/sec — the
north-rule headline metric. Run with SPARK_GRAFT_BENCH_SCALING=1 to also
measure local[8] vs local[32] scaling efficiency (separate sessions).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "index_projection",
    "pricing_summary",
    "revenue_by_nation",
    "anti_join_unseen",
    "windowed_topk",
    "running_offset",
    "tumbling_window",
    "sessionize",
    "token_stats",
    "quality_scores",
    "lang_markers",
    "repetition_stats",
    "term_doc_freq",
    "exact_dup_groups",
    "outlinks",
    "ngram_jaccard_adjacent",
    "simhash",
    "minhash_dedup",
    "fingerprint",
    "embedding_topk",
    "lsh_topk",
    "embedding_near_dup",
    "cdxj_read",
    "cdx_query",
    "sitemap_recrawl",
    "freshness",
    "domain_quality",
    "closest_capture",
    "host_graph",
    "host_rank",
    "pipeline_clean",
    "decontaminate",
    "line_dedup",
    "dup_spans",
    "bm25_topk",
    "graph_components",
    "lm_perplexity",
    "shard_assignment",
    "zipnum_summary",
    "zipnum_pages",
    "normalize_text",
    "scope_filter",
    "weighted_mix",
    "boilerplate",
    "timemap",
    # round-5 late additions (all single-scan codegen unless noted)
    "cdx_tld_manifest",
    "link_directives",
    "page_directives",
    "strip_tracking",
    "charset_sniff",
    "corpus_report",
    "retry_after",
    "script_shares",
    "declared_lang",
    # round-5c additions
    "capture_diff",  # one urlkey hash agg, no join
    "link_rot",  # aggregate-before-join target classification
    "bm25_indexed",  # bucket-pruned posting lists (cached index build)
    "host_hits",  # 3 auth/hub sweeps on the host table
    "robots_audit",  # broadcast rules, longest-match codegen, no shuffle
    "adaptive_delays",  # one map-combined host agg (exact percentile)
    # round-5d additions
    "main_content",  # block-density readability: split+HOF map, no shuffle
    "rank_feedback",  # broadcast score join; scalars folded as literals
    "crawl_depth",  # level-synchronous BFS: frontier-only shuffles per round
    "url_patterns",  # template codegen + ONE (host,template) agg + host window
    "circuit_breaker",  # two host aggs + broadcast last-success join
    "redirect_chains",  # pointer doubling: log(max_hops) self-joins
    "parked_hosts",  # (host,body-hash) partial agg -> host rollup
    "cdx_collapse",  # one lag window on urlkey, codegen filter
    "change_rate",  # lag window + one urlkey agg, scalar math after
    "link_farms",  # distinct edges + reversed-pair semi-join, host-sized
    "recrawl_priors",  # literal CASE prior + one url agg + one equi join
    "delay_compliance",  # lag window + host agg share one shuffle
    # round-5f additions
    "sniff_mime",  # hex prefix ladder, pure codegen, no shuffle
    "segment_reassembly",  # one origin-id shuffle for the segmented sliver
    "bitext_candidates",  # two url equi joins + one pair agg
    "ip_queues",  # broadcast resolution join + one host-queue agg
    "truncation_audit",  # header HOF filters + CASE ladder, zero shuffles
    "compression_ratio",  # one Arrow hop (zlib len); rest codegen, no shuffle
    "fetch_fairness",  # host agg + two-phase prefix rank, no 1-partition stage
    "alias_collapse",  # alias-sources-only doubling + 2-stage capture fold
    "sitemap_coverage",  # two distinct sides + full-outer url join + host agg
    # round-5g additions
    "centroid_outliers",  # posexplode partial-agg centroid, broadcast join, 2-phase window
    "stratified_quota",  # two-phase per-stratum bottom-quota, salted-md5 order
    "mirror_hosts",  # digest-keyed host-pair join, ubiquity cap bounds fanout
    "dedup_keep_best",  # CC rounds on pair participants + max_by agg + anti-join
    "trust_rank",  # seeded power iteration, one contribution shuffle per round
    "html_tables",  # staged regex Generates, slice caps, zero shuffles
    "minhash_incremental",  # batch-only banding, one (band,bucket) probe join
    "holdout_split",  # components on pair participants + one corpus join + codegen CASE
    "code_blocks",  # one regex Generate, whitespace-verbatim, zero shuffles
    "temperature_mix",  # tiny-count quota algebra + two-phase bottom-quota
    # round-5h additions
    "pack_sequences",  # per-shard window cumsum, one hash shuffle, no SinglePartition
    "simhash_incremental",  # batch-only simhash + one prefix-bucket probe join
    "bpe_token_stats",  # two regexp_count codegen columns, no shuffle
    "mojibake_repair",  # literal-alternation count + one Arrow roundtrip hop
    "cdc_dedup",  # one Arrow chunking hop + chunk-hash agg/join-back, O(chunks)
    "embedding_near_dup_inc",  # batch-only sketch, (rep,bucket) probe join, exact verify
    "quality_classifier",  # hashed features + broadcast weight join + one doc agg
    # round-5i additions
    "dsir_weights",  # 256-key dist agg + broadcast log-ratio join + doc agg
    "ppl_buckets",  # per-lang (avg,stddev) agg broadcast back; no lang window
    # round-5j additions
    "img_alt_pairs",  # img-tag blob scan + one Generate, map-only, no Arrow
    "img_captions",  # extraction + two-stage pair rollup, no count_distinct Expand
    "bitext_align",  # JVM sentence split + ONE MapInPandas, no Exchange
    "publish_dates",  # meta/time/url regex ladder, pure codegen, map-only
    "image_fetch_frontier",  # caption rollup + url anti-join + two-phase host cap
]


def _local_dirs() -> str:
    """Shuffle/spill dir for the bench: tmpfs when available. On a real
    cluster every executor shuffles to its own local NVMe, so aggregate
    shuffle bandwidth scales with the node count; a single shared sandbox
    disk does not, and measuring N-vs-4N cores against one disk misreports
    the engine's scaling as the disk's. Override: SPARK_GRAFT_LOCAL_DIR."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark_local_bench"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"


def make_spark(cpus: str):
    """Session for ``cpus`` parallelism. Two master shapes:

    - ``"8"``            -> ``local[8]``: one JVM, task threads share it.
    - ``"4x8"``          -> ``local-cluster[4,8,<mb>]``: a REAL mini
      standalone cluster — 4 separate executor JVM processes x 8 cores,
      each with its own heap, shuffle dirs, and python-worker pool. This
      is the literal "N executors vs 4N executors" shape of the north
      rule: executor-to-executor shuffle crosses process boundaries over
      the block transfer service instead of staying in one address
      space. Only used by the scaling evidence legs (it costs executor
      JVM spin-up, so the plain bench stays local[N]).
    """
    from pyspark.sql import SparkSession

    if "x" in str(cpus):
        n_exec, cores = (int(p) for p in str(cpus).split("x"))
        worker_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "9216"))
        master = f"local-cluster[{n_exec},{cores},{worker_mb}]"
        total = n_exec * cores
        # worker daemons write app dirs under SPARK_HOME/work by default
        os.environ.setdefault("SPARK_WORKER_DIR", "/tmp/spark-worker")
        mem_confs = {
            "spark.executor.memory": os.environ.get(
                "SPARK_GRAFT_EXEC_MEM", "8g"),
            "spark.driver.memory": "8g",
            # executor JVMs must spawn the same interpreter for UDF workers
            "spark.executorEnv.PYSPARK_PYTHON": sys.executable,
        }
    else:
        master = f"local[{cpus}]"
        total = int(cpus)
        mem_confs = {
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "48g"),
        }

    builder = (
        SparkSession.builder.master(master)
        .appName("warcio_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, total)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", _local_dirs())
        .config("spark.ui.enabled", "false")
    )
    for k, v in mem_confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    if "x" in str(cpus):
        # executors register asynchronously; until they do,
        # defaultParallelism is wrong and early jobs under-parallelize
        deadline = time.time() + 120
        sc = spark.sparkContext
        while time.time() < deadline:
            # getExecutorMemoryStatus includes the driver -> want n_exec + 1
            n_up = sc._jsc.sc().getExecutorMemoryStatus().size()
            if n_up >= n_exec + 1:
                break
            time.sleep(0.5)
        else:
            raise RuntimeError(
                f"local-cluster executors failed to register: "
                f"{n_up}/{n_exec + 1}")
    # ship the package to executor workers (harness cwd may differ)
    import __spark_entry__ as _entry

    _entry._ensure_shipped(spark)
    return spark


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_suite(spark, sf_dir: str):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    # headline frontier metric first, on a fresh heap (the query battery
    # below pollutes local-mode timings with GC)
    li_rows = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    n_urls = max(100_000, li_rows * 3)
    timings["frontier_round"], urls_per_sec = frontier_throughput(spark, n_urls)

    for name in BENCH_QUERIES:
        # best of 2: the shared sandbox's co-tenant load varies identical
        # runs by up to 4x; a single sample is as much a measurement of the
        # neighbors as of the query
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    return timings, urls_per_sec, n_urls


def frontier_throughput(spark, n_urls: int, runs: int = 3, all_times=None):
    """URLs/sec through canonicalize -> hash -> dedup -> seen anti-join ->
    robots -> salted politeness schedule. Reports the best of ``runs``
    repetitions: run 1 pays one-time codegen compile, and local[N] timings
    jitter with GC — the min is the steady-state number.

    The candidate universe and the pre-built seen-set are MATERIALIZED to
    parquet before the timed loop: in production both are storage-resident
    tables, and timing expression-generated input instead would (a) bill
    synthetic row generation to the pipeline and (b) inline the generator
    expression once per reference inside the canonicalization filters —
    an artifact worth ~4x at 16M rows."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from warcio_spark.plans.frontier import (
        PolitenessConfig,
        demo_robots,
        fetch_order,
        prepare_candidates,
        schedule_round,
        with_frontier_keys,
    )

    parts = spark.sparkContext.defaultParallelism * 2

    def universe(df):
        # zipf-ish: ~30% of urls on host0, ~15% on host1, rest spread;
        # 10% of urls are MESSY: 8% carry the common real-world mess
        # (uppercase scheme/host, default port, dot segments) that the
        # JVM middle tier of the canonicalization split-union resolves
        # in codegen, and 2% carry percent-encodings, which only the
        # Python kernel normalizes — so all three tiers (passthrough /
        # JVM-fix / Arrow hop) are exercised at their realistic mix
        r = F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100))
        hostnum = (
            F.when(r < 30, F.lit(0))
            .when(r < 45, F.lit(1))
            .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(95)) + 2)
        )
        clean = F.concat(
            F.lit("http://host"), hostnum.cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
            F.lit("?q="), F.pmod("id", F.lit(7)).cast("string"),
        )
        messy = F.concat(
            F.lit("HTTP://Host"), hostnum.cast("string"),
            F.lit(".Example.COM:80/a/../p/"), F.col("id").cast("string"),
            F.lit("?q="), F.pmod("id", F.lit(7)).cast("string"),
        )
        pct = F.concat(
            F.lit("http://host"), hostnum.cast("string"),
            F.lit(".example.com/p%41/"), F.col("id").cast("string"),
            F.lit("?q=%2f"), F.pmod("id", F.lit(7)).cast("string"),
        )
        return df.select(
            F.when(F.pmod("id", F.lit(50)) == 0, pct)
            .when(F.pmod("id", F.lit(10)) == 0, messy)
            .otherwise(clean)
            .alias("url"),
            (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(1000)) / 10.0).alias("priority"),
            F.col("id").alias("seq"),
        )

    tmp = tempfile.mkdtemp(prefix="frontier_bench_")
    universe(spark.range(0, n_urls, 1, parts)).write.mode("overwrite").parquet(
        os.path.join(tmp, "cands")
    )
    with_frontier_keys(
        universe(spark.range(0, int(n_urls * 0.3), 1, parts))
    ).select("url_hash").write.mode("overwrite").parquet(os.path.join(tmp, "seen"))
    cands_raw = spark.read.parquet(os.path.join(tmp, "cands"))
    seen = spark.read.parquet(os.path.join(tmp, "seen"))

    # salt buckets scale with cores: a Zipf mega-host (30% of this universe)
    # is pre-pruned per (host, salt), and a fixed S leaves cores idle during
    # that stage at high parallelism. The scheduled output is provably
    # invariant to S (phase 2 re-ranks exactly per host).
    cfg = PolitenessConfig(slot_seconds=600, default_crawl_delay=1.0,
                           max_host_budget=500,
                           salt_buckets=spark.sparkContext.defaultParallelism * 4)
    # range boundaries are sampled ONCE and reused per round — the crawl()
    # production model (sample_order_boundaries at crawl start); fetch_order
    # itself runs zero driver actions per round
    from warcio_spark.plans.frontier import sample_order_boundaries

    bounds = sample_order_boundaries(cands_raw)
    frontier_sec = None
    for _ in range(max(1, runs)):
        tracker = []
        t0 = time.perf_counter()
        force(fetch_order(schedule_round(
            prepare_candidates(cands_raw, seen, demo_robots(spark), cfg), cfg
        ), boundaries=bounds, persist_tracker=tracker))
        dt = time.perf_counter() - t0
        frontier_sec = dt if frontier_sec is None else min(frontier_sec, dt)
        if all_times is not None:
            all_times.append(round(dt, 3))
        for df in tracker:
            df.unpersist(blocking=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return round(frontier_sec, 3), round(n_urls / frontier_sec, 1)


def warc_ingest_throughput(spark, n_records: int = 48_000, n_files: int = 64,
                           runs: int = 3):
    """records/s for full WARC ingest + content extraction — the direct
    comparison point to the reference's single-thread iterate+content read
    (~12.4k rec/s, BASELINE.md). Self-contained: builds a synthetic .warc.gz
    corpus from synth_pages via our own serializer, then measures read_warc.

    48k records (r5, up from 12k): the smaller corpus finished in <0.5s on
    8+ cores, so the reported rate was mostly fixed cost (file listing,
    plan compile, stage scheduling) rather than per-record throughput —
    the quantity that actually extrapolates to 100 TB. Fixed costs are
    still included, just amortized over enough records to measure the
    steady state.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from warcio_spark.sources import read_warc, synth_pages

    tmp = tempfile.mkdtemp(prefix="warc_ingest_bench_")
    pages = synth_pages(spark, n_records, partitions=n_files)

    def dump(it):
        import os as _os

        from pyspark import TaskContext

        from warcio_spark.kernels.build import build_record, serialize_record

        buf = []
        for row in it:
            rec = build_record(
                row.url, "response", payload=bytes(row.html),
                record_id="<urn:uuid:bench>", warc_date="2024-01-01T00:00:00Z",
            )
            buf.append(serialize_record(rec, gzip=True))
        if buf:
            pid = TaskContext.get().partitionId()
            with open(_os.path.join(tmp, "part-{0:05d}.warc.gz".format(pid)), "wb") as f:
                for b in buf:
                    f.write(b)
        return iter(())

    pages.rdd.mapPartitions(dump).count()

    best = None
    for _ in range(max(1, runs)):
        t0 = time.perf_counter()
        force(read_warc(spark, tmp + "/*"))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    shutil.rmtree(tmp, ignore_errors=True)
    return round(best, 3), round(n_records / best, 1)


def main():
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # one warmup action so JVM/codegen startup isn't billed to the first query
    spark.range(1000).count()
    t0 = time.perf_counter()
    timings, urls_per_sec, n_urls = run_suite(spark, SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    ingest_sec, ingest_rps = warc_ingest_throughput(spark)
    timings["warc_ingest"] = ingest_sec
    spark.stop()

    out = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_label,
        "frontier_urls_per_sec": urls_per_sec,
        "frontier_urls": n_urls,
        "warc_ingest_records_per_sec": ingest_rps,
        "cpus": int(CPUS),
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SCALING"):
        out.update(run_scaling())

    print(json.dumps(out))


def _scaling_leg(spark_cores: int, pin_cores: int, n_urls: int,
                 runs: int, disjoint: bool = False) -> dict:
    """One scaling leg in a FRESH SUBPROCESS with CPU affinity pinned
    BEFORE the JVM starts: an in-process sched_setaffinity cannot re-pin
    the already-running py4j JVM, and an unpinned local[8] lets python UDF
    workers borrow the box's idle cores, overstating the small config.

    ``disjoint=True`` provisions the leg the way a real cluster sizes
    executors: the JVM (and driver) are pinned to the FIRST half of the
    ``pin_cores`` envelope and every python UDF worker re-pins itself — via
    a PYSPARK_PYTHON wrapper — to the SECOND half, so nothing in the leg
    ever time-slices a core and the total footprint is still exactly
    ``pin_cores``. ``spark_cores`` should then be ``pin_cores // 2`` (one
    task thread per dedicated JVM core).

    Every leg also reports an objective interference measure: box-wide
    busy CPU seconds over the leg (/proc/stat deltas) minus the leg's own
    process-tree CPU (live /proc descendants of the child — driver, py4j
    JVM, pyspark daemons/workers — plus reaped-children counters). The
    remainder is co-tenant CPU that ran inside the measurement window; a
    clean pair is one where both legs carry ~zero of it, with no
    eyeballing of load averages. Mechanics: scripts/_scaling_child.py."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_scaling_child.py"),
         str(spark_cores), str(pin_cores), str(n_urls), str(runs),
         "1" if disjoint else "0"],
        capture_output=True, text=True, cwd="/tmp",
    )
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except (IndexError, ValueError):
        raise RuntimeError(
            f"scaling leg failed (cores={spark_cores} pin={pin_cores} "
            f"disjoint={disjoint}):\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
        )


def run_scaling() -> dict:
    """North-rule scaling evidence: the same frontier job at N and 4N cores.

    Noise handling for the shared sandbox: the legs ALTERNATE across
    SPARK_GRAFT_SCALING_PAIRS subprocess launches (so a co-tenant load
    burst cannot bias one side of the ratio), each leg is best-of-runs
    internally, and the reported number is the best (min) per level.

    SPARK_GRAFT_SCALING_CONTROL=1 adds the core-sharing control pair:
    local[4] pinned to 8 cores vs local[16] pinned to 32 — python UDF
    workers get dedicated headroom instead of time-slicing with JVM task
    threads on the same pins (a real cluster provisions executor cores for
    python workers explicitly; pinned local mode cannot). The spread
    between the plain and control efficiencies isolates the local-mode
    core-sharing artifact from genuine serial fraction."""
    n_urls = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "16000000"))
    pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "2"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))

    levels = [("8", 8), ("32", 32)]
    if os.environ.get("SPARK_GRAFT_SCALING_CONTROL"):
        levels += [("4", 8), ("16", 32)]

    best: dict = {}
    for _ in range(max(1, pairs)):
        for spark_cores, pin in levels:
            leg = _scaling_leg(spark_cores, pin, n_urls, runs)
            key = f"{spark_cores}@{pin}"
            if key not in best or leg["ups"] > best[key]["ups"]:
                best[key] = leg

    out: dict = {
        "scaling": {
            k: {"frontier_sec_warm": v["sec"], "frontier_urls_per_sec": v["ups"]}
            for k, v in best.items()
        },
        "scaling_urls": n_urls,
        "scaling_efficiency_8_to_32": round(
            (best["32@32"]["ups"] / best["8@8"]["ups"]) / 4.0, 3
        ),
    }
    if "4@8" in best and "16@32" in best:
        out["scaling_efficiency_4_to_16_headroom"] = round(
            (best["16@32"]["ups"] / best["4@8"]["ups"]) / 4.0, 3
        )
    return out


if __name__ == "__main__":
    main()
