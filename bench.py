#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

``--scaling`` mode: runs the flagship extraction job at two parallelism
levels (local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors) in fresh JVMs and writes throughput + scaling efficiency to
BENCH/BASELINE.md (north_rule: efficiency = tput(4N) / (4 × tput(N)),
target ≥ 0.8).

The timed extraction job reads pre-materialized pages parquet (the
Iceberg-scan stand-in): html decode + segmentation + boilerplate drop +
XY-cut + text assembly + a byte-count aggregate, i.e. the full pipeline
actually executes (the aggregate touches extracted_text so nothing is
pruned away).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "4"))
SCALING_REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "80"))
PAGES_DIR = f"/tmp/lps_bench_pages_{os.path.basename(SF_DIR)}_x{REPLICATE}"


def get_session(cores: int):
    from layout_parser_spark.session import get_spark

    return get_spark(
        f"lps-bench-{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(max(cores, 8)),
            "spark.driver.memory": "24g",
        },
    )


def ensure_pages(spark) -> str:
    """Materialize the synthetic pages table once (the 'Iceberg table')."""
    if not os.path.exists(os.path.join(PAGES_DIR, "_SUCCESS")):
        from layout_parser_spark.sources import synth_pages

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        synth_pages(docs, replicate=REPLICATE).repartition(
            256
        ).write.mode("overwrite").parquet(PAGES_DIR)
    return PAGES_DIR


def run_extraction(spark, pages_dir: str) -> tuple[float, int, int]:
    """Returns (seconds, n_docs, total_bytes)."""
    from pyspark.sql import functions as F

    from layout_parser_spark.plans import extract_main_text

    pages = spark.read.parquet(pages_dir)
    t0 = time.perf_counter()
    out = extract_main_text(pages)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("extracted_text")).alias("b"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    return dt, int(row.n), int(row.b)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import __spark_entry__ as entry

    from pyspark.sql import functions as F

    spark = get_session(CPUS)
    pages_dir = ensure_pages(spark)

    results = {}

    # warm up the JVM + python workers on a tiny slice
    spark.read.parquet(pages_dir).limit(64).count()

    ext_sec, n_docs, n_bytes = run_extraction(spark, pages_dir)
    results["extract_main_text"] = round(ext_sec, 3)

    qs = entry.queries()
    headline = [
        "agg_pricing_summary",
        "join_region_revenue",
        "topk_events_per_user",
        "sessionize_events",
        "ocr_gather_data",
        "group_by_category",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "minhash_lsh",
        "docs_token_stats",
        "docs_lang_id",
        "docs_fingerprint",
        "ann_cosine_topk",
        "geom_rect_algebra",
        "geom_is_in_join",
    ]
    # best-of-2 per query: the sandbox VM shows noisy-neighbor CPU steal
    # (single runs swing 2×) — the min is the least-contended estimate of
    # the plan's own cost (same protocol as --scaling, documented in
    # BENCH/BASELINE.md)
    for name in headline:
        fn = qs[name]
        results[name] = round(
            min(
                timed(
                    lambda: fn(spark, SF_DIR)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                for _ in range(2)
            ),
            3,
        )

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": os.path.basename(SF_DIR),
                "docs_per_sec": round(n_docs / ext_sec, 1),
                "extract_docs": n_docs,
                "extract_bytes": n_bytes,
                "cpus": CPUS,
            }
        )
    )


def scaling_child(cores: int):
    global REPLICATE, PAGES_DIR
    REPLICATE = SCALING_REPLICATE
    PAGES_DIR = (
        f"/tmp/lps_bench_pages_{os.path.basename(SF_DIR)}_x{REPLICATE}"
    )
    spark = get_session(cores)
    pages_dir = ensure_pages(spark)
    # two full warm-up passes: python workers + JIT + page cache
    run_extraction(spark, pages_dir)
    run_extraction(spark, pages_dir)
    runs = []
    for _ in range(4):
        dt, n, b = run_extraction(spark, pages_dir)
        runs.append(round(n / dt, 2))
    # best-of-N: the sandbox VM sees noisy-neighbor CPU steal; the best
    # run is the least-contended estimate of the job's own throughput
    print(json.dumps({"cores": cores, "docs_per_sec": max(runs), "runs": runs}))


def scaling_main():
    out = {}
    all_runs = {}
    for cores in (8, 32):
        time.sleep(10)  # let previous JVMs/page-cache churn settle
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores)],
            capture_output=True,
            text=True,
            timeout=3000,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        out[rec["cores"]] = rec["docs_per_sec"]
        all_runs[rec["cores"]] = rec.get("runs", [])
    eff = out[32] / (4 * out[8])
    md = f"""# BENCH — throughput scaling evidence (north_rule)

Flagship extraction job (segment → boilerplate drop → XY-cut → text
assembly) over the same pre-materialized synthetic pages parquet
({PAGES_DIR}), identical input at both parallelism levels; 2 warm-up
passes then best of 4 timed runs (the sandbox VM shows noisy-neighbor CPU
steal, so best-of-N estimates the job's own throughput).  local[8] vs
local[32] is the sandbox stand-in for N vs 4N executors.

| parallelism | docs/sec (best) | all runs |
|---|---|---|
| local[8]  (N)  | {out[8]:.2f} | {all_runs.get(8)} |
| local[32] (4N) | {out[32]:.2f} | {all_runs.get(32)} |

**scaling efficiency = tput(4N) / (4 × tput(N)) = {eff:.3f}**
(north_rule target ≥ 0.8)
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"tput": out, "efficiency": round(eff, 3)}))



def skew_main():
    """Evidence for the explicit skew handling (north_rule): build a
    host-skewed pages layout (one hot host holds half the corpus, input
    partitioned BY HOST so one partition is huge), then run extraction
    with and without the salted repartition."""
    from pyspark.sql import functions as F

    from layout_parser_spark.sources import synth_pages

    spark = get_session(CPUS)
    skew_dir = f"/tmp/lps_skew_pages_{os.path.basename(SF_DIR)}_x24"
    if not os.path.exists(os.path.join(skew_dir, "_SUCCESS")):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pages = synth_pages(docs, replicate=24)
        # half the corpus lands on one hot host (heavy-tailed crawl)
        skewed = pages.withColumn(
            "url",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("https://hot.example.com/page/"), F.col("doc_id")),
            ).otherwise(F.col("url")),
        ).withColumn(
            "host", F.regexp_extract("url", r"https?://([^/]+)/", 1)
        )
        # partition BY HOST: the realistic worst case (WARC files are often
        # host-clustered) — one partition gets 50% of all rows
        skewed.repartition(64, "host").drop("host").write.mode(
            "overwrite"
        ).parquet(skew_dir)

    from layout_parser_spark.plans import extract_main_text

    def run(salt):
        pages = spark.read.parquet(skew_dir)
        t0 = time.perf_counter()
        out = extract_main_text(pages, salt_partitions=salt)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("extracted_text")).alias("b"),
        ).collect()[0]
        return time.perf_counter() - t0, int(row.n)

    run(None)  # warm
    best = {}
    for salt in (None, 256):
        label = "salted" if salt else "unsalted"
        times = []
        for _ in range(3):
            dt, n = run(salt)
            times.append(round(dt, 2))
        best[label] = (min(times), times, n)
    speedup = best["unsalted"][0] / best["salted"][0]
    md = f"""# BENCH — skew handling evidence (north_rule)

Host-skewed input: 50% of {best['salted'][2]} pages on ONE host, parquet
layout partitioned by host (one hot partition), local[{CPUS}].

| variant | sec (best of 3) | runs |
|---|---|---|
| unsalted (plan inherits skewed input partitioning) | {best['unsalted'][0]} | {best['unsalted'][1]} |
| salted repartition pmod(xxhash64(url, salt), 256) | {best['salted'][0]} | {best['salted'][1]} |

**salting speedup on skewed input: {speedup:.2f}×**
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SKEW.md", "w") as f:
        f.write(md)
    print(json.dumps({"skew": {k: v[0] for k, v in best.items()},
                      "speedup": round(speedup, 2)}))


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        scaling_main()
    elif "--skew" in sys.argv:
        skew_main()
    else:
        main()
