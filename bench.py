"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and a full crawl over a
deterministic synthetic corpus, then prints ONE JSON line:

  {"metric": "urls_fetched_deduped_per_sec", "value": <crawl throughput>,
   "unit": "urls/sec", "queries": {name: sec, ...}, "sf": ...,
   "crawl": {...}, "cpus": N}

The headline metric matches BASELINE.json: URLs fetched+deduped per second
through the full frontier pipeline (canonicalize, hash, Bloom+anti-join dedup,
politeness, window-ranked scheduling, extraction, snapshot commits).
Scaling-efficiency evidence is produced by tools/bench_scaling_min.py — the
min-of-legs protocol at 2→8 cores (the honest multi-node proxy on this box;
8→32 hits the single-box memory-bandwidth wall, see BENCH.md) — and recorded
in BENCH.md.

PROTOCOL (the ``protocol`` field in the JSON): ``r5-serialcut-80g`` as of
round 5 — r4's steady-state warmup + 80 g driver heap, on the engine with
8×-parallelism fetch/parse wave-packing (crawler._pages_parts) PLUS the
round-5 serial-floor cuts (race-free ordered stats actions, lineage-truncated
round materializations). Headline numbers under different protocol tags are
NOT engine-apples-to-apples (the r3→r4 delta is protocol+engine, see
BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HEADLINE = [
    "a1_pricing_summary",
    "j1_seen_anti_join",
    "j4_hash_equi_join",
    "w1_topk_per_key",
    "w4_chronological_concat",
    "u1_union_dedup",
    "x5_canonicalize",
    "frontier_pipeline",
    "td_text_analysis",
    "td_dedup_exact",
    "td_ngram_jaccard",
    "td_ngram_jaccard_pruned",
    "td_minhash_lsh",
    "td_simhash",
    "td_ann_cosine",
    "td_media_meta",
    "x10b_embedded_timeline",
]

CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "60000"))
# "all" = batch-refresh shape: every corpus URL seeded, co-partitioned fetch
CRAWL_SEEDS_RAW = os.environ.get("SPARK_GRAFT_CRAWL_SEEDS", "300")
CRAWL_SEEDS = 0 if CRAWL_SEEDS_RAW == "all" else int(CRAWL_SEEDS_RAW)
# realistic Common-Crawl-ish page bodies (~8-20 KB html) unless overridden
CRAWL_PARAS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_CRAWL_PARAS", "150-350").split("-")
)


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from gh_crawler_spark.queries import QUERIES

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.monotonic()
        materialize(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
        log(f"  {name}: {out[name]}s")
    return out


def run_crawl(spark, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from gh_crawler_spark.crawler import Crawler, CrawlConfig
    from gh_crawler_spark.sources.pages import generate_pages, generate_robots, generate_seeds

    n_domains = 2000
    # no oracle text (never read here) and no separate pages cache — the
    # crawler's persisted fetch index is the only materialized copy.
    # SPARK_GRAFT_CRAWL_CORPUS_DIR short-circuits datagen with a
    # pre-generated parquet copy of the IDENTICAL corpus — datagen is
    # outside the timed window either way (pages_idx is materialized before
    # t0), this only cuts the untimed per-leg turnaround for scaling runs.
    corpus_dir = os.environ.get("SPARK_GRAFT_CRAWL_CORPUS_DIR")
    if corpus_dir:
        pages = spark.read.parquet(corpus_dir)
    else:
        pages = generate_pages(spark, CRAWL_PAGES, seed=42, n_domains=n_domains,
                               n_partitions=max(16, cpus * 2), paras=CRAWL_PARAS,
                               with_oracle_text=False)
    if CRAWL_SEEDS_RAW == "all":
        # batch-refresh crawl: the full URL list is the seed set (the
        # reference's resume-over-a-known-repo-list shape); the fetch join
        # co-partitions instead of broadcasting a corpus-sized batch
        seeds = pages.select("url", F.lit(50.0).alias("priority"))
    else:
        seeds = generate_seeds(spark, CRAWL_PAGES, CRAWL_SEEDS, seed=42, n_domains=n_domains)
    robots = generate_robots(spark, seed=42, n_domains=n_domains)
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    cfg = CrawlConfig(
        root=root,
        broadcast_fetch=(CRAWL_SEEDS_RAW != "all"),
        n_buckets=64,
        max_rounds=30,
        transient_fail_mod=0,
        n_salts=max(16, cpus),
        token_capacity_s=100_000.0,  # politeness budgets sized so throughput,
        round_duration_s=600.0,      # not the virtual clock, is the limiter
        bloom_min_keys=10_000,
        empty_rounds_stop=1,         # bench corpus has no retries pending
        # A/B knob for the round-5 lineage-truncation path (default on)
        truncate_lineage=os.environ.get("SPARK_GRAFT_TRUNCATE", "1") != "0",
    )
    c = Crawler(spark, cfg, pages, robots)
    # Steady-state warmup (untimed, documented in BENCH.md): the session's
    # first jobs pay one-time costs — python-UDF worker spin-up, Janino/JIT
    # compilation, parquet writer init — that a production crawl amortizes
    # over hours but a 5-round sandbox crawl books as ~7 s of parallelism-
    # independent wall. A tiny representative crawl (every plan shape, every
    # UDF, every commit path) runs them before t0; the measured window then
    # starts from the steady state the metric describes.
    warm_root = tempfile.mkdtemp(prefix="bench_warm_")
    wc = Crawler(
        spark,
        CrawlConfig(root=warm_root, n_buckets=8, max_rounds=2,
                    bloom_min_keys=100, empty_rounds_stop=1, n_salts=4),
        generate_pages(spark, 200, seed=7, n_domains=20, n_partitions=4,
                       paras=(5, 10), with_oracle_text=False),
        generate_robots(spark, seed=7, n_domains=20),
    )
    wc.run(seeds=generate_seeds(spark, 200, 50, seed=7, n_domains=20))
    wc.pages_idx.unpersist()
    shutil.rmtree(warm_root, ignore_errors=True)
    # materialize the fetch index before timing: it simulates the network,
    # which a real crawl doesn't pay as a Spark stage
    n_pages = c.pages_idx.count()
    t0 = time.monotonic()
    stats = c.run(seeds=seeds, log=lambda s: log("  crawl", s))
    wall = time.monotonic() - t0
    fetched = sum(s["fetched"] for s in stats)
    deduped = sum(s["links"] - s["new"] for s in stats)
    shutil.rmtree(root, ignore_errors=True)
    c.pages_idx.unpersist()
    return {
        "pages": n_pages,
        "rounds": len(stats),
        "fetched": fetched,
        "deduped": deduped,
        "wall_s": round(wall, 2),
        "urls_per_sec": round((fetched + deduped) / wall, 1),
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gh_crawler_spark.session import get_spark

    # The unified memory pool must hold the simulated-corpus cache (~19 GB
    # at the heavy 120k corpus) PLUS a round's working set (persisted
    # extracted text + shuffles). At 48g, round-0 GC/eviction pressure cost
    # 30-70 s at local[8] (profiled 2026-08-17: r0 sched_fetch_probe 117-163 s
    # at 48g vs 83.6 s at 80g, same input); on a real cluster this is the
    # executor-memory sizing the job ships with. The box has 128 GiB.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    log(f"bench: sf_dir={sf_dir} cpus={cpus}")

    # warm-up (JVM/codegen/Arrow paths)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    crawl_only = os.environ.get("SPARK_GRAFT_BENCH_MODE", "") == "crawl"
    queries = {} if crawl_only else run_queries(spark, sf_dir)
    crawl = run_crawl(spark, cpus)

    print(
        json.dumps(
            {
                "metric": "urls_fetched_deduped_per_sec",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                # measurement-protocol tag (see module docstring): headline
                # values only compare engine-apples-to-apples within one tag
                "protocol": "r5-serialcut-80g",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl,
                "cpus": cpus,
                "query_total_sec": round(sum(queries.values()), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
