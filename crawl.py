"""CLI entry point — the engine's `main.py` analog, submitted to a cluster as:

    python tools/package.py            # builds dist/engine.zip
    spark-submit --py-files dist/engine.zip crawl.py \\
        --seeds s3://bucket/seeds/*.json --pages warehouse.pages \\
        --root /warehouse/crawl1 --max-rounds 100 --min-priority 1000

Mirrors the reference CLI (``src/cli.py:39-112``: input files, star threshold,
output path, worker knobs) with Spark-native equivalents. In local mode it
runs against the deterministic synthetic corpus for demos:

    python crawl.py --demo --pages-n 5000
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark URL-frontier crawl")
    ap.add_argument("--seeds", nargs="*", help="seed JSON file(s)/glob(s) (reference format)")
    ap.add_argument("--pages", help="parquet path of the pages corpus (fetch simulation)")
    ap.add_argument("--robots", help="parquet path of robots rules (optional)")
    ap.add_argument("--root", default="/tmp/crawl_root", help="snapshot-table warehouse dir")
    ap.add_argument("--min-priority", type=float, default=None,
                    help="seed priority threshold (reference: star threshold)")
    ap.add_argument("--max-rounds", type=int, default=50)
    ap.add_argument("--compact-every", type=int, default=8,
                    help="fold frontier/host deltas every N active rounds (0 = only at end)")
    ap.add_argument("--no-broadcast-dims", action="store_true",
                    help="don't force-broadcast host/robots dims (10^7+ domains; AQE decides)")
    ap.add_argument("--resume", action="store_true", help="resume from last completed round")
    ap.add_argument("--export-jsonl", help="export results to this JSONL dir at the end")
    ap.add_argument("--cores", type=int, default=None, help="local[N] (default local[*])")
    ap.add_argument("--demo", action="store_true", help="run on a generated synthetic corpus")
    ap.add_argument("--pages-n", type=int, default=5000, help="demo corpus size")
    args = ap.parse_args(argv)

    from gh_crawler_spark.crawler import Crawler, CrawlConfig
    from gh_crawler_spark.session import get_spark

    spark = get_spark("crawl", cores=args.cores)

    if args.demo:
        from gh_crawler_spark.sources.pages import (
            generate_pages,
            generate_robots,
            generate_seeds,
        )

        pages = generate_pages(spark, args.pages_n, seed=42)
        robots = generate_robots(spark, seed=42)
        seeds = None if args.resume else generate_seeds(spark, args.pages_n, 50, seed=42)
    else:
        if not args.pages:
            ap.error("--pages is required (or use --demo)")
        pages = spark.read.parquet(args.pages)
        robots = spark.read.parquet(args.robots) if args.robots else None
        seeds = None
        if not args.resume:
            if not args.seeds:
                ap.error("--seeds is required unless --resume")
            from gh_crawler_spark.sources.seeds import load_seeds_json

            seeds = load_seeds_json(spark, args.seeds, min_priority=args.min_priority)

    cfg = CrawlConfig(root=args.root, max_rounds=args.max_rounds,
                      compact_every_rounds=args.compact_every,
                      broadcast_dims=not args.no_broadcast_dims)
    crawler = Crawler(spark, cfg, pages, robots)
    stats = crawler.run(seeds=seeds, log=lambda s: print(json.dumps(s), file=sys.stderr))

    if args.export_jsonl:
        from gh_crawler_spark.sources.jsonl import export_results_jsonl

        export_results_jsonl(crawler.t["results"].read(spark), args.export_jsonl)

    total_fetched = sum(s["fetched"] for s in stats)
    print(json.dumps({"rounds": len(stats), "fetched": total_fetched}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
