"""Structured Streaming layer (SURVEY.md §2.9/§7 — optional wrapper).

The engine is round-based (the reference is too: discovery pages -> scrape
batches), and per-round snapshot commits give exact resume. Structured
Streaming slots in where pages arrive continuously (e.g. a WARC drop
directory): rounds map to micro-batches via ``foreachBatch``, and politeness /
frontier state stays in the snapshot tables, NOT in Spark's state store —
exactly the recommended pattern for stateful logic that must outlive the
query (T1-T5 state lives in host_state/frontier).

Three composable pieces:
  * :func:`stream_extract` — streaming canonicalize + hash + byte-identical
    extraction over incoming pages
  * :func:`dedup_stream` — watermarked streaming dedup on url_hash (T7 late/
    dup arrivals; state TTL'd by the watermark so it cannot grow unbounded)
  * :func:`throughput_metrics_stream` — tumbling-window fetch/sec metrics
    with late-data handling (A7 analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gh_crawler_spark.functions.text import extract_page_udf
from gh_crawler_spark.functions.urls import (
    canonicalize_url_expr,
    host_expr,
    registrable_domain_expr,
    url_hash_expr,
)


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Streaming projection: canonical url/hash/domain + extracted text+links.

    Works on any streaming DataFrame with (url, warc_ts, html) — e.g.
    ``spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)``.
    """
    canon = canonicalize_url_expr(F.col("url"))
    return (
        pages_stream.withColumn("canonical_url", canon)
        .withColumn("url_hash", url_hash_expr(F.col("canonical_url")))
        .withColumn("registrable_domain", registrable_domain_expr(host_expr(F.col("canonical_url"))))
        .withColumn("page", extract_page_udf(F.col("html"), F.col("canonical_url")))
        .select(
            "canonical_url", "url_hash", "registrable_domain", "warc_ts",
            F.col("page.text").alias("text"),
            F.col("page.outlinks").alias("outlinks"),
        )
    )


def dedup_stream(extracted: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming URL dedup: first arrival wins inside the watermark horizon.

    ``dropDuplicates`` over a watermarked column bounds the dedup state —
    late duplicates beyond the horizon fall through to the batch-side
    anti-join against the seen table (exactly the Bloom/anti-join backstop
    relationship: streaming state handles the hot window, the table handles
    forever).
    """
    return extracted.withWatermark("warc_ts", watermark).dropDuplicates(
        ["url_hash", "warc_ts"]
    )


def throughput_metrics_stream(
    extracted: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Tumbling-window URLs/sec per domain (perf-monitor analog, A7)."""
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("registrable_domain"))
        .agg(F.count("*").alias("n_urls"))
        .select(
            F.col("w.start").alias("window_start"),
            "registrable_domain",
            "n_urls",
        )
    )


def run_foreach_batch_crawl(spark, pages_stream: DataFrame, crawler, checkpoint_dir: str):
    """Micro-batch wrapper: each arriving batch of pages is appended to the
    crawler's corpus view and a crawl round executes per micro-batch (rounds
    == micro-batches; engine tables are the state store)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # new pages become frontier seeds for the next round
        seeds = batch_df.select(
            F.col("url"), F.lit(crawler.cfg.default_priority).alias("priority")
        )
        if crawler.t["rounds"].read(spark).count() == 0:
            crawler.init_frontier(seeds)
        crawler.run_round(int(batch_id))

    return (
        pages_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
