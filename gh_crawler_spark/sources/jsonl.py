"""JSONL result sink / seen-recovery scan (SURVEY.md S7-S9).

The reference persists results as JSONL (``save_crawled_repositories``
``src/io_handler.py:58-100``, immediate append ``:136-169``) and rebuilds its
seen-set by re-reading its own output files (``get_existing_repository_urls``
``src/io_handler.py:172-206``; "output files are the primary source of truth"
``src/checkpoint_manager.py:224-225``). The engine's source of truth is the
snapshot tables; JSONL is an interchange format:

  * export: one-line-per-record JSON, gzip-able, partitioned by round —
    the per-row flush disappears because a snapshot commit is atomic (S11)
  * seen recovery (S9): scan any results JSONL back into ``(url_hash)`` rows
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gh_crawler_spark.functions.urls import canonicalize_url_expr, url_hash_expr

RESULTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("status", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("round", T.IntegerType()),
    ]
)


def export_results_jsonl(results: DataFrame, path: str, compress: bool = True) -> None:
    """Results table -> JSONL directory (ISO-8601 timestamps at the JSON
    boundary, matching the reference's serialization; SURVEY.md §1.2)."""
    writer = results.withColumn(
        "warc_ts", F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    ).write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def recover_seen_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S9: rebuild the seen set from exported output (url_hash rows)."""
    rows = spark.read.schema(RESULTS_JSONL_SCHEMA).json(path)
    return rows.select(
        F.coalesce(
            F.col("url_hash"), url_hash_expr(canonicalize_url_expr(F.col("url")))
        ).alias("url_hash")
    ).distinct()
