"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship frontier pipeline (canonicalize -> hash-dedup -> per-domain
window-ranked schedule) on sf0.001. ``queries``/``oracle_sql``: the operator
coverage registry from ``gh_crawler_spark.queries`` (SURVEY.md §2 inventory +
training-data pipeline ops), DuckDB-oracled where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gh_crawler_spark.queries import q_frontier_pipeline

    return q_frontier_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    pipeline ops). Each callable takes (spark, sf_dir) -> DataFrame."""
    from gh_crawler_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query (omitted for
    hash-sketch ops: x16_url_hash, td_minhash_lsh, td_simhash, td_lsh_ann,
    td_ivf_ann — driver records rows-only; each is pytest-asserted)."""
    from gh_crawler_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
