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
    """DuckDB-runnable oracle for each query. Since round 5 every entry in
    the driver's 50-entry recording window has one — the hash-sketch ops
    (x16/minhash/simhash/lsh-ann) are oracled via XXH64 re-implemented as
    pure DuckDB SQL macros (gh_crawler_spark/functions/duck_xxh64.py), and
    td_ivf_ann runs at nprobe=n_cells where IVF provably equals brute-force
    cosine. The only remaining rows-only entry is the past-cap
    td_ivf_ann_probe (nprobe<n_cells pruning path; pytest-gated)."""
    from gh_crawler_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
