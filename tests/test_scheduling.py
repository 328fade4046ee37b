"""W1/W2/T8: salted rank == naive global rank; deterministic; budget respected."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from gh_crawler_spark.operators.scheduling import rank_fetch_batch, schedule_order


def _frontier(spark, n=2000):
    """Skewed eligible set: one hot domain owns half the rows (T8)."""
    return (
        spark.range(0, n)
        .select(
            F.when(F.col("id") % 2 == 0, "hot.com")
            .otherwise(F.concat(F.lit("site-"), (F.col("id") % 37).cast("string"), F.lit(".org")))
            .alias("registrable_domain"),
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            (F.pmod(F.xxhash64((F.col("id") + 7).cast("string")), F.lit(100)).cast("double") / 10).alias("priority"),
            F.lit(dt.datetime(2024, 6, 1)).alias("next_fetch_ts"),
            F.lit(25).alias("host_budget"),
        )
    )


def test_matches_naive_global_rank(spark):
    elig = _frontier(spark)
    got = rank_fetch_batch(elig, n_salts=8)
    w = Window.partitionBy("registrable_domain").orderBy(*schedule_order())
    naive = (
        elig.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= F.col("host_budget"))
    )
    g = {(r["registrable_domain"], r["fetch_rank"]): r["url_hash"] for r in got.collect()}
    n = {(r["registrable_domain"], r["fetch_rank"]): r["url_hash"] for r in naive.collect()}
    assert g == n


def test_budget_respected_and_deterministic(spark):
    elig = _frontier(spark)
    a = rank_fetch_batch(elig, n_salts=4)
    per_host = a.groupBy("registrable_domain").count().collect()
    for r in per_host:
        assert r["count"] <= 25
    b = rank_fetch_batch(elig.repartition(17), n_salts=4)
    assert sorted(r["url_hash"] for r in a.collect()) == sorted(
        r["url_hash"] for r in b.collect()
    )


def test_per_host_budget_override(spark):
    """W2: budgets are per-row values — a host with budget 3 keeps 3."""
    elig = _frontier(spark, 400).withColumn(
        "host_budget",
        F.when(F.col("registrable_domain") == "hot.com", 3).otherwise(F.col("host_budget")),
    )
    got = rank_fetch_batch(elig, n_salts=8)
    counts = {r["registrable_domain"]: r["count"] for r in got.groupBy("registrable_domain").count().collect()}
    assert counts["hot.com"] == 3
