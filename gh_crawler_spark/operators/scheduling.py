"""Fetch-batch scheduling: window-ranked (priority, next_fetch_ts) per host.

Reference semantics (SURVEY.md W1/W2/L1): the crawler walks newest-first list
pages and stops at a per-repo limit — i.e. top-K per key by recency with
per-key budget overrides (``src/crawler.py:137-166``,
``src/aggressive_pr_scraper.py:144-151,325-328``). The engine re-expresses the
priority queue declaratively:

    row_number() OVER (PARTITION BY registrable_domain
                       ORDER BY priority DESC, next_fetch_ts ASC, url_hash ASC)
        <= per_host_budget

The ``url_hash ASC`` tie-break makes the schedule **fully deterministic at any
parallelism level** (SURVEY.md §7 "deterministic crawl ordering") — never a
bare ``limit()``.

Skew (SURVEY.md T8): one hot domain can own ~50% of the frontier; a single
window partition would serialize it onto one task. The rank runs in two
phases: (1) rank within (domain, salt) where ``salt = pmod(url_hash,
n_salts)`` — parallel across salts, each salt keeps ``ceil(budget)`` rows at
most — then (2) a final exact rank over the ≤ ``n_salts × budget`` survivors
per domain. Phase-2 input is budget-bounded per domain, so the heavy lifting
parallelizes while global top-K semantics (and determinism) are preserved
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def schedule_order() -> list:
    """Deterministic total order for fetch scheduling (W1 + tie-break)."""
    return [F.col("priority").desc(), F.col("next_fetch_ts").asc(), F.col("url_hash").asc()]


def rank_fetch_batch(
    eligible: DataFrame,
    budget_col: str = "host_budget",
    domain_col: str = "registrable_domain",
    n_salts: int = 16,
) -> DataFrame:
    """Select each host's top-``budget`` eligible URLs, skew-safely.

    ``eligible`` must carry ``priority, next_fetch_ts, url_hash`` and a
    per-row ``budget_col`` (already joined from host_state; per-key budget
    overrides are just values in that column — W2). Returns the selected rows
    with a deterministic ``fetch_rank`` (1-based) per domain.
    """
    salt = F.pmod(F.col("url_hash"), F.lit(n_salts))
    w_salt = Window.partitionBy(F.col(domain_col), salt).orderBy(*schedule_order())
    # Phase 1: per-salt pre-rank. Keeping `budget` rows per salt guarantees
    # the true global top-`budget` all survive (each is top-budget within its
    # own salt a fortiori).
    pre = (
        eligible.withColumn("__salt_rank", F.row_number().over(w_salt))
        .filter(F.col("__salt_rank") <= F.col(budget_col))
        .drop("__salt_rank")
    )
    # Phase 2: exact rank over ≤ n_salts × budget rows per domain.
    w_dom = Window.partitionBy(domain_col).orderBy(*schedule_order())
    return (
        pre.withColumn("fetch_rank", F.row_number().over(w_dom))
        .filter(F.col("fetch_rank") <= F.col(budget_col))
    )
