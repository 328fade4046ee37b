"""Politeness: robots evaluation, token buckets, backoff, circuit breaker.

Maps the reference's imperative politeness machinery onto columns + one
vectorized UDF (SURVEY.md §2.9):

  * T1 rate limit (0.1 s/req/client, ``src/http_client.py:141-152``) →
    per-host **token bucket** columns in the ``host_state`` table; the number
    of tokens available this round IS the host's fetch budget for the W1 rank.
  * T2 retry/backoff (tenacity exp ×2 max 60 s, ``src/http_client.py:171-177``)
    → failed rows get ``next_fetch_ts = now + min(cap, base·2^attempt)`` and
    re-enter the frontier; no executor ever sleeps.
  * T4 circuit breaker (10 consecutive failures → 300 s block,
    ``src/failed_issue_cache.py:29-30,138-168``) → ``blocked_until`` column;
    eligibility is a plain filter (F7).
  * robots.txt (new per north_rule; not in the reference) → stdlib
    ``urllib.robotparser`` semantics evaluated in an Arrow-batched pandas UDF
    with a per-batch parser cache keyed by the rules text (hosts repeat
    within a batch, so each robots body is parsed once per batch, not per
    row).

All of this is driven by the engine's **virtual clock** (round number →
timestamp), which makes politeness deterministic and independent of
wall-clock/parallelism — required for the crawl-ordering equivalence test
(SURVEY.md §5.3).
"""

from __future__ import annotations

from urllib import robotparser
from urllib.parse import quote, urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference constants (src/failed_issue_cache.py:29-30; src/http_client.py:171-177)
CIRCUIT_FAILURES = 10
CIRCUIT_BLOCK_S = 300
BACKOFF_BASE_S = 2.0
BACKOFF_CAP_S = 60.0


def _allowed_batch(rules: pd.Series, urls: pd.Series) -> pd.Series:
    parsers: dict[str, robotparser.RobotFileParser] = {}
    out = []
    for rule, url in zip(rules, urls):
        if rule is None or not str(rule).strip():
            out.append(True)
            continue
        rp = parsers.get(rule)
        if rp is None:
            rp = robotparser.RobotFileParser()
            rp.parse(str(rule).splitlines())
            parsers[rule] = rp
        try:
            out.append(bool(rp.can_fetch("*", quote(urlsplit(url).path) or "/")))
        except Exception:
            out.append(True)
    return pd.Series(out)


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(rules: pd.Series, urls: pd.Series) -> pd.Series:
    """robots.txt allow/deny, vectorized; parser cached per distinct rules."""
    return _allowed_batch(rules, urls)


def refill_tokens(
    tokens: Column, refill_rate: Column, elapsed_s: Column, capacity: Column
) -> Column:
    """Token-bucket refill: ``min(capacity, tokens + rate·elapsed)``."""
    return F.least(capacity, tokens + refill_rate * elapsed_s)


def backoff_next_fetch_ts(now_ts: Column, attempt: Column) -> Column:
    """T2: exponential backoff schedule, ``min(60, 2·2^attempt)`` seconds —
    the reference's tenacity policy (multiplier 1→base 2, max 60)."""
    delay = F.least(F.lit(BACKOFF_CAP_S), F.lit(BACKOFF_BASE_S) * F.pow(F.lit(2.0), attempt))
    return F.timestamp_add("SECOND", delay.cast("long"), now_ts)


ADAPT_SHRINK_RATIO = 0.8   # reference: ≥80% of a batch rate-limited (src/aggressive_pr_scraper.py:433-440)
ADAPT_SHRINK_FACTOR = 0.5  # halve the budget (batch-shrink analog, :337)
ADAPT_RECOVER_FACTOR = 1.25
ADAPT_MIN_FRACTION = 1.0 / 64.0


def adapt_refill_rate(
    refill_rate: Column,
    base_rate: Column,
    attempted: Column,
    round_failures: Column,
    round_successes: Column,
) -> Column:
    """T3: adaptive per-host budget.

    The reference shrinks its discovery batch under 429s
    (``batch = max(1, 10 − consecutive_failures)``,
    ``src/aggressive_pr_scraper.py:337``) and doubles backoff when ≥80% of a
    batch is rate-limited (``:433-440``). The engine's analog adapts the
    token-bucket refill rate: halve when ≥80% of this round's attempts failed
    transiently (floor base/64), recover ×1.25 toward the base rate on clean
    rounds. Applied at round fold time -> effective next round.
    """
    ratio = F.when(attempted > 0, round_failures / attempted).otherwise(F.lit(0.0))
    return (
        F.when(
            ratio >= ADAPT_SHRINK_RATIO,
            F.greatest(refill_rate * ADAPT_SHRINK_FACTOR, base_rate * ADAPT_MIN_FRACTION),
        )
        .when(
            (round_successes > 0) & (round_failures == 0),
            F.least(base_rate, refill_rate * ADAPT_RECOVER_FACTOR),
        )
        .otherwise(refill_rate)
    )


def apply_circuit_breaker(
    host_state: DataFrame, now_ts: Column, failures_this_round_col: str = "round_failures",
    successes_this_round_col: str = "round_successes",
) -> DataFrame:
    """T4: fold this round's outcomes into the breaker state.

    Success resets the consecutive-failure count (reference
    ``src/failed_issue_cache.py:156-160``); CROSSING CIRCUIT_FAILURES sets
    ``blocked_until = now + 300 s`` and resets the count, so a tripped host
    recovers when the block lapses instead of being re-stamped every round
    while idle (ADVICE r1: a blocked host gets no successes and no new
    failures, so a count that stays >= threshold would re-arm forever).
    """
    fc = F.when(F.col(successes_this_round_col) > 0, F.lit(0)).otherwise(
        F.col("failure_count") + F.col(failures_this_round_col)
    )
    tripped = fc >= CIRCUIT_FAILURES
    return (
        host_state.withColumn(
            "blocked_until",
            F.when(
                tripped, F.timestamp_add("SECOND", F.lit(CIRCUIT_BLOCK_S), now_ts)
            ).otherwise(F.col("blocked_until")),
        )
        .withColumn("failure_count", F.when(tripped, F.lit(0)).otherwise(fc).cast("int"))
        .drop(failures_this_round_col, successes_this_round_col)
    )
