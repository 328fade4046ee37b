"""T1/T2/T4 + robots: politeness primitives."""

import datetime as dt

from pyspark.sql import functions as F

from gh_crawler_spark.operators.politeness import (
    BACKOFF_BASE_S,
    BACKOFF_CAP_S,
    CIRCUIT_BLOCK_S,
    CIRCUIT_FAILURES,
    apply_circuit_breaker,
    backoff_next_fetch_ts,
    refill_tokens,
    robots_allowed_udf,
)

NOW = dt.datetime(2024, 6, 1)

ROBOTS = "User-agent: *\nDisallow: /private\nDisallow: /tmp/\n"


def test_robots_udf(spark):
    rows = [
        (ROBOTS, "https://x.com/public/page", True),
        (ROBOTS, "https://x.com/private/page", False),
        (ROBOTS, "https://x.com/private", False),
        (ROBOTS, "https://x.com/tmp/x", False),
        (ROBOTS, "https://x.com/", True),
        ("", "https://x.com/private", True),          # no rules -> allowed
        (None, "https://x.com/anything", True),
        ("User-agent: *\nDisallow: /\n", "https://x.com/a", False),
    ]
    df = spark.createDataFrame([(r, u) for r, u, _ in rows], "rules STRING, url STRING")
    got = df.select(robots_allowed_udf("rules", "url").alias("ok")).collect()
    assert [r["ok"] for r in got] == [want for _, _, want in rows]


def test_backoff_schedule(spark):
    """T2: min(60, 2·2^attempt) seconds — reference tenacity policy."""
    df = spark.createDataFrame([(a,) for a in range(8)], "attempt INT")
    got = df.select(
        "attempt",
        backoff_next_fetch_ts(F.lit(NOW), F.col("attempt")).alias("nft"),
    ).collect()
    for r in got:
        want = min(BACKOFF_CAP_S, BACKOFF_BASE_S * 2 ** r["attempt"])
        assert (r["nft"] - NOW).total_seconds() == int(want)


def test_refill_caps_at_capacity(spark):
    df = spark.createDataFrame([(5.0, 2.0, 30.0, 20.0)], "t DOUBLE, r DOUBLE, e DOUBLE, c DOUBLE")
    got = df.select(refill_tokens(F.col("t"), F.col("r"), F.col("e"), F.col("c")).alias("x")).collect()
    assert got[0]["x"] == 20.0  # 5 + 60 capped at 20


def _hs(spark, failure_count, fails, oks):
    return spark.createDataFrame(
        [("d.com", failure_count, None, fails, oks)],
        "registrable_domain STRING, failure_count INT, blocked_until TIMESTAMP, "
        "round_failures INT, round_successes INT",
    )


def test_circuit_breaker_trips_at_threshold(spark):
    out = apply_circuit_breaker(_hs(spark, CIRCUIT_FAILURES - 2, 2, 0), F.lit(NOW)).collect()[0]
    # trip-and-reset: the block is armed, the count restarts from zero
    assert out["failure_count"] == 0
    assert (out["blocked_until"] - NOW).total_seconds() == CIRCUIT_BLOCK_S


def test_circuit_breaker_recovers_after_block(spark):
    """A tripped host must NOT be re-stamped while idle (ADVICE r1): folding
    zero failures/successes on a blocked host leaves blocked_until alone, so
    the block lapses and the host becomes eligible again."""
    blocked = spark.createDataFrame(
        [("d.com", 0, NOW + dt.timedelta(seconds=CIRCUIT_BLOCK_S), 0, 0)],
        "registrable_domain STRING, failure_count INT, blocked_until TIMESTAMP, "
        "round_failures INT, round_successes INT",
    )
    later = NOW + dt.timedelta(seconds=60)
    out = apply_circuit_breaker(blocked, F.lit(later)).collect()[0]
    assert out["failure_count"] == 0
    assert out["blocked_until"] == NOW + dt.timedelta(seconds=CIRCUIT_BLOCK_S)  # unchanged


def test_circuit_breaker_success_resets(spark):
    out = apply_circuit_breaker(_hs(spark, 9, 3, 1), F.lit(NOW)).collect()[0]
    assert out["failure_count"] == 0
    assert out["blocked_until"] is None


def test_circuit_breaker_below_threshold(spark):
    out = apply_circuit_breaker(_hs(spark, 0, 4, 0), F.lit(NOW)).collect()[0]
    assert out["failure_count"] == 4
    assert out["blocked_until"] is None


def test_lazy_refill_equals_iterated_refill():
    """The host_state delta design's load-bearing identity: one capped
    refill over the total elapsed time equals per-round iterated capped
    refills — min(cap, t + r·Δ) composed k times = min(cap, t + k·r·Δ).
    (Once t + i·r·Δ reaches cap the iterate pins at cap, and the single-shot
    form is ≥ cap from then on too.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(0.0, 50.0),     # starting tokens
        st.floats(0.001, 5.0),    # refill rate /s
        st.floats(0.1, 120.0),    # round duration
        st.integers(1, 40),       # rounds elapsed
        st.floats(1.0, 60.0),     # capacity
    )
    def check(tokens, rate, dur, k, cap):
        tokens = min(tokens, cap)  # invariant: stored tokens never exceed cap
        iterated = tokens
        for _ in range(k):
            iterated = min(cap, iterated + rate * dur)
        single = min(cap, tokens + rate * k * dur)
        assert abs(iterated - single) < 1e-6 * max(1.0, cap)

    check()


# ---------------------------------------------------------------- F3 config
# regex common-subset validation (escape-/class-aware since round 5: the raw
# substring scan falsely rejected escaped constructs — round-4 ADVICE)

def test_regex_subset_scan_accepts_common_subset():
    import pytest

    from gh_crawler_spark.crawler import CrawlConfig

    for ok in (r"a\++", r"a&&b", r"a*?", r"a+?", r"a??", r"[+*]+", r"a\*+",
               r"[&]&", r"/pull/(\d+)"):
        CrawlConfig(root="/tmp/x", link_shape=ok)  # must not raise


def test_regex_subset_scan_rejects_java_only():
    import pytest

    from gh_crawler_spark.crawler import CrawlConfig

    for bad in (r"a++", r"a*+", r"a?+", r"a{2,3}+", r"[a&&b]", r"a\h", r"a\v"):
        with pytest.raises(ValueError):
            CrawlConfig(root="/tmp/x", link_shape=bad)
