"""Production fetch operator: grouping, pacing, ordering, retry taxonomy
(network-free via injectable fetch_fn / sleep_fn)."""

from pyspark.sql import functions as F

from gh_crawler_spark.operators.fetch import (
    RETRYABLE_STATUSES,
    fetch_batch,
    fetch_group,
)


def _scheduled(spark):
    rows = [
        (f"https://{d}/p{i}", hash((d, i)) % (2**31), d, i + 1, 100)
        for d in ("a.com", "b.com")
        for i in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "url STRING, url_hash BIGINT, registrable_domain STRING, "
        "fetch_rank INT, crawl_delay_ms BIGINT",
    )


def test_fetch_results_and_classification(spark):
    def fake(url):
        if url.endswith("p0"):
            return 429, b""        # retryable rate limit
        if url.endswith("p1"):
            return 404, b""        # terminal
        return 200, b"<html>ok</html>"

    out = fetch_batch(
        _scheduled(spark), fetch_fn=fake, n_salts=1, sleep_fn=lambda s: None
    ).collect()
    by_url = {r["url"]: r for r in out}
    assert len(out) == 10
    for url, r in by_url.items():
        if url.endswith("p0"):
            assert r["retryable"] and r["status"] == 429 and r["html"] is None
        elif url.endswith("p1"):
            assert not r["retryable"] and r["status"] == 404
        else:
            assert r["status"] == 200 and bytes(r["html"]) == b"<html>ok</html>"


def test_fetch_group_paced_in_rank_order():
    import pandas as pd

    calls: list[str] = []
    sleeps: list[float] = []

    def fake(url):
        calls.append(url)
        return 200, b"x"

    pdf = pd.DataFrame(
        {
            "url": [f"https://a.com/p{i}" for i in (3, 0, 4, 1, 2)],
            "url_hash": [3, 0, 4, 1, 2],
            "fetch_rank": [4, 1, 5, 2, 3],
            "crawl_delay_ms": [100] * 5,
        }
    )
    fetch_group(pdf, fake, sleep_fn=sleeps.append)
    # fetched in fetch_rank order regardless of input order
    assert calls == [f"https://a.com/p{i}" for i in range(5)]
    # paced: a sleep between consecutive requests (first one exempt)
    assert len(sleeps) == 4 and all(0 < s <= 0.1 for s in sleeps)


def test_retryable_statuses_match_reference_taxonomy():
    assert {408, 429, 500, 502, 503, 504} == set(RETRYABLE_STATUSES)
