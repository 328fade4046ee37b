"""Production fetch stage: grouped-map HTTP fetching with in-group pacing.

In this sandbox fetches are simulated by joining the scheduled batch against
the synthetic pages corpus (crawler.py step 4). On a real crawl the same
scheduled batch flows through THIS operator instead: a salted repartition by
registrable domain puts each host's URLs (or a salt-slice of a hot host's)
into one group, and an ``applyInPandas`` grouped-map executes the HTTP GETs
with reference-equivalent behavior:

  * per-host pacing: sleep so consecutive requests are >= crawl_delay apart —
    the reference's ``HTTPClient._rate_limit`` (``src/http_client.py:141-152``,
    0.1 s default ``src/config.py:81``); executed inside the group, so an
    executor core stalls only on ITS host, never globally
  * retry classification: timeout/connection errors are retryable, 4xx is
    dead — ``_is_retryable_error`` (``src/http_client.py:154-169``); retries
    are NOT slept here — failed rows re-enter the frontier with a backoff
    ``next_fetch_ts`` (T2), keeping executors busy
  * session reuse per group — the reference's per-worker session
    (``src/http_client.py:52-55``)

``fetch_fn`` is injectable (tests use a deterministic fake; production passes
an urllib/requests closure), so the operator's dataflow — grouping, pacing,
ordering, schema — is tested without network access.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("retryable", T.BooleanType()),
        T.StructField("fetch_ms", T.LongType()),
    ]
)

# reference retry taxonomy (src/http_client.py:154-169): these HTTP statuses
# are retryable; all other 4xx/5xx are terminal
RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})


def default_fetch_fn(url: str, timeout_s: float = 30.0) -> tuple[int, bytes]:
    """urllib-based GET (reference: requests session, 30 s timeout
    ``src/config.py:54``). Only used outside the sandbox."""
    from urllib.error import HTTPError, URLError
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "gh-crawler-spark/0.1"})
    try:
        with urlopen(req, timeout=timeout_s) as resp:
            return int(resp.status), resp.read()
    except HTTPError as e:  # noqa: PERF203
        return int(e.code), b""
    except URLError:
        return 0, b""  # connection-level failure -> retryable


def fetch_group(
    pdf: pd.DataFrame,
    fn: Callable[[str], tuple[int, bytes]],
    delay_ms_col: str = "crawl_delay_ms",
    sleep_fn: Callable[[float], None] = time.sleep,
) -> pd.DataFrame:
    """One politeness group: fetch in fetch_rank order, pacing between
    requests (module-level so the pacing/ordering contract is unit-testable
    without Spark executors)."""
    pdf = pdf.sort_values("fetch_rank", kind="mergesort")
    delay_s = float(pdf[delay_ms_col].iloc[0]) / 1000.0
    out = []
    last = 0.0
    for row in pdf.itertuples(index=False):
        wait = delay_s - (time.monotonic() - last)
        if last and wait > 0:
            sleep_fn(wait)
        last = time.monotonic()
        t0 = time.monotonic()
        try:
            status, body = fn(row.url)
        except Exception:
            status, body = 0, b""
        out.append(
            (
                row.url,
                row.url_hash,
                status,
                body if 200 <= status < 300 else None,
                status in RETRYABLE_STATUSES or status == 0,
                int((time.monotonic() - t0) * 1000),
            )
        )
    return pd.DataFrame(out, columns=[f.name for f in FETCH_RESULT_SCHEMA.fields])


def fetch_batch(
    scheduled: DataFrame,
    fetch_fn: Callable[[str], tuple[int, bytes]] | None = None,
    delay_ms_col: str = "crawl_delay_ms",
    n_salts: int = 4,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Fetch a scheduled batch, politeness-paced per registrable domain.

    ``scheduled`` must carry url, url_hash, registrable_domain, fetch_rank and
    a per-row crawl delay. Groups = (domain, salt): a hot domain's queue is
    split across ``n_salts`` groups, each of which paces itself — aggregate
    politeness is enforced upstream by the token-bucket budget (the budget,
    not the pacing, bounds requests/round; pacing only smooths them).
    """
    fn = fetch_fn or default_fetch_fn

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return fetch_group(pdf, fn, delay_ms_col, sleep_fn)

    salt = F.pmod(F.col("url_hash"), F.lit(n_salts))
    return (
        scheduled.repartition(F.col("registrable_domain"), salt)
        .groupBy(F.col("registrable_domain"), salt.alias("__salt"))
        .applyInPandas(run, schema=FETCH_RESULT_SCHEMA)
    )
