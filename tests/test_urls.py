"""X5: canonicalization — golden cases, Python/column parity, properties."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gh_crawler_spark.functions.urls import (
    canonicalize_url_expr,
    canonicalize_url_py,
    host_expr,
    registrable_domain_expr,
    registrable_domain_py,
)

GOLDEN = [
    # (raw, engine-canonical)
    ("https://Example.COM/Path", "https://example.com/Path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("//cdn.example.com/x", "https://cdn.example.com/x"),
    ("example.com/x", "https://example.com/x"),
    ("https://example.com/a?b=2&a=1#frag", "https://example.com/a?a=1&b=2"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("https://example.com/a?", "https://example.com/a"),
    ("https://example.com/a?x=://weird", "https://example.com/a?x=://weird"),
    ("HTTPS://EXAMPLE.COM:443/A/B/?z=1&y=2#f", "https://example.com/A/B?y=2&z=1"),
]

REF_GOLDEN = [
    # reference mode: drop query entirely (src/pr_scraper.py:386-396,560)
    ("https://github.com/o/r/pull/1?tab=files#diff", "https://github.com/o/r/pull/1"),
    ("https://github.com/o/r/", "https://github.com/o/r"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_golden_py(raw, want):
    assert canonicalize_url_py(raw) == want


@pytest.mark.parametrize("raw,want", REF_GOLDEN)
def test_golden_reference_mode(raw, want):
    assert canonicalize_url_py(raw, mode="reference") == want


def test_idempotent():
    for raw, want in GOLDEN:
        assert canonicalize_url_py(want) == want


def test_column_parity(spark):
    raws = [r for r, _ in GOLDEN] + [r for r, _ in REF_GOLDEN]
    df = spark.createDataFrame([(r,) for r in raws], "url STRING")
    got = df.select(
        "url",
        canonicalize_url_expr(F.col("url")).alias("eng"),
        canonicalize_url_expr(F.col("url"), mode="reference").alias("ref"),
    ).collect()
    for row in got:
        assert row["eng"] == canonicalize_url_py(row["url"]), row["url"]
        assert row["ref"] == canonicalize_url_py(row["url"], mode="reference"), row["url"]


@given(
    host=st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z][a-z0-9]{0,6}){1,3}", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True),
    params=st.lists(st.from_regex(r"[a-z]{1,3}=[A-Za-z0-9]{0,4}", fullmatch=True), max_size=4),
    frag=st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True),
    upper=st.booleans(),
    port=st.sampled_from(["", ":443", ":8443"]),
)
@settings(max_examples=200, deadline=None)
def test_property_idempotent_and_trap_invariant(host, path, params, frag, upper, port):
    q = "&".join(params)
    raw = f"https://{host.upper() if upper else host}{port}{path}" + (f"?{q}" if q else "") + frag
    c = canonicalize_url_py(raw)
    assert canonicalize_url_py(c) == c  # idempotent
    assert c.split("://")[1].split("/")[0].split(":")[0] == host  # host lowercased
    assert "#" not in c


HOST_GOLDEN = [
    # (canonical url, host) — incl. the share-link trap: '://' inside a query
    # param must NOT steal host attribution (ADVICE r1, urls.py host_expr)
    ("https://a.com/r?target=https://evil.com/x", "a.com"),
    ("https://a.com/r?redir=https://ext-tracker.example/r", "a.com"),
    ("https://example.com:8080/a", "example.com:8080"),
    ("https://example.com/", "example.com"),
    ("https://example.com/a/b?c=1", "example.com"),
]


def test_host_expr_first_scheme_wins(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOST_GOLDEN], "url STRING")
    got = df.select("url", host_expr(F.col("url")).alias("h")).collect()
    for row in got:
        want = dict(HOST_GOLDEN)[row["url"]]
        assert row["h"] == want, row["url"]
        # parity with the simulator's _host_of (the executable spec)
        assert row["url"].split("://", 1)[1].split("/", 1)[0] == want


DOM_GOLDEN = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("cdn.hot-megasite.com", "hot-megasite.com"),
    ("localhost", "localhost"),
    ("site-9.com.au", "site-9.com.au"),
    ("deep.site-9.com.au", "site-9.com.au"),
]


@pytest.mark.parametrize("host,want", DOM_GOLDEN)
def test_registrable_domain_py(host, want):
    assert registrable_domain_py(host) == want


def test_registrable_domain_column_parity(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOM_GOLDEN], "host STRING")
    got = df.select("host", registrable_domain_expr(F.col("host")).alias("d")).collect()
    for row in got:
        assert row["d"] == registrable_domain_py(row["host"]), row["host"]
