"""Deterministic synthetic crawl corpus (FIXTURES.md §1-3).

Generates the authoritative input shape from BASELINE.json ``input_hint``:

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Properties (all seed-fixed, no external data, no ``random`` module — every
value is a pure function of (seed, row_id) via blake2b, so generation is
embarrassingly parallel and identical at any parallelism level):

  * **Closed link graph** — each page's html embeds 0-20 ``<a href>`` links
    whose canonical forms are other rows' canonical URLs, so a crawl over the
    table never leaves it.
  * **Canonicalization traps** — raw ``url`` values carry mixed-case hosts,
    ``#fragment``s, unsorted ``?b=2&a=1`` params, ``:443``/``:80`` default
    ports, trailing slashes; exactly one row per *canonical* URL.
  * **Skew** — one hot registrable domain owns ~50% of URLs (exercises
    salting, SURVEY.md T8); the rest are Zipf-ish over D domains.
  * **Byte-identical oracle** — ``text`` is computed by the very same
    :func:`gh_crawler_spark.functions.text.extract_text_py` the engine UDF
    runs, so the per-row invariant holds by construction and any drift in the
    extractor breaks tests immediately.

Scale path: generation runs as ``spark.range(n).mapInPandas(...)`` — at
10^10 rows this is the same job, just more partitions; no driver-side
materialization anywhere.
"""

from __future__ import annotations

import datetime as dt
from hashlib import blake2b
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gh_crawler_spark.functions.text import extract_text_py
from gh_crawler_spark.functions.urls import canonicalize_url_py

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

HOT_DOMAIN = "hot-megasite.com"
_LANGS = ["en", "zh", "de", "fr", "es", "ja", "ru", "pt"]
_TLDS = ["com", "org", "net", "io", "co.uk", "com.au", "de"]
_WORDS = (
    "spark frontier crawl queue token bucket robots bloom filter shard "
    "partition shuffle window rank priority fetch politeness domain host "
    "snapshot commit lineage metric round seed anchor corpus stream batch"
).split()


def _h(seed: int, *parts: object) -> int:
    """Deterministic 64-bit hash of (seed, parts)."""
    b = blake2b(digest_size=8)
    b.update(repr((seed,) + parts).encode())
    return int.from_bytes(b.digest(), "big")


def _domain(seed: int, i: int, n_domains: int) -> str:
    h = _h(seed, "dom", i)
    if h % 2 == 0:  # ~50% hot-domain skew
        return HOT_DOMAIN
    # Zipf-ish rank via exponential inverse CDF over remaining domains
    u = (h >> 8) % 10_000 / 10_000.0
    rank = int(n_domains ** u)  # density ~ 1/rank
    tld = _TLDS[_h(seed, "tld", rank) % len(_TLDS)]
    return f"site-{rank}.{tld}"


def _canonical_url(seed: int, i: int, n_domains: int) -> str:
    dom = _domain(seed, i, n_domains)
    h = _h(seed, "path", i)
    sub = ["www.", "", "cdn.", "app."][h % 4] if dom == HOT_DOMAIN else ""
    depth = 1 + h % 3
    segs = "/".join(f"{_WORDS[_h(seed, 'seg', i, d) % len(_WORDS)]}-{i}" if d == depth - 1
                    else _WORDS[_h(seed, "seg", i, d) % len(_WORDS)]
                    for d in range(depth))
    # ~half of pages carry a (sorted) query as part of their canonical identity;
    # a subset embeds a full URL in a param (redirect/share-link shape) so host
    # attribution must split on the FIRST '://' (ADVICE r1: host_expr trap)
    if h & 32:
        query = "?a=1&b=2"
        if h & 64:
            query += "&redir=https://ext-tracker.example/r"
    else:
        query = ""
    return f"https://{sub}{dom}/{segs}{query}"


def _trapped_url(seed: int, variant: int, canonical: str) -> str:
    """Re-dress a canonical URL with canonicalization traps. Every trap is
    canonical-PRESERVING: ``canonicalize_url_py(_trapped_url(..)) ==
    canonical`` exactly, so differently-dressed links to the same page all
    resolve to one frontier key. ``variant`` varies the dressing."""
    h = _h(seed, "trap", variant)
    base, q, query = canonical.partition("?")
    scheme, _, rest = base.partition("://")
    host, slash, path = rest.partition("/")
    if h & 1:
        host = host.upper()
    if h & 2:
        host += ":443"
    out = f"{scheme}://{host}{slash}{path}"
    if h & 4:
        out += "/"
    if query:  # present the canonical (sorted) query unsorted
        out += "?" + ("&".join(reversed(query.split("&"))) if h & 8 else query)
    if h & 16:
        out += "#section-" + str(h % 97)
    return out


def _sentence(seed: int, i: int, j: int) -> str:
    return " ".join(
        _WORDS[_h(seed, "w", i, j, k) % len(_WORDS)] for k in range(4 + _h(seed, "sl", i, j) % 9
        )
    )


_ISSUE_STATES = ("open", "closed", "merged")


def embedded_payload(seed: int, i: int) -> str:
    """Deterministic nested page-data JSON (the reference's preloadedQueries
    shape, src/issue_scraper.py:408-505): issue number/state + timeline edges
    where only __typename == 'IssueComment' nodes are real comments, each
    carrying the full Comment payload — author login, createdAt, body (the
    reference's ``Comment(author, timestamp, content)``, src/models.py:38-42).
    Comment timestamps are deliberately NOT in document order for ~half the
    pages, so the engine's chronological sort (src/pr_scraper.py:721-722) is
    observable. Word-only bodies keep the payload valid JSON without
    escaping."""
    state = _ISSUE_STATES[_h(seed, "state", i) % 3]
    b1, b2 = _sentence(seed, i, 300), _sentence(seed, i, 301)
    a1 = "user-%d" % (_h(seed, "auth", i, 1) % 50)
    a2 = "user-%d" % (_h(seed, "auth", i, 2) % 50)
    t1 = _h(seed, "cts", i, 1) % 86000
    t2 = _h(seed, "cts", i, 2) % 86000
    if t2 == t1:
        t2 = t1 + 11
    iso = lambda s: (
        dt.datetime(2024, 3, 1) + dt.timedelta(seconds=s)
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    return (
        '{"payload":{"preloadedQueries":[{"result":{"data":{"repository":'
        '{"issue":{"number":%d,"state":"%s","frontTimelineItems":{"edges":['
        '{"node":{"__typename":"IssueComment","author":{"login":"%s"},"createdAt":"%s","body":"%s"}},'
        '{"node":{"__typename":"CrossReferencedEvent","body":"ref"}},'
        '{"node":{"__typename":"IssueComment","author":{"login":"%s"},"createdAt":"%s","body":"%s"}}]}}}}}}]}}'
        % (i, state, a1, iso(t1), b1, a2, iso(t2), b2)
    )


def _make_html(seed: int, i: int, n: int, n_domains: int,
               paras: tuple[int, int] = (1, 6)) -> bytes:
    h = _h(seed, "html", i)
    n_links = h % 21  # 0-20 out-links
    n_paras = paras[0] + h % (paras[1] - paras[0] + 1)
    paras = "".join(
        f"<p>{_sentence(seed, i, j)}</p>\n" for j in range(n_paras)
    )
    links = []
    for j in range(n_links):
        tgt = _h(seed, "lnk", i, j) % n
        tgt_url = _trapped_url(seed, tgt * 31 + 7, _canonical_url(seed, tgt, n_domains))
        links.append(f'<a href="{tgt_url}">{_sentence(seed, i, 100 + j)[:24]}</a>')
    body = (
        "<html><head><title>doc %d</title>"
        "<style>.x{color:red}</style>"
        "<script>var junk_%d = 'SHOULD NOT APPEAR';</script>"
        '<script type="application/json" id="page-data">%s</script></head>'
        "<body><noscript>NOSCRIPT JUNK</noscript>%s<div>%s</div>"
        "</body></html>"
        % (i, h % 1000, embedded_payload(seed, i), paras, "\n".join(links))
    )
    return body.encode("utf-8")


def _row(seed: int, i: int, n: int, n_domains: int,
         paras: tuple[int, int] = (1, 6), with_oracle_text: bool = True) -> tuple:
    canonical = _canonical_url(seed, i, n_domains)
    raw = _trapped_url(seed, i, canonical)
    html = _make_html(seed, i, n, n_domains, paras)
    # the byte-identical oracle; skippable for throughput benches that never
    # read the text column (it would double generation cost)
    text = extract_text_py(html) if with_oracle_text else ""
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=_h(seed, "ts", i) % 31_536_000)
    lang = _LANGS[_h(seed, "lang", i) % len(_LANGS)]
    return raw, ts, html, text, lang


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_domains: int = 500,
    n_partitions: int | None = None,
    paras: tuple[int, int] = (1, 6),
    with_oracle_text: bool = True,
) -> DataFrame:
    """Distributed deterministic generation of the pages corpus.

    ``paras`` sizes page bodies: (1, 6) for tiny unit-test pages, (150, 350)+
    for realistic Common-Crawl-scale documents (~15-60 KB html) in benchmarks.
    """
    parts = n_partitions or max(8, n // 20_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _row(seed, int(i), n, n_domains, paras, with_oracle_text)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def canonical_urls_py(seed: int, ids: list[int], n_domains: int = 500) -> list[str]:
    """Oracle helper: canonical URL of row *i* (tests / seed construction)."""
    return [_canonical_url(seed, i, n_domains) for i in ids]


def generate_seeds(
    spark: SparkSession, n_pages: int, n_seeds: int, seed: int = 42, n_domains: int = 500
) -> DataFrame:
    """Seed list (FIXTURES.md §2): raw-trap URLs + deterministic priority."""
    rows = []
    for j in range(n_seeds):
        i = _h(seed, "seedpick", j) % n_pages
        canonical = _canonical_url(seed, i, n_domains)
        rows.append(
            (
                _trapped_url(seed, i, canonical),
                float(_h(seed, "prio", j) % 1000) / 10.0,
                [_LANGS[_h(seed, "stag", j) % len(_LANGS)]],
            )
        )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("priority", T.DoubleType(), False),
            T.StructField("tags", T.ArrayType(T.StringType()), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def generate_robots(
    spark: SparkSession, seed: int = 42, n_domains: int = 500
) -> DataFrame:
    """Per-domain robots rules + crawl delays (FIXTURES.md §3).

    A deterministic subset of domains disallows some path prefixes; the hot
    domain gets a tight crawl-delay so politeness actually bites in tests.
    """
    doms = {HOT_DOMAIN} | {
        f"site-{r}.{_TLDS[_h(seed, 'tld', r) % len(_TLDS)]}" for r in range(0, n_domains + 1)
    }
    rows = []
    for d in sorted(doms):
        h = _h(seed, "rob", d)
        rules = "User-agent: *\n"
        if h % 5 == 0:
            blocked = _WORDS[h % len(_WORDS)]
            rules += f"Disallow: /{blocked}\n"
        if h % 7 == 0:
            rules += "Disallow: /private\n"
        delay = 50 + h % 200  # ms; reference analog 100ms (src/config.py:81)
        rows.append((d, rules, delay))
    schema = T.StructType(
        [
            T.StructField("registrable_domain", T.StringType(), False),
            T.StructField("robots_rules", T.StringType(), False),
            T.StructField("crawl_delay_ms", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)
