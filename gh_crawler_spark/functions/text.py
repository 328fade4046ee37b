"""HTML text + out-link extraction — the byte-identical per-URL invariant.

The reference extracts text with BeautifulSoup ``get_text(strip=True)`` plus
content cleaning (collapse ``\\s+`` to one space, strip; reference
``src/utils.py:42-49``, ``src/issue_scraper.py:342-364``) and truncation rules
(``content[:2000] + "..."``; ``src/pr_scraper.py:639-641``). bs4/lxml are not
available in this sandbox, so the engine defines ONE deterministic pure-Python
extraction (stdlib ``html.parser``) and uses it in BOTH places:

  * the synthetic-pages datagen writes ``text = extract_text_py(html)`` as the
    oracle column, and
  * the engine's Arrow-vectorized pandas UDF applies the same function at
    fetch time,

so "byte-identical extracted text per url" (BASELINE.json input_hint) holds by
construction and is asserted row-by-row in tests (SURVEY.md §5.2).

EXTRACTION SPEC:
  1. decode bytes as UTF-8 (errors='replace')
  2. parse HTML; ignore the contents of <script> <style> <noscript> <template>
  3. concatenate remaining text nodes (entities unescaped) with ' '
  4. collapse whitespace runs to a single space; strip ends

Out-links: every <a href=...>, absolutized against the page URL (stdlib
urljoin), canonicalized (engine mode), first-occurrence-order deduped — the
``dict.fromkeys`` idiom mirrors the reference's order-preserving dedup
(``src/pr_scraper.py:294``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gh_crawler_spark.functions.urls import canonicalize_url_py

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_WS_RE = re.compile(r"\s+")


class _TextAndLinks(HTMLParser):
    """Single-pass extractor: text chunks + hrefs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data.strip():
            self.chunks.append(data)


def _parse(html: bytes | str) -> _TextAndLinks:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextAndLinks()
    p.feed(html)
    return p


def extract_text_py(html: bytes | str) -> str:
    """The byte-identical extraction (spec above). Shared oracle + UDF body."""
    p = _parse(html)
    return _WS_RE.sub(" ", " ".join(p.chunks)).strip()


_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def extract_outlinks_py(html: bytes | str, base_url: str) -> list[str]:
    """Canonicalized out-links, first-occurrence order, deduped."""
    p = _parse(html)
    out: list[str] = []
    for href in p.hrefs:
        href = href.strip()
        if not href or href.startswith("#") or href.lower().startswith(_SKIP_SCHEMES):
            continue
        absolute = urljoin(base_url, href)
        if not absolute.startswith(("http://", "https://")):
            continue
        out.append(canonicalize_url_py(absolute))
    return list(dict.fromkeys(out))


def truncate_ref(text: str, limit: int) -> str:
    """Reference truncation rule: ``s[:k] + '...'`` when over the limit
    (src/pr_scraper.py:639; SURVEY.md L3). Column analog:
    ``when(length > k, concat(substring(s,1,k), '...')).otherwise(s)``."""
    return text[:limit] + "..." if len(text) > limit else text


# ---------------------------------------------------------------------------
# Arrow-vectorized UDFs (the only Python in the hot path; SURVEY.md §2.10)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: extract_text_py(h) if h is not None else None)


_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("outlinks", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_PAGE_SCHEMA)
def extract_page_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
    """Single-parse extraction: text + out-links from ONE HTML parse per page
    (the hot-path variant; extract_text_udf/extract_outlinks_udf remain for
    parity tests). Byte-identical to extract_text_py/extract_outlinks_py —
    same parser, same post-processing."""
    texts: list[str | None] = []
    links: list[list[str]] = []
    for h, b in zip(html, base_url):
        if h is None:
            texts.append(None)
            links.append([])
            continue
        p = _parse(h)
        texts.append(_WS_RE.sub(" ", " ".join(p.chunks)).strip())
        out: list[str] = []
        for href in p.hrefs:
            href = href.strip()
            if not href or href.startswith("#") or href.lower().startswith(_SKIP_SCHEMES):
                continue
            absolute = urljoin(b, href)
            if not absolute.startswith(("http://", "https://")):
                continue
            out.append(canonicalize_url_py(absolute))
        links.append(list(dict.fromkeys(out)))
    return pd.DataFrame({"text": texts, "outlinks": links})


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_outlinks_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract_outlinks_py(h, b) if h is not None and b is not None else []
            for h, b in zip(html, base_url)
        ]
    )
