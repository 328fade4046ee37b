"""URL canonicalization, registrable-domain extraction, and hashing.

The reference cleans URLs imperatively — ``url.split('#')[0].split('?')[0]``
plus scheme absolutization and ``rstrip('/')`` (reference
``src/pr_scraper.py:386-396,560,796-798``) — and uses raw URL strings as dedup
keys (no hashing anywhere; SURVEY.md X5/X16). The engine generalizes that to
the north-rule canonical form and keys the frontier on ``xxhash64``.

CANONICAL-FORM SPEC (engine mode) — implemented three times, identically:
  1. pure Python  (:func:`canonicalize_url_py`)  — oracle + datagen + tests
  2. Spark column expressions (:func:`canonicalize_url_expr`) — JVM-side,
     whole-stage-codegen, NO Python UDF in the hot path
  3. DuckDB SQL   (``__spark_entry__.py`` oracle) — correctness gate

  a. trim surrounding whitespace
  b. drop fragment (everything from the first ``#``)
  c. absolutize: ``//host/p`` -> ``https://host/p``; no scheme -> ``https://``
  d. lowercase scheme and host
  e. strip default port (``http:80``, ``https:443``)
  f. path: strip trailing ``/``s; empty path -> ``/``
  g. query: split on ``&``, drop empty params, sort lexicographically,
     rejoin; empty query -> no ``?``
  h. recompose ``scheme://host[:port]<path>[?query]``

Reference-parity mode (``mode="reference"``) instead drops the query entirely,
byte-matching the reference's ``split('#')[0].split('?')[0]`` + ``rstrip('/')``.

Registrable domain: last-two host labels, or last-three when the last two are
a known multi-part public suffix (embedded subset of the public-suffix list —
the publicsuffix package is unavailable in this sandbox; the column version
and the Python version share one suffix table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Embedded subset of multi-part public suffixes (publicsuffix.org is public
# data; full list swap-in is a one-line change — keep the set shared between
# the Python and column implementations).
MULTI_PART_SUFFIXES: frozenset[str] = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "com.br", "net.br", "org.br",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
        "co.in", "net.in", "org.in", "gen.in",
        "co.kr", "or.kr", "ne.kr",
        "com.mx", "org.mx",
        "com.tw", "org.tw",
        "com.sg", "org.sg",
        "co.za", "org.za",
        "co.nz", "org.nz", "net.nz",
        "com.hk", "org.hk",
        "com.ar", "com.tr", "com.ua", "com.pl",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


# ---------------------------------------------------------------------------
# Pure-Python reference implementation (oracle / datagen / property tests)
# ---------------------------------------------------------------------------

def canonicalize_url_py(url: str, mode: str = "engine") -> str:
    """Canonicalize one URL per the module spec. Pure Python, deterministic."""
    u = url.strip()
    # b. fragment
    hash_idx = u.find("#")
    if hash_idx >= 0:
        u = u[:hash_idx]
    # c. absolutize
    if u.startswith("//"):
        u = "https:" + u
    elif "://" not in u:
        u = "https://" + u
    scheme, _, rest = u.partition("://")
    scheme = scheme.lower()
    # split host[:port] / path?query
    slash_idx = len(rest)
    for ch in ("/", "?"):
        i = rest.find(ch)
        if i >= 0:
            slash_idx = min(slash_idx, i)
    hostport, tail = rest[:slash_idx], rest[slash_idx:]
    host, _, port = hostport.partition(":")
    host = host.lower()
    if port and _DEFAULT_PORTS.get(scheme) == port:
        port = ""
    # path / query
    q_idx = tail.find("?")
    if q_idx >= 0:
        path, query = tail[:q_idx], tail[q_idx + 1 :]
    else:
        path, query = tail, ""
    path = path.rstrip("/") or "/"
    netloc = f"{host}:{port}" if port else host
    if mode == "reference":
        # reference src/pr_scraper.py:386-396,560: drop query entirely
        return f"{scheme}://{netloc}{path}"
    params = sorted(p for p in query.split("&") if p)
    qs = "&".join(params)
    return f"{scheme}://{netloc}{path}" + (f"?{qs}" if qs else "")


def registrable_domain_py(host: str) -> str:
    """Registrable domain of a lowercase host (PSL-subset heuristic)."""
    labels = host.lower().split(".")
    if len(labels) <= 2:
        return host.lower()
    last2 = ".".join(labels[-2:])
    if last2 in MULTI_PART_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


# ---------------------------------------------------------------------------
# Spark column-expression implementation (JVM-side, codegen'd)
# ---------------------------------------------------------------------------

def canonicalize_url_expr(url: Column, mode: str = "engine") -> Column:
    """Column expression computing the identical canonical form.

    Pure built-in expressions: split/regexp/lower/array_sort — stays inside
    whole-stage codegen, no Python round-trip (SURVEY.md §4 "keep
    canonicalization in built-in exprs").
    """
    u = F.trim(url)
    u = F.split(u, "#", 2).getItem(0)  # strip fragment
    u = F.when(u.startswith("//"), F.concat(F.lit("https:"), u)).otherwise(
        F.when(~u.contains("://"), F.concat(F.lit("https://"), u)).otherwise(u)
    )
    scheme = F.lower(F.split(u, "://", 2).getItem(0))
    # split(u, '://', 2)[1]: everything after the first '://' (a later
    # '://' inside the query must stay intact, so no substring_index here)
    rest = F.split(u, "://", 2).getItem(1)
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.lit(2_000_000_000))
    host = F.lower(F.split(hostport, ":", 2).getItem(0))
    port = F.when(hostport.contains(":"), F.split(hostport, ":", 2).getItem(1)).otherwise(F.lit(""))
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(tail.contains("?"), F.regexp_extract(tail, r"^[^?]*\?(.*)$", 1)).otherwise(
        F.lit("")
    )
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    netloc = F.when(port == "", host).otherwise(F.concat_ws(":", host, port))
    base = F.concat(scheme, F.lit("://"), netloc, path)
    if mode == "reference":
        return base
    params = F.array_sort(F.filter(F.split(query, "&"), lambda p: p != ""))
    qs = F.array_join(params, "&")
    return F.when(qs == "", base).otherwise(F.concat(base, F.lit("?"), qs))


def host_expr(canonical_url: Column) -> Column:
    """Host (incl. non-default port) of an already-canonical URL.

    Splits on the FIRST '://' — a canonical URL may legitimately carry
    '://' inside query params (redirect/share links), and the simulator's
    ``_host_of`` splits on the first occurrence; ``substring_index(..., -1)``
    would attribute such URLs to the embedded host.
    """
    return F.split(F.split(canonical_url, "://", 2).getItem(1), "/", 2).getItem(0)


def registrable_domain_expr(host: Column) -> Column:
    """Column version of :func:`registrable_domain_py` (same suffix table)."""
    h = F.lower(F.split(host, ":", 2).getItem(0))  # drop port if present
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    suffixes = F.array(*[F.lit(s) for s in sorted(MULTI_PART_SUFFIXES)])
    return (
        F.when(n <= 2, h)
        .when(F.array_contains(suffixes, last2), last3)
        .otherwise(last2)
    )


def url_hash_expr(canonical_url: Column) -> Column:
    """Frontier key: built-in ``xxhash64`` over the canonical URL (X16).

    The reference dedups on raw URL strings (src/checkpoint_manager.py:
    176-238); at 10^10 frontier rows a 8-byte key is mandatory — joins
    shuffle 8 bytes/row instead of ~80, and the Bloom filter hashes integers.
    """
    return F.xxhash64(canonical_url)
