"""Single-threaded reference-semantics crawl simulator (SURVEY.md §5.3).

Implements the engine's crawl SPEC — virtual clock, token buckets, robots,
circuit breaker, (priority desc, next_fetch_ts asc, url_hash asc) scheduling,
backoff, priority decay — as plain ordered Python over an in-memory pages
dict. The equivalence test asserts that the distributed Spark crawler produces
the **identical final URL-seen set and identical per-round fetch sets** under
the same seeds + politeness budget at any parallelism level (the north rule's
"crawl ordering + URL-seen set match the reference" gate).

This file is the executable spec; ``crawler.py`` is the scaled implementation.
Any semantic drift between them is a test failure, mirroring how the reference
repo validated per-example behavior by hand (``README_augment.md:80,90``).
"""

from __future__ import annotations

import datetime as dt
import math
import re
from dataclasses import dataclass, field
from urllib import robotparser
from urllib.parse import quote, urlsplit

from gh_crawler_spark.crawler import EPOCH, CrawlConfig
from gh_crawler_spark.functions.hashing import xxhash64_py
from gh_crawler_spark.functions.text import extract_outlinks_py, extract_text_py
from gh_crawler_spark.functions.urls import canonicalize_url_py, registrable_domain_py
from gh_crawler_spark.operators.politeness import (
    ADAPT_MIN_FRACTION,
    ADAPT_RECOVER_FACTOR,
    ADAPT_SHRINK_FACTOR,
    ADAPT_SHRINK_RATIO,
    BACKOFF_BASE_S,
    BACKOFF_CAP_S,
    CIRCUIT_BLOCK_S,
    CIRCUIT_FAILURES,
)


@dataclass
class _Entry:
    url: str
    url_hash: int
    domain: str
    priority: float
    next_fetch_ts: dt.datetime
    state: str = "discovered"
    attempt: int = 0


@dataclass
class _Host:
    tokens: float
    rate: float
    capacity: float
    base_rate: float = 0.0
    robots: str = ""
    blocked_until: dt.datetime | None = None
    failure_count: int = 0
    # Last round whose fold wrote this host (engine mirror: host_state
    # asof_round). Tokens are as-of this round; refill is computed LAZILY
    # over the gap with the SAME association order as the engine's column
    # expression — tokens + rate * ((k - asof) * Δ) — so engine and spec
    # agree bit-for-bit even where iterated vs single-shot capped refill
    # would differ in float ulps.
    asof_round: int = -1
    _parser: robotparser.RobotFileParser | None = field(default=None, repr=False)

    def allowed(self, url: str) -> bool:
        if not self.robots.strip():
            return True
        if self._parser is None:
            self._parser = robotparser.RobotFileParser()
            self._parser.parse(self.robots.splitlines())
        try:
            return bool(self._parser.can_fetch("*", quote(urlsplit(url).path) or "/"))
        except Exception:
            return True


def _host_of(canonical: str) -> str:
    return canonical.split("://", 1)[1].split("/", 1)[0]


class SimCrawler:
    """Ordered single-threaded crawl over ``pages: {canonical_url: html}``."""

    def __init__(self, cfg: CrawlConfig, pages: dict[str, bytes],
                 robots: dict[str, tuple[str, int]] | None = None,
                 budget_overrides: dict[str, int] | None = None,
                 robots_provider=None):
        self.cfg = cfg
        self.pages = {xxhash64_py(u): (u, h) for u, h in pages.items()}
        self.robots = robots or {}
        self.budget_overrides = budget_overrides or {}  # W2 mirror
        # robots TTL mirror: ``(round_k) -> dict`` like the engine's provider
        self.robots_provider = robots_provider
        self.frontier: dict[int, _Entry] = {}
        self.hosts: dict[str, _Host] = {}
        self.seen: set[int] = set()
        self.fetch_log: list[tuple[int, int]] = []  # (round, url_hash)

    def _host(self, domain: str, asof: int = -1) -> _Host:
        h = self.hosts.get(domain)
        if h is None:
            rules, delay = self.robots.get(domain, ("", 100))
            rate = 1000.0 / (delay or 100)
            cap = rate * self.cfg.token_capacity_s
            h = self.hosts[domain] = _Host(
                tokens=cap, rate=rate, capacity=cap, base_rate=rate, robots=rules,
                asof_round=asof,
            )
        return h

    def _lazy_avail(self, h: _Host, k: int) -> float:
        """Capped refill over the whole gap since the host was last written —
        the engine's lazy_elapsed column expression, same association order."""
        return min(
            h.capacity, h.tokens + h.rate * ((k - h.asof_round) * self.cfg.round_duration_s)
        )

    def _add(self, url: str, priority: float, nft: dt.datetime, round_no: int) -> bool:
        uh = xxhash64_py(url)
        if uh in self.frontier or uh in self.seen:
            return False
        dom = registrable_domain_py(_host_of(url))
        self.frontier[uh] = _Entry(url, uh, dom, priority, nft)
        # a domain first seen at discovery time enters host state stamped
        # with the discovering round (engine: _new_host_rows(asof_round=k));
        # seeds (round_no=0) get the init stamp -1
        self._host(dom, asof=round_no - 1)
        return True

    def now(self, k: int) -> dt.datetime:
        return EPOCH + dt.timedelta(seconds=k * self.cfg.round_duration_s)

    def seed(self, seeds: list[tuple[str, float]]) -> None:
        best: dict[str, float] = {}
        for url, prio in seeds:
            c = canonicalize_url_py(url)
            best[c] = max(best.get(c, -math.inf), prio)
        for c, p in best.items():
            self._add(c, p, self.now(0), 0)

    def run(self, transient_fn=None, max_rounds: int | None = None) -> list[dict]:
        cfg = self.cfg
        transient_fn = transient_fn or (lambda url, attempt: False)
        stats, empty = [], 0
        for k in range(max_rounds if max_rounds is not None else cfg.max_rounds):
            s = self.run_round(k, transient_fn)
            stats.append(s)
            empty = empty + 1 if s["eligible"] == 0 else 0
            if empty >= cfg.empty_rounds_stop:
                break
        return stats

    def run_round(self, k: int, transient_fn) -> dict:
        cfg, now = self.cfg, self.now(k)
        nxt = self.now(k + 1)
        # 0. robots TTL mirror (crawler.py _refresh_robots, same round
        # boundary, BEFORE eligibility): swap the rules dict; existing hosts
        # whose rules TEXT changed re-parse (rates stay as first fetched,
        # exactly like the engine, which re-verdicts but never re-rates)
        if (
            cfg.robots_ttl_rounds > 0
            and k > 0
            and k % cfg.robots_ttl_rounds == 0
            and self.robots_provider is not None
        ):
            new = self.robots_provider(k)
            if new is not None:
                self.robots = new
                for dom, h in self.hosts.items():
                    rules = new.get(dom, ("", 100))[0]
                    if rules != h.robots:
                        h.robots = rules
                        h._parser = None
        # 1-3. eligibility + robots + token budget + deterministic rank
        # (T5/T10 mirror: expired failures / stale fetched rows re-enter —
        # their next_fetch_ts carries the due time, stamped at transition)
        states = {"discovered"}
        if cfg.failure_ttl_s is not None:
            states.add("failed")
        if cfg.staleness_s is not None:
            states.add("fetched")
        by_host: dict[str, list[_Entry]] = {}
        for e in self.frontier.values():
            if e.state not in states or e.next_fetch_ts > now:
                continue
            h = self._host(e.domain)
            if h.blocked_until is not None and h.blocked_until > now:
                continue
            if not h.allowed(e.url):
                continue
            by_host.setdefault(e.domain, []).append(e)
        batch: list[_Entry] = []
        budgets: dict[str, float] = {}
        for dom, entries in by_host.items():
            h = self._host(dom)
            avail = self._lazy_avail(h, k)
            budget = int(avail)
            if dom in self.budget_overrides:  # W2: override CAPS the budget
                budget = min(budget, int(self.budget_overrides[dom]))
            budgets[dom] = avail
            if budget < 1:
                continue
            entries.sort(key=lambda e: (-e.priority, e.next_fetch_ts, e.url_hash))
            batch.extend(entries[:budget])

        # 4-6. fetch + extract + discover
        n_ok = n_transient = n_missing = n_links = n_new = 0
        new_best: dict[int, tuple[str, float]] = {}
        fails_per_host: dict[str, int] = {}
        ok_per_host: dict[str, int] = {}
        def fail_terminal(e: _Entry) -> None:
            e.state = "failed"
            if cfg.failure_ttl_s is not None:  # T5: re-enters after the TTL
                e.next_fetch_ts = now + dt.timedelta(seconds=cfg.failure_ttl_s)
                e.attempt = 0

        for e in sorted(batch, key=lambda e: e.url_hash):
            dom = e.domain
            page = self.pages.get(e.url_hash)
            if page is None:
                fail_terminal(e)
                n_missing += 1
                continue
            url, html = page
            if transient_fn(e.url, e.attempt):
                n_transient += 1
                fails_per_host[dom] = fails_per_host.get(dom, 0) + 1
                e.attempt += 1
                if e.attempt >= cfg.max_attempts:
                    fail_terminal(e)
                else:
                    delay = int(min(BACKOFF_CAP_S, BACKOFF_BASE_S * 2.0 ** (e.attempt - 1)))
                    e.next_fetch_ts = now + dt.timedelta(seconds=delay)
                continue
            n_ok += 1
            ok_per_host[dom] = ok_per_host.get(dom, 0) + 1
            e.state = "fetched"
            if cfg.staleness_s is not None:  # T10: re-crawl due time
                e.next_fetch_ts = now + dt.timedelta(seconds=cfg.staleness_s)
                e.attempt = 0
            self.seen.add(e.url_hash)
            self.fetch_log.append((k, e.url_hash))
            _ = extract_text_py(html)
            for link in extract_outlinks_py(html, url):
                lh = xxhash64_py(link)
                n_links += 1
                # F3 mirror: per-scope link predicates (crawler.py discovery)
                if cfg.link_shape is not None and not re.search(cfg.link_shape, link):
                    continue
                if cfg.link_same_scope is not None:
                    lm = re.search(cfg.link_same_scope, link)
                    pm = re.search(cfg.link_same_scope, url)
                    if (lm is None or pm is None or not lm.group(1)
                            or lm.group(1) != pm.group(1)):
                        continue
                prev = new_best.get(lh)
                p = max(e.priority * cfg.priority_decay, 0.01)
                if prev is None or p > prev[1]:
                    new_best[lh] = (link, p)
        for lh, (link, p) in new_best.items():
            if self._add(link, p, nxt, k + 1):
                n_new += 1

        # 7. host-state fold: spend tokens, circuit breaker — TOUCHED hosts
        # only (engine mirror: a round appends host rows only for scheduled
        # domains; untouched hosts change in no way beyond the lazy capped
        # refill, which accrues via asof_round at next read — adapt and
        # breaker are identity on zero outcomes and failure_count stays
        # below threshold between rounds by the trip-reset invariant)
        attempted: dict[str, int] = {}
        for e in batch:
            attempted[e.domain] = attempted.get(e.domain, 0) + 1
        for dom, a in attempted.items():
            h = self.hosts[dom]
            avail = budgets[dom]
            h.tokens = max(0.0, avail - a)
            h.asof_round = k
            if cfg.adaptive_rate:
                f = fails_per_host.get(dom, 0)
                o = ok_per_host.get(dom, 0)
                if a > 0 and f / a >= ADAPT_SHRINK_RATIO:
                    h.rate = max(h.base_rate * ADAPT_MIN_FRACTION, h.rate * ADAPT_SHRINK_FACTOR)
                elif o > 0 and f == 0:
                    h.rate = min(h.base_rate, h.rate * ADAPT_RECOVER_FACTOR)
            if ok_per_host.get(dom, 0) > 0:
                fc = 0
            else:
                fc = h.failure_count + fails_per_host.get(dom, 0)
            # trip-and-reset: blocked_until is armed only when the threshold
            # is CROSSED; the count resets so an idle blocked host is not
            # re-stamped every round and recovers when the block lapses
            # (mirrors operators/politeness.py apply_circuit_breaker)
            if fc >= CIRCUIT_FAILURES:
                h.blocked_until = now + dt.timedelta(seconds=CIRCUIT_BLOCK_S)
                fc = 0
            h.failure_count = fc
        return {
            "round": k, "eligible": len(batch), "fetched": n_ok,
            "transient": n_transient, "missing": n_missing, "new": n_new,
        }
