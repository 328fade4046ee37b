"""The crawl round loop: frontier -> schedule -> fetch -> extract -> commit.

This is the engine's equivalent of the reference's
``EnhancedCrawlerManager.process_repositories`` driver
(``src/enhanced_crawler.py:65-139``) and its two-phase
discovery/scrape loop (``src/aggressive_pr_scraper.py:153-253``), re-expressed
as a driver-side ``while`` loop of DataFrame jobs over snapshot tables
(SURVEY.md §3.2→Spark). Each round:

  1. **Eligibility** (F7/F8/T5/T10): ``state='discovered' AND next_fetch_ts <=
     now AND (blocked_until IS NULL OR blocked_until <= now)`` — the virtual
     clock (round k -> t0 + k·Δ) keeps every politeness decision
     deterministic and parallelism-independent.
  2. **Robots** (north rule): vectorized pandas UDF per batch.
  3. **Schedule** (W1/W2/T1): token-bucket budgets joined from host_state,
     skew-safe salted window rank.
  4. **Fetch** (S3, simulated): broadcast the (small) scheduled batch against
     the pages corpus keyed by ``xxhash64(canonical_url)``; a deterministic
     hash slice of rows fails transiently to exercise T2 backoff and the T4
     circuit breaker. (The production HTTP path lives in
     ``operators/fetch.py`` with identical dataflow shape.)
  5. **Extract** (X1/UDF): byte-identical text + canonical out-links.
  6. **Discover** (J1/U1/T7): explode out-links -> Bloom-prefiltered anti-join
     against all known hashes -> new frontier rows with decayed priority.
  7. **Commit** (S7/S11/S12/T6): append results/seen/metrics, append this
     round's frontier **state transitions** (a delta table — the Iceberg
     MERGE shape: per-round cost is O(changes), never a frontier rewrite;
     :meth:`Crawler.compact` periodically folds the delta back into the
     bucketed frontier), overwrite host_state, then the ``rounds`` lineage
     row — whose snapshot ids are what :meth:`Crawler.resume` rolls back to,
     giving exactly-once rounds (vs the reference's at-least-once
     save-every-10, ``src/pr_checkpoint_manager.py:148-150``).

Termination (A10): ``empty_rounds_stop`` consecutive rounds with no eligible
URLs (reference k=3, ``src/aggressive_pr_scraper.py:302``) or the round cap
(L5).
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gh_crawler_spark.functions.text import extract_page_udf
from gh_crawler_spark.functions.urls import (
    canonicalize_url_expr,
    host_expr,
    registrable_domain_expr,
    url_hash_expr,
)
from gh_crawler_spark.operators.dedup import (
    PartitionedBloom,
    bucket_expr,
    flag_maybe_seen,
    resolve_unseen,
)
from gh_crawler_spark.operators.politeness import (
    adapt_refill_rate,
    apply_circuit_breaker,
    backoff_next_fetch_ts,
    refill_tokens,
    robots_allowed_udf,
)
from gh_crawler_spark.operators.scheduling import rank_fetch_batch
from gh_crawler_spark.tables import SnapshotTable

EPOCH = dt.datetime(2024, 6, 1, 0, 0, 0)


def _scan_java_only_regex(pat: str) -> str | None:
    """Return a description of the first Java-regex-only construct in
    ``pat``, or None if the pattern stays in the Java∩Python common subset.

    Escape- and character-class-aware (round-4 ADVICE: a raw substring scan
    falsely rejected ``a\\++`` — escaped plus then a ``+`` quantifier — and a
    literal ``&&`` outside a class, which is legal in both dialects). Flags:
      * possessive quantifiers: an unescaped ``+`` directly after an
        unescaped quantifier terminator (``*`` ``+`` ``?`` ``}``) outside a
        class (lazy ``*?``/``+?`` stay legal — only a trailing ``+`` is
        possessive);
      * ``&&`` (both unescaped) inside a character class (Java intersection);
      * ``\\h \\H \\v \\V`` as real escapes (odd backslash run): ``\\h/\\H/\\V``
        do not compile under Python re, and ``\\v`` compiles but means
        vertical-TAB in Python vs vertical-whitespace CLASS in Java.
    """
    in_class = False
    prev_quant = False  # previous char: unescaped quantifier terminator
    prev_amp = False  # previous char: unescaped '&' inside a class
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "\\":
            nxt = pat[i + 1] if i + 1 < n else ""
            if nxt in "hHvV":
                return f"'\\{nxt}'"
            i += 2  # consume the escape; an escaped char is a plain literal
            prev_quant = prev_amp = False
            continue
        if in_class:
            if c == "&" and prev_amp:
                return "'&&' inside a character class"
            prev_amp = c == "&"
            if c == "]":
                in_class = False
                prev_amp = False
            i += 1
            continue
        if c == "[":
            in_class = True
            prev_quant = prev_amp = False
            i += 1
            continue
        if c == "+" and prev_quant:
            return "a possessive quantifier ('*+', '++', '?+' or '{..}+')"
        prev_quant = c in "*+?}"
        i += 1
    return None


@dataclass
class CrawlConfig:
    root: str                      # snapshot-table warehouse dir
    n_buckets: int = 32            # frontier hash buckets (4096 at 10^10)
    round_duration_s: float = 30.0 # virtual seconds per round
    priority_decay: float = 0.9    # child priority = parent · decay
    default_priority: float = 1.0
    max_attempts: int = 3          # T2/L6 (reference: 3 attempts)
    transient_fail_mod: int = 0    # 1/N of fetches fail transiently; 0 = off
    n_salts: int = 16              # W1 skew salting
    max_rounds: int = 50           # L5 page-cap analog
    empty_rounds_stop: int = 3     # A10 (reference k=3)
    bloom_fpp: float = 0.01
    bloom_min_keys: int = 10_000   # (retained knob; bloom is now always on)
    bloom_expected_keys: int = 2_000_000  # sizing for the incremental filter
    token_capacity_s: float = 120.0  # bucket capacity = rate · this
    adaptive_rate: bool = False    # T3: shrink/recover per-host budgets
    # T5: failed URLs re-enter the frontier after this many virtual seconds
    # (reference: 7-day failed-cache TTL, src/failed_issue_cache.py:31,52-59);
    # None = failures are terminal. On expiry the attempt count restarts.
    failure_ttl_s: float | None = None
    # T10: fetched URLs become re-eligible after this many virtual seconds
    # (reference: 30-day checkpoint staleness re-crawl,
    # src/checkpoint_manager.py:67-99); None = fetch-once.
    staleness_s: float | None = None
    # X10/X14/j4b: parse the embedded page-data JSON into a NESTED per-page
    # entities table (issue number/state + comments array — the reference's
    # repo -> PR -> comments data model, src/models.py:62-116)
    extract_entities: bool = False
    # F3: per-scope out-link predicates (reference src/pr_scraper.py:431-448 —
    # only same-repo /pull/N links survive discovery). Both act on CANONICAL
    # link + parent URLs, before dedup/anti-join:
    #   link_shape      — regex the link must contain (rlike / re.search)
    #   link_same_scope — regex with ONE capture group; the link is kept only
    #                     when its group-1 equals the parent page's group-1
    #                     (both must match — non-matching links are dropped)
    # REGEX SUBSET: the engine evaluates these with Java regex (rlike /
    # regexp_extract) while the simulator spec uses Python ``re`` — like the
    # canonicalize triple-implementation invariant, patterns must stay in the
    # Java∩Python common subset: literals, classes ``[...]``, alternation,
    # anchors, greedy/lazy quantifiers, ``\d \w \s``, plain groups. AVOID
    # possessive quantifiers (``*+``), class intersection (``[a&&[b]]``),
    # ``\h``/``\v``, and mid-pattern inline flags — Java-only; they would
    # silently diverge engine-vs-spec. ``__post_init__`` validates the
    # pattern compiles under Python ``re`` and rejects the Java-only tokens.
    link_shape: str | None = None
    link_same_scope: str | None = None
    # Fetch-join shape: True broadcasts the (small) scheduled batch against
    # the fetch index — the steady-state crawl, batch ≪ corpus. False
    # CO-PARTITIONS instead: the fetch index is persisted hash-partitioned
    # on url_hash and the batch is shuffled to the same partitioning, so the
    # join moves only the batch — the right shape when a round fetches a
    # large fraction of the corpus (batch-refresh crawls), where a driver
    # broadcast of the whole batch is itself a serial bottleneck.
    broadcast_fetch: bool = True
    # Broadcast the per-domain dim tables (host_state latest view, robots
    # rules) into the eligibility/robots joins. Right at sandbox scale and
    # for most real crawls (≤ a few million domains). At 10^7-10^8
    # registrable domains the forced broadcast would exceed driver memory —
    # set False and the joins become plain equi-joins on registrable_domain,
    # with AQE choosing broadcast/shuffle at runtime from actual sizes.
    # (budget_overrides stays broadcast unconditionally: it is an explicit
    # operator-supplied override list, small by construction.)
    broadcast_dims: bool = True
    # Fold the transitions delta back into the bucketed frontier every N
    # rounds (0 = only at crawl end). The per-round eligibility pass replays
    # the delta through a latest-wins window (_effective_frontier), so the
    # delta must stay O(recent rounds) on long crawls — without periodic
    # compaction it grows O(all state changes since the last compact) and
    # per-round cost creeps upward (round-3 verdict #2).
    compact_every_rounds: int = 8
    # Snapshot retention: after each periodic compaction, expire all but the
    # newest N manifests per table and delete orphaned data files (Iceberg
    # expireSnapshots). 0 = never expire (keeps full time-travel history —
    # the right default for tests/debugging; on a weeks-long production
    # crawl the manifest chain and superseded frontier rewrites otherwise
    # grow without bound). Must comfortably exceed the commits-per-round of
    # any table (≤2) times the rounds between compactions so resume's
    # rollback targets always survive; 32 is conservative for the default
    # compact_every_rounds=8.
    expire_snapshots_keep: int = 0
    # Broadcast the transitions-latest view into the per-round eligibility
    # join while the delta stays under this many rows (tracked driver-side:
    # exactly n_batch rows append per round, reset by compact()). The delta
    # is orders of magnitude smaller than the frontier between compactions,
    # so the explicit hint spares the frontier side its shuffle WRITE —
    # AQE's late SMJ->BHJ conversion only skips the exchange read. Past the
    # bound (or 0) the join falls back to AQE's runtime choice, which is
    # the right behavior when a 10^10-row crawl lets the delta grow huge.
    broadcast_transitions_max_rows: int = 2_000_000
    # Two-phase small rounds (broadcast_fetch mode): when the driver-side
    # active-row bound (seeds − rows gone terminal + rows discovered; a
    # TRUE upper bound on anything still schedulable, see run_round tail)
    # is at or under this, the round first collects the scheduled batch's
    # bucket histogram — one tiny job over the about-to-be-persisted batch.
    # Empty rounds then exit before the fetch/probe DAG is even built, and
    # tiny rounds prune the cached fetch index to the batch's buckets (the
    # index is range-clustered by __pbucket, so in-memory batch min/max
    # stats skip everything else without decompressing html). A real fetch
    # costs O(batch); with this the simulated one does too. Correctness
    # never depends on the bound: pruning always uses the batch's OWN
    # buckets. 0 disables (single combined action, no pre-probe).
    # Robots-disallowed rows — 'discovered' forever but never eligible —
    # are EXCLUDED from the bound (their count rides in the Bloom-fold
    # job), so a blocked-heavy corpus does not disarm the tail fast path.
    small_round_threshold: int = 5000
    # Robots TTL (rounds): every N rounds the crawler re-consults its
    # robots_provider and, for domains whose rules TEXT changed, re-verdicts
    # the active frontier rows of ONLY those domains (a transitions append
    # carrying robots_allowed — O(changed-domain rows), never a frontier
    # rewrite; folded at the next compact()). 0 disables (rules frozen at
    # init — the pre-round-5 behavior, and the bench default: a refresh that
    # finds no provider or no diff costs one dim-table compare). A real
    # crawler re-fetches robots.txt periodically; the reference never does
    # (robots is an engine addition per the north rule).
    robots_ttl_rounds: int = 0
    # Truncate the lineage of round-local materializations (localCheckpoint
    # instead of persist). The round builds 5 cached frames whose consumers
    # (appends, host fold, transition rows, discovery) otherwise each carry
    # the FULL logical tree back through the effective-frontier window —
    # round-5 event-log profile measured 5.4 s + 3.7 s driver gaps in ONE
    # tail round that were pure plan construction + re-analysis of those
    # trees (py4j chatter scales with tree size too). With truncation every
    # consumer plans against a flat LogicalRDD. Blocks are freed
    # deterministically at round end via a persistent-RDD-id diff (the
    # historical GC-pressure objection to localCheckpoint). Safe because
    # every stage is deterministic by construction; on executor loss a
    # truncated block cannot be recomputed, so a multi-node deployment that
    # expects preemption should flip this off (persist keeps full lineage).
    truncate_lineage: bool = True

    def __post_init__(self) -> None:
        # F3 regex subset validation (see the comment above link_shape):
        # compile under Python re (the simulator side) and reject Java-only
        # constructs textually; require exactly one capture group for
        # link_same_scope (its semantics compare group 1).
        import re as _re

        for name in ("link_shape", "link_same_scope"):
            pat = getattr(self, name)
            if pat is None:
                continue
            try:
                compiled = _re.compile(pat)
            except _re.error as e:
                raise ValueError(
                    f"CrawlConfig.{name}: pattern must compile under Python "
                    f"re (engine/simulator parity): {e}"
                ) from e
            tok = _scan_java_only_regex(pat)
            if tok is not None:
                raise ValueError(
                    f"CrawlConfig.{name}: {tok} is Java-regex-only and "
                    "diverges from the Python re simulator spec"
                )
            if name == "link_same_scope" and compiled.groups != 1:
                raise ValueError(
                    "CrawlConfig.link_same_scope needs exactly ONE capture "
                    f"group (got {compiled.groups}); group 1 is the scope key"
                )


FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("registrable_domain", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("next_fetch_ts", T.TimestampType()),
        T.StructField("state", T.StringType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("discovered_round", T.IntegerType()),
        # robots verdict is computed ONCE when a URL enters the frontier
        # (rules are static per crawl) — keeps the pandas UDF off the
        # per-round eligibility path, which stays pure column exprs
        T.StructField("robots_allowed", T.BooleanType()),
    ]
)


TRANSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("next_fetch_ts", T.TimestampType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("round", T.IntegerType()),
        # NULL on ordinary state transitions (verdict unchanged); set by the
        # robots-TTL refresh when a domain's rules change (coalesced into the
        # frontier view like the other columns, folded at compact())
        T.StructField("robots_allowed", T.BooleanType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("urls_fetched", T.LongType()),
        T.StructField("urls_deduped", T.LongType()),
        T.StructField("failures", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
    ]
)

ROUNDS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("completed", T.BooleanType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("discovered", T.LongType()),
        T.StructField("eligible", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("frontier_snap", T.LongType()),
        T.StructField("seen_snap", T.LongType()),
        T.StructField("results_snap", T.LongType()),
        T.StructField("host_snap", T.LongType()),
        T.StructField("metrics_snap", T.LongType()),
        T.StructField("transitions_snap", T.LongType()),
        T.StructField("entities_snap", T.LongType()),
    ]
)

# Nested per-page entities (X10/X14 + the j4b collect shape): one row per
# fetched page carrying the parsed issue struct — number, state, and the
# IssueComment-typed timeline nodes as a CHRONOLOGICALLY-sorted array of the
# full Comment struct (author, timestamp, content — reference
# src/models.py:38-42, sort at src/pr_scraper.py:721-722).
ENTITIES_DDL = (
    "url_hash BIGINT, url STRING, round INT, "
    "issue STRUCT<number: BIGINT, state: STRING, "
    "comments: ARRAY<STRUCT<author: STRING, timestamp: TIMESTAMP, "
    "content: STRING>>>"
)

# Schema of the embedded page-data payload written by sources/pages.py
# (the reference's preloadedQueries nesting, src/issue_scraper.py:408-505)
PAYLOAD_DDL = (
    "payload STRUCT<preloadedQueries: ARRAY<STRUCT<result: STRUCT<data: "
    "STRUCT<repository: STRUCT<issue: STRUCT<number: BIGINT, state: STRING, "
    "frontTimelineItems: STRUCT<edges: ARRAY<STRUCT<node: "
    "STRUCT<__typename: STRING, author: STRUCT<login: STRING>, "
    "createdAt: STRING, body: STRING>>>>>>>>>>>"
)


class Crawler:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig, pages: DataFrame,
                 robots: DataFrame | None = None,
                 budget_overrides: DataFrame | None = None,
                 robots_provider=None):
        """``budget_overrides`` (W2): optional ``(registrable_domain, budget)``
        table — the reference's per-repo limit map (REPOSITORY_PR_LIMITS,
        ``src/config.py:96-102``; applied ``src/aggressive_pr_scraper.py:
        144-151``). An override CAPS the token-derived budget (politeness
        still applies): ``host_budget = least(floor(tokens), override)``.
        Broadcast-joined once per round — at any scale this is a dim table.

        ``robots_provider`` (robots TTL): optional ``(round_k) -> DataFrame``
        returning the CURRENT robots dim; consulted every
        ``cfg.robots_ttl_rounds`` rounds (the re-fetch through the normal
        fetch path is simulated by the provider, as all fetching is in this
        sandbox). Mirrored in simulator.py — the CLAUDE.md invariant."""
        self.spark = spark
        self.cfg = cfg
        self.budget_overrides = budget_overrides
        self._robots_provider = robots_provider
        self.t = {
            name: SnapshotTable(cfg.root, name)
            for name in ("frontier", "transitions", "seen", "results", "host_state",
                         "metrics", "rounds", "entities")
        }
        # Fetch-simulation index: the pages corpus keyed by canonical-url
        # hash. Only url/warc_ts/html/lang are read (column pruning keeps
        # `text`, the oracle column, out of the scan). Persisted: the key is
        # computed once, not once per round. (On a real crawl this join IS
        # the network fetch — see operators/fetch.py — so nothing this size
        # is ever cached at 10^10; it exists only to simulate fetches.)
        self.pages_idx = pages.select(
            url_hash_expr(canonicalize_url_expr(F.col("url"))).alias("url_hash"),
            F.col("warc_ts"),
            F.col("html"),
            F.col("lang"),
        )
        if not cfg.broadcast_fetch:
            # co-partitioned fetch join (see CrawlConfig.broadcast_fetch):
            # the cached index carries HashPartitioning(url_hash, N), so the
            # per-round join shuffles ONLY the batch to match — the corpus
            # never moves and nothing is broadcast.
            # 8× parallelism (not 2×): the fetch-join partitioning is ALSO
            # the parse-stage granularity, and page cost is heavy-tailed —
            # at 2× a big round runs as one wave per core and the slowest
            # partition sets the wall (event-log: max task 127 s vs median
            # 51 s in a 16-task round-1 stage). 8× gives the greedy
            # scheduler ~8 waves to pack, which absorbs per-partition cost
            # variance at every cluster size.
            self._pages_parts = spark.sparkContext.defaultParallelism * 8
            self.pages_idx = self.pages_idx.repartition(
                self._pages_parts, "url_hash"
            )
        else:
            # Range-cluster the cached index by hash bucket so a small-round
            # fetch can prune it: each cached partition covers a contiguous
            # bucket span, and in-memory batch stats (min/max per column
            # batch) let `__pbucket IN (batch's buckets)` skip every other
            # partition without decompressing its html column. Tail rounds
            # of a converging crawl fetch a handful of URLs — scanning the
            # full corpus for them is the one place the simulation was LESS
            # scalable than a real fetch (O(corpus) vs O(batch) per round).
            # 8× parallelism for wave-packing — see the comment in the
            # co-partitioned branch above.
            self._pages_parts = spark.sparkContext.defaultParallelism * 8
            self.pages_idx = self.pages_idx.withColumn(
                "__pbucket", bucket_expr(F.col("url_hash"), cfg.n_buckets)
            ).repartitionByRange(self._pages_parts, "__pbucket", "url_hash")
        self.pages_idx = self.pages_idx.persist()
        # Driver-tracked transitions-delta cardinality (exactly n_batch rows
        # append per round; compact() truncates) — gates the broadcast hint
        # in _effective_frontier without a count() job.
        self._trans_rows = 0
        # Driver-tracked upper bound on rows that can still be scheduled
        # (the _active_state_pred set): seeds in, terminal transitions out
        # (only the ones terminal under the CURRENT T5/T10 config — TTL'd
        # failures / stale fetches stay counted), discoveries in. Gates the
        # small-round two-phase path; set by init_frontier (seed count) and
        # resume_round (_count_active_rows). None = unknown -> disabled.
        self._next_round_bound: int | None = None
        self.robots = robots
        # Driver-side frontier-cardinality counter (sizes the Bloom build
        # without a count() job per round); set by init_frontier/resume.
        self._known_count = 0
        # Last round scheduled nothing -> next round probes batch emptiness
        # cheaply before running the full stats DAG (empty-round fast path)
        self._prev_round_empty = False
        # Incrementally-maintained URL-seen Bloom (built once past
        # bloom_min_keys, then add_np per round; reset on init/resume)
        self._bloom = None
        # pre-round pinned-RDD snapshot for _release_round_blocks (set at
        # each run_round start when truncate_lineage is on)
        self._round_base_rdd_ids: set[int] | None = None
        # the fetch-index cache has been physically materialized (so its RDD
        # id is registered and can never be mistaken for a round-local block
        # by the release diff — see run_round's pre-snapshot force)
        self._pages_idx_forced = False

    def _empty_bloom(self):
        cfg = self.cfg
        return PartitionedBloom.empty(
            n_buckets=cfg.n_buckets,
            expected_per_bucket=max(1000, cfg.bloom_expected_keys // cfg.n_buckets),
            fpp=cfg.bloom_fpp,
        )

    # ------------------------------------------------------------------ time
    def now(self, round_no: int) -> dt.datetime:
        return EPOCH + dt.timedelta(seconds=round_no * self.cfg.round_duration_s)

    # ------------------------------------------------------------------ init
    def init_frontier(self, seeds: DataFrame) -> None:
        """Seeds -> canonical frontier rows; bootstrap all engine tables."""
        cfg, now0 = self.cfg, self.now(0)
        self.spark.sparkContext.setJobDescription("init_frontier")
        self._prev_round_empty = False
        canon = canonicalize_url_expr(F.col("url"))
        fr = (
            seeds.select(
                canon.alias("url"),
                F.coalesce(F.col("priority"), F.lit(cfg.default_priority)).alias("priority"),
            )
            .withColumn("url_hash", url_hash_expr(F.col("url")))
            .withColumn("bucket", bucket_expr(F.col("url_hash"), cfg.n_buckets))
            .withColumn("host", host_expr(F.col("url")))
            .withColumn("registrable_domain", registrable_domain_expr(F.col("host")))
            .withColumn("next_fetch_ts", F.lit(now0))
            .withColumn("state", F.lit("discovered"))
            .withColumn("attempt", F.lit(0).cast("int"))
            .withColumn("discovered_round", F.lit(0).cast("int"))
            .transform(self._with_robots_allowed)
            # deterministic dedup of seed duplicates: keep max priority
            .withColumn("priority", F.max("priority").over(Window.partitionBy("url_hash")))
            .dropDuplicates(["url_hash"])
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )
        # ONE materialization of the seed pipeline (canonicalize + robots
        # join + dedup window): the frontier write, the host_state domain
        # scan, and the Bloom seed-fold below all reuse the cached result.
        # The old shape ran the full plan three times SEQUENTIALLY (the
        # Bloom fold even re-read the just-written parquet) — a ~10 s
        # parallelism-independent bootstrap floor inside the timed window
        # at sandbox scale, and three redundant passes over 10^8-row seed
        # lists at production scale.
        fr = fr.persist()
        try:
            # Written with partition overwrite so EVERY frontier file is
            # bucketed: later per-round overwrite_partitions can only
            # replace bucketed files. This first action populates the cache.
            self.t["frontier"].overwrite_partitions(
                fr, "bucket", {"op": "init"}, replace_all=True
            )

            # The remaining bootstrap commits are mutually independent and
            # all read only the cached `fr` (or nothing): overlap them so
            # the bootstrap floor is max(), not sum(). Thread-safe for the
            # same reason the per-round commit pool is: each SnapshotTable
            # commit is independent and atomic, and `rounds` (the resume
            # barrier) is only bootstrapped after every future resolves.
            pool = ThreadPoolExecutor(max_workers=4)
            futs = [
                # seen carries the same hash bucket as the frontier; every
                # append is partitioned by it so the discovery backstop can
                # prune to suspect buckets (round-1 verdict #3). Empty-table
                # bootstraps are schema-only manifest commits — no Spark
                # write job each.
                pool.submit(
                    self.t["seen"].init_empty,
                    "url_hash BIGINT, bucket INT, crawl_ts TIMESTAMP",
                    {"op": "init"},
                ),
                pool.submit(
                    self.t["results"].init_empty,
                    "url STRING, url_hash BIGINT, warc_ts TIMESTAMP, "
                    "status STRING, text STRING, lang STRING, round INT",
                    {"op": "init"},
                ),
                pool.submit(self.t["entities"].init_empty, ENTITIES_DDL, {"op": "init"}),
                # host_state: one row per registrable domain seen so far;
                # rate from robots crawl_delay (reference analog: 0.1 s/req,
                # src/config.py:81). Append-only thereafter: rounds append
                # only touched domains (see _read_host_state), compact()
                # folds. asof_round=-1 so a domain touched in round 0 (which
                # appends an asof_round=0 row) never ties with its init row
                # in the latest-wins window; the lazy refill is unaffected
                # because init tokens start at capacity (already pinned at
                # the cap, extra elapsed time is a no-op).
                pool.submit(
                    self.t["host_state"].overwrite,
                    self._new_host_rows(
                        fr.select("registrable_domain").distinct(), asof_round=-1
                    ),
                    {"op": "init"},
                ),
            ]

            # distributed fold of the seed keys into the fresh Bloom; the
            # returned key count doubles as the frontier cardinality (no
            # separate count job). Folded from the cached `fr` — the written
            # frontier holds exactly these rows by construction, so the old
            # read-back of the fresh parquet was a redundant scan.
            if self._bloom is not None:
                self._bloom.close()  # release superseded broadcast handles
            self._bloom = self._empty_bloom()
            self._known_count, n_blocked = self._bloom.add_df(
                fr.select("url_hash", "robots_allowed"),
                false_count_of="robots_allowed",
            )
            for f in futs:
                f.result()
            pool.shutdown()
        finally:
            fr.unpersist(blocking=False)
        # every allowed seed starts 'discovered': the active-row bound that
        # gates the small-round fast path starts at the (deduped) seed count
        # MINUS robots-blocked rows — those stay 'discovered' forever but can
        # never become eligible, and counting them would disarm the tail
        # fast path permanently on a blocked-heavy corpus. The blocked count
        # rides in the same Bloom-fold job (no extra action).
        self._next_round_bound = self._known_count - n_blocked
        self._trans_rows = 0
        self.t["transitions"].append_local([], TRANSITIONS_SCHEMA, {"op": "init"}, overwrite=True)
        self.t["metrics"].append_local([], METRICS_SCHEMA, {"op": "init"}, overwrite=True)
        self.t["rounds"].append_local([], ROUNDS_SCHEMA, {"op": "init"}, overwrite=True)

    def _effective_frontier(self, frontier: DataFrame, trans: DataFrame) -> DataFrame:
        """Frontier rows with the latest transition applied (latest-wins by
        round; a URL transitions at most once per round, so this is total).

        While the delta is small (driver-tracked row count vs
        broadcast_transitions_max_rows) the latest view is broadcast: the
        frontier side then never shuffles — without the hint the planner
        SMJs and even AQE's late BHJ conversion has already paid the
        frontier's shuffle WRITE (O(frontier) rows × full width, every
        round). Past the bound AQE decides from real sizes."""
        w = Window.partitionBy("url_hash").orderBy(F.col("round").desc())
        hint = (
            self.cfg.broadcast_transitions_max_rows > 0
            and self._trans_rows <= self.cfg.broadcast_transitions_max_rows
        )
        # Two DISJOINT latest-wins views: state transitions own state/nft/
        # attempt (robots_allowed NULL on every regular row), robots-TTL
        # refresh rows own robots_allowed (state fields NULL). A refresh and
        # a fetch can land in the SAME round for the same url_hash; a single
        # latest-wins over both would tie on `round` and pick a winner
        # nondeterministically — a fetched row could revert to 'discovered'
        # (caught by the robots-TTL e2e equivalence test, round 5).
        latest = (
            trans.filter(F.col("robots_allowed").isNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "url_hash",
                F.col("state").alias("__t_state"),
                F.col("next_fetch_ts").alias("__t_nft"),
                F.col("attempt").alias("__t_attempt"),
            )
        )
        rob = (
            trans.filter(F.col("robots_allowed").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("url_hash", F.col("robots_allowed").alias("__t_rob"))
        )
        if hint:
            latest = F.broadcast(latest)
            rob = F.broadcast(rob)
        out = (
            frontier.join(latest, "url_hash", "left")
            .withColumn("state", F.coalesce(F.col("__t_state"), F.col("state")))
            .withColumn("next_fetch_ts", F.coalesce(F.col("__t_nft"), F.col("next_fetch_ts")))
            .withColumn("attempt", F.coalesce(F.col("__t_attempt"), F.col("attempt")))
            .drop("__t_state", "__t_nft", "__t_attempt")
        )
        if self.cfg.robots_ttl_rounds > 0:
            # the robots view only exists when TTL can write it — every
            # other config keeps the exact pre-round-5 single-join plan
            out = (
                out.join(rob, "url_hash", "left")
                .withColumn(
                    "robots_allowed",
                    F.coalesce(F.col("__t_rob"), F.col("robots_allowed")),
                )
                .drop("__t_rob")
            )
        return out

    def _active_state_pred(self):
        """States that can still become eligible (terminal states depend on
        the T5/T10 knobs: TTL'd failures and staleness-re-crawled fetches
        are NOT terminal when those features are on)."""
        cfg = self.cfg
        pred = F.col("state") == "discovered"
        if cfg.failure_ttl_s is not None:
            pred = pred | (F.col("state") == "failed")
        if cfg.staleness_s is not None:
            pred = pred | (F.col("state") == "fetched")
        return pred

    def compact(self) -> None:
        """Fold the transitions delta into the bucketed frontier (the Iceberg
        MERGE/compaction step): one full-table write every N rounds instead of
        one per round; the delta table is truncated afterwards.

        Terminal rows (fetched/failed that can never re-enter under the
        current T5/T10 config) migrate to ARCHIVE partitions — same table,
        partition value ``bucket + n_buckets``. The per-round eligibility
        scan then reads only the active partitions (round-1 verdict #6: the
        frontier scan was O(ever-discovered) per round; at steady state the
        active set is orders of magnitude smaller), while the dedup
        backstop's known_loader still sees archived keys by reading the
        {b, b+n_buckets} partition pair per suspect bucket.

        The bucket offset is recomputed from the CURRENT config each time
        (idempotent: the true bucket is re-derived from url_hash), so after
        flipping failure_ttl_s/staleness_s on an existing warehouse, one
        compact() re-admits newly-eligible archived rows."""
        cfg = self.cfg
        self.spark.sparkContext.setJobDescription("compact")
        trans = self.t["transitions"].read(self.spark)
        frontier = self.t["frontier"].read(self.spark)
        merged = self._effective_frontier(frontier, trans).select(
            [f.name for f in FRONTIER_SCHEMA.fields]
        )
        # normalize to the true bucket first (idempotent across compactions),
        # then offset terminal rows into the archive partition range
        true_bucket = bucket_expr(F.col("url_hash"), cfg.n_buckets)
        merged = merged.withColumn(
            "bucket",
            F.when(self._active_state_pred(), true_bucket)
            .otherwise(true_bucket + F.lit(cfg.n_buckets))
            .cast("int"),
        )
        self.t["frontier"].overwrite_partitions(
            merged, "bucket", {"op": "compact"}, replace_all=True
        )
        self.t["transitions"].append_local([], TRANSITIONS_SCHEMA, {"op": "compact"},
                                           overwrite=True)
        self._trans_rows = 0  # delta truncated -> broadcast hint re-armed
        # fold the host_state delta the same way: one row per domain again
        # (asof_round kept — lazy refill keeps reading from it)
        self.t["host_state"].overwrite(
            self._read_host_state().select(*self.HOST_COLS), {"op": "compact"}
        )
        # seen gains one file per bucket per round; bin-pack the buckets that
        # accumulated many small appends so the dedup backstop's pruned reads
        # stay O(few files) per suspect bucket on long crawls
        self.t["seen"].compact_small_files(self.spark, "bucket")

    def _read_active_frontier(self) -> DataFrame:
        """Frontier rows that can still become eligible: partition-pruned to
        the active bucket range (appends and pre-archive rows are bucketed
        0..n_buckets-1; archived terminal rows live at +n_buckets and are
        skipped file-level)."""
        return self.t["frontier"].read_partitions(
            self.spark, "bucket", list(range(self.cfg.n_buckets))
        )

    def _with_robots_allowed(self, df: DataFrame) -> DataFrame:
        """Stamp the once-per-URL robots verdict (df has registrable_domain, url)."""
        if self.robots is None:
            return df.withColumn("robots_allowed", F.lit(True))
        rules = self.robots.select("registrable_domain", "robots_rules")
        if self.cfg.broadcast_dims:
            rules = F.broadcast(rules)
        return (
            df.join(rules, "registrable_domain", "left")
            .withColumn(
                "robots_allowed",
                F.coalesce(
                    robots_allowed_udf(F.col("robots_rules"), F.col("url")), F.lit(True)
                ),
            )
            .drop("robots_rules")
        )

    def _refresh_robots(self, k: int) -> None:
        """Robots TTL re-fetch: pull the current rules dim from the provider,
        diff against the held rules, and re-verdict the ACTIVE frontier rows
        of only the CHANGED domains via a transitions append carrying the new
        ``robots_allowed`` (state/nft/attempt are copied from the effective
        row so latest-wins does not shadow an earlier real transition).

        Scale shape: robots is a dim table on both sides of the diff, the
        re-verdict join is broadcast-changed-domains × active frontier
        (O(rows of changed domains), never a frontier rewrite), and the
        verdicts fold into the frontier at the next compact() like any other
        transition. Crash-safety is free: the append rides this round's
        snapshot chain, so a mid-round failure rolls it back with the round
        and the re-run repeats the refresh deterministically.

        Rules-TEXT changes only — a domain's crawl_delay (and so its token
        rate) stays as first fetched, mirrored by the simulator, which also
        leaves existing host rates untouched on refresh."""
        spark = self.spark
        new = self._robots_provider(k)
        if new is None or self.robots is None:
            if new is not None:
                self.robots = new
            return
        old_rules = self.robots.select(
            "registrable_domain", F.col("robots_rules").alias("__old_rules")
        )
        changed = (
            new.select("registrable_domain", "robots_rules")
            .join(old_rules, "registrable_domain", "full_outer")
            .filter(
                F.coalesce(F.col("robots_rules"), F.lit(""))
                != F.coalesce(F.col("__old_rules"), F.lit(""))
            )
            .select(
                "registrable_domain",
                F.coalesce(F.col("robots_rules"), F.lit("")).alias("robots_rules"),
            )
        )
        self.robots = new  # newly-discovered domains verdict under new rules
        changed = changed.persist()
        try:
            if changed.limit(1).count() == 0:
                return
            eff = self._effective_frontier(
                self._read_active_frontier(), self.t["transitions"].read(spark)
            ).filter(self._active_state_pred())
            flips = (
                eff.join(F.broadcast(changed), "registrable_domain")
                .select(
                    "url_hash",
                    F.col("robots_allowed").alias("__old_v"),
                    robots_allowed_udf(F.col("robots_rules"), F.col("url")).alias("__new_v"),
                )
                .filter(F.col("__new_v") != F.col("__old_v"))
                .persist()
            )
            try:
                stats = flips.agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("__new_v").cast("int")).alias("n_allowed"),
                ).collect()[0]
                n_flips = int(stats["n"] or 0)
                if n_flips == 0:
                    return
                # verdict-only rows: state/nft/attempt stay NULL so the
                # refresh can never shadow (or tie with) a real state
                # transition — _effective_frontier reads robots through its
                # own latest-wins view
                self.t["transitions"].append(
                    flips.select(
                        "url_hash",
                        F.lit(None).cast("string").alias("state"),
                        F.lit(None).cast("timestamp").alias("next_fetch_ts"),
                        F.lit(None).cast("int").alias("attempt"),
                        F.lit(k).cast("int").alias("round"),
                        F.col("__new_v").alias("robots_allowed"),
                    ),
                    {"round": k, "op": "robots_refresh"},
                )
                self._trans_rows += n_flips
                # the active-row bound must never under-predict: newly
                # ALLOWED rows join the schedulable set (add them); newly
                # blocked rows only make it more of an over-estimate
                if self._next_round_bound is not None:
                    self._next_round_bound += int(stats["n_allowed"] or 0)
            finally:
                flips.unpersist()
        finally:
            changed.unpersist()

    def _new_host_rows(self, domains: DataFrame, asof_round: int) -> DataFrame:
        cfg = self.cfg
        if self.robots is not None:
            rob = F.broadcast(self.robots) if self.cfg.broadcast_dims else self.robots
            joined = domains.join(rob, "registrable_domain", "left")
        else:
            joined = domains.withColumn("robots_rules", F.lit(None).cast("string")).withColumn(
                "crawl_delay_ms", F.lit(100).cast("long")
            )
        rate = F.lit(1000.0) / F.coalesce(F.col("crawl_delay_ms"), F.lit(100)).cast("double")
        return joined.select(
            "registrable_domain",
            F.coalesce(F.col("robots_rules"), F.lit("")).alias("robots_rules"),
            F.coalesce(F.col("crawl_delay_ms"), F.lit(100)).alias("crawl_delay_ms"),
            (rate * cfg.token_capacity_s).alias("tokens"),
            rate.alias("refill_rate"),
            rate.alias("base_refill_rate"),
            (rate * cfg.token_capacity_s).alias("capacity"),
            F.lit(None).cast("timestamp").alias("blocked_until"),
            F.lit(0).cast("int").alias("failure_count"),
            F.lit(asof_round).cast("int").alias("asof_round"),
        )

    HOST_COLS = (
        "registrable_domain", "robots_rules", "crawl_delay_ms", "tokens",
        "refill_rate", "base_refill_rate", "capacity", "blocked_until",
        "failure_count", "asof_round",
    )

    def _read_host_state(self) -> DataFrame:
        """Latest host row per registrable_domain (latest-wins by asof_round).

        host_state is **append-only deltas** (round-3 verdict #3): each round
        appends ONLY the domains it actually touched, stamped with the round;
        compact() folds the deltas into one row per domain. Tokens are
        refilled LAZILY at read time — ``min(cap, t + r·Δ)`` iterated once
        per round equals a single capped refill over the total elapsed time
        (if ``t + r ≥ cap`` the iterate pins at cap, and ``t + k·r ≥ cap``
        for every later k), and untouched hosts change in NO other way per
        round (adapt/breaker are identity on zero outcomes; e2e asserts
        engine == simulator outcomes), so skipping their rewrite is exact.

        Plan shape at scale: the BASE (one row per domain, written by the
        last init/compact overwrite) is never windowed or shuffled — only
        the appended delta (O(touched domains since last compact)) goes
        through the latest-wins window, and the base is anti-joined against
        the delta's (small, broadcastable) domain set. At 10^8 domains the
        old whole-table window was a ~20 GB shuffle per round; this is
        O(delta)."""
        base, delta = self.t["host_state"].split_base_delta(self.spark)
        if delta is None:
            return base
        w = Window.partitionBy("registrable_domain").orderBy(F.col("asof_round").desc())
        delta_latest = (
            delta.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return base.join(
            delta_latest.select("registrable_domain"), "registrable_domain", "left_anti"
        ).unionByName(delta_latest)

    # ---------------------------------------------------------------- resume
    def resume_round(self) -> int:
        """Next round to run; rolls tables back to the last completed round's
        recorded snapshots (exactly-once semantics, SURVEY.md T6)."""
        rounds = self.t["rounds"].read(self.spark)
        self._prev_round_empty = False
        last = (
            rounds.filter(F.col("completed"))
            .orderBy(F.col("round").desc())
            .limit(1)
            .collect()
        )
        if self._bloom is not None:
            self._bloom.close()
            self._bloom = None
        if not last:
            self._known_count = self.t["frontier"].read(self.spark).count()
            self._trans_rows = self.t["transitions"].read(self.spark).count()
            self._next_round_bound = self._count_active_rows()
            self._bloom = PartitionedBloom.build(
                self.t["frontier"].read(self.spark), "url_hash",
                n_buckets=self.cfg.n_buckets,
                expected_per_bucket=max(1000, self.cfg.bloom_expected_keys // self.cfg.n_buckets),
                fpp=self.cfg.bloom_fpp,
            )
            return 0
        row = last[0]
        for name, col in (
            ("frontier", "frontier_snap"), ("seen", "seen_snap"),
            ("results", "results_snap"), ("host_state", "host_snap"),
            ("metrics", "metrics_snap"), ("transitions", "transitions_snap"),
            ("entities", "entities_snap"),
        ):
            if self.t[name].current_snapshot_id() != row[col]:
                self.t[name].rollback(row[col])
        self._known_count = self.t["frontier"].read(self.spark).count()
        self._trans_rows = self.t["transitions"].read(self.spark).count()
        self._next_round_bound = self._count_active_rows()
        # one distributed rebuild on resume; incremental add_np thereafter
        known = self.t["frontier"].read(self.spark).select("url_hash").unionByName(
            self.t["seen"].read(self.spark).select("url_hash")
        )
        self._bloom = PartitionedBloom.build(
            known, "url_hash", n_buckets=self.cfg.n_buckets,
            expected_per_bucket=max(1000, self.cfg.bloom_expected_keys // self.cfg.n_buckets),
            fpp=self.cfg.bloom_fpp,
        )
        return int(row["round"]) + 1

    def _count_active_rows(self) -> int:
        """Exact count of rows the scheduler can still see (active
        partitions, latest transition applied, active-state predicate) —
        re-arms the small-round fast path after a resume, where the
        incrementally-maintained bound is otherwise unknown. Production
        crawls run mostly in resumed sessions, so one extra count job here
        (resume already pays two counts and a Bloom rebuild) keeps the
        O(batch) tail-round behavior across restarts."""
        return int(
            self._effective_frontier(
                self._read_active_frontier(), self.t["transitions"].read(self.spark)
            )
            .filter(self._active_state_pred() & F.col("robots_allowed"))
            .count()
        )

    def _commit_empty_round(self, k: int, t_start: float) -> dict:
        """Nothing eligible: record the round for resume/termination
        bookkeeping. No host_state write at all — token refill is LAZY
        (computed from asof_round at read time, see _read_host_state), and
        an empty round changes nothing else (adapt/breaker are no-ops on
        zero outcomes, failure_count < threshold between rounds by the
        trip-reset invariant)."""
        self._prev_round_empty = True
        host_snap = self.t["host_state"].current_snapshot_id()
        wall_ms = int((time.monotonic() - t_start) * 1000)
        snaps = {
            n: self.t[n].current_snapshot_id()
            for n in ("frontier", "seen", "results", "transitions", "entities")
        }
        metrics_snap = self.t["metrics"].append_local(
            [(k, "fetch", -1, 0, 0, 0, wall_ms, snaps["frontier"])],
            METRICS_SCHEMA,
            {"round": k},
        )
        self.t["rounds"].append_local(
            [(k, True, 0, 0, 0, 0, wall_ms, snaps["frontier"], snaps["seen"],
              snaps["results"], host_snap, metrics_snap, snaps["transitions"],
              snaps["entities"])],
            ROUNDS_SCHEMA,
            {"round": k},
        )
        return {
            "round": k, "eligible": 0, "fetched": 0, "transient": 0,
            "missing": 0, "links": 0, "new": 0, "wall_ms": wall_ms,
        }

    def _persistent_rdd_ids(self) -> set[int]:
        """Ids of every RDD currently pinned in the block manager (includes
        localCheckpoint blocks, which DataFrame.unpersist cannot reach)."""
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    def _release_round_blocks(self, cached: list) -> None:
        """Free the round's cached working set. Persisted frames unpersist
        directly; truncated (localCheckpoint) frames are freed by diffing
        persistent RDD ids against the snapshot taken at round start — the
        deterministic release that makes lineage truncation memory-safe
        across long crawls. Long-lived caches (the fetch index, resume-time
        reads) predate the round and are never in the diff."""
        for df in cached:
            df.unpersist(blocking=False)
        if self.cfg.truncate_lineage and self._round_base_rdd_ids is not None:
            jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
            for key in jmap.keySet().toArray():
                if int(key) not in self._round_base_rdd_ids:
                    jmap.get(key).unpersist(False)
            self._round_base_rdd_ids = None

    def _finish_no_batch(self, k: int, t_start: float, cached: list,
                         current: DataFrame) -> dict:
        """Nothing scheduled this round: release the round's persisted
        working set, probe whether ANY row can ever become eligible again
        (A10 drained fast path — the caller stops immediately and skips the
        bookkeeping commit), else record an empty round."""
        self._release_round_blocks(cached)
        drained = current.filter(self._active_state_pred()).limit(1).count() == 0
        if drained:
            wall_ms = int((time.monotonic() - t_start) * 1000)
            return {
                "round": k, "eligible": 0, "fetched": 0, "transient": 0,
                "missing": 0, "links": 0, "new": 0, "wall_ms": wall_ms,
                "drained": True,
            }
        return self._commit_empty_round(k, t_start)

    # ----------------------------------------------------------------- round
    def run_round(self, k: int) -> dict:
        cached: list = []
        if self.cfg.truncate_lineage and not self._pages_idx_forced:
            # ADVICE r5 (medium): persist() registers its RDD id only at
            # first PHYSICAL execution — if the long-lived fetch-index cache
            # first materializes inside this round's fetch join, the
            # round-end persistent-RDD-id diff would classify it as
            # round-local and silently unpersist it, recomputing the corpus
            # pipeline on every later round's scan (crawl.py / e2e entry
            # points; bench.py pre-forces it with a count). Materialize it
            # BEFORE the base snapshot, once per crawler — a cache-only scan
            # when a caller already forced it.
            self.pages_idx.count()
            self._pages_idx_forced = True
        # snapshot of pre-round pinned RDDs: _release_round_blocks frees
        # exactly what this round checkpoints, nothing else
        self._round_base_rdd_ids = (
            self._persistent_rdd_ids() if self.cfg.truncate_lineage else None
        )
        try:
            return self._run_round_impl(k, cached)
        except BaseException:
            # ADVICE r5 (low): without this, an exception mid-round leaks the
            # round's localCheckpoint blocks — and the NEXT round's base
            # snapshot would adopt the leaked ids as pre-existing, so they
            # would never be deterministically freed (only by JVM GC, the
            # erratic-memory failure mode the diff mechanism prevents).
            self._release_round_blocks(cached)
            raise

    def _run_round_impl(self, k: int, cached: list) -> dict:
        cfg, spark = self.cfg, self.spark
        now = self.now(k)
        now_lit = F.lit(now)
        t_start = time.monotonic()
        prof: dict[str, float] = {}
        _last = [t_start]

        def tick(stage: str) -> None:
            t = time.monotonic()
            prof[stage] = round(t - _last[0], 2)
            _last[0] = t

        def jd(name: str) -> None:
            # label jobs per crawl phase (thread-local, so the commit pool
            # labels its own) — makes event-log/gap attribution readable
            spark.sparkContext.setJobDescription(f"r{k}:{name}")

        def materialize(df: DataFrame) -> DataFrame:
            """Cache a round-local frame; released at round end.

            truncate_lineage=True (default): lazy localCheckpoint — the data
            is cached exactly like persist, but every downstream consumer
            plans against a flat LogicalRDD instead of re-carrying (and
            re-analyzing, and re-shipping over py4j) the full logical tree
            through the effective-frontier window. Blocks are freed
            deterministically at round end via the persistent-RDD-id diff in
            _release_round_blocks, so the historical objection (checkpoint
            blocks freed only by GC -> erratic JVM memory pressure across
            many rounds) no longer applies.

            truncate_lineage=False: plain persist/unpersist — full lineage
            kept for recompute-on-executor-loss deployments."""
            if cfg.truncate_lineage:
                df = df.localCheckpoint(eager=False)
            else:
                df = df.persist()
            cached.append(df)
            return df

        # Robots TTL (round-4 verdict item #5): refresh rules BEFORE
        # eligibility so this round already schedules under the new verdicts
        # (simulator.py mirrors at the identical point in its run_round).
        if (
            cfg.robots_ttl_rounds > 0
            and k > 0
            and k % cfg.robots_ttl_rounds == 0
            and self._robots_provider is not None
        ):
            self._refresh_robots(k)
            tick("robots_refresh")

        # Eligibility only ever needs rows that can still become eligible —
        # archived terminal rows (bucket ≥ n_buckets since the last compact)
        # are pruned file-level here; the dedup known-set below still reads
        # them via the {b, b+n_buckets} partition pair.
        frontier = self._read_active_frontier()
        trans = self.t["transitions"].read(spark)
        # one computation of the base/delta latest-wins view per round: the
        # eligibility join, the touched-host fold, and the new-domain
        # anti-join all reuse the persisted result instead of re-running
        # the split-read plan three times
        jd("eligibility")
        host_state = materialize(self._read_host_state())

        # 1-2. eligibility + politeness gates (latest-wins over the delta) --
        # T5: expired failures re-enter (their next_fetch_ts was stamped
        # now+TTL at failure time); T10: stale fetched rows re-enter (stamped
        # now+staleness at fetch time). Both are plain predicates on columns
        # the transition already wrote — no extra join or clock table.
        current = self._effective_frontier(frontier, trans)
        state_ok = F.col("state") == "discovered"
        if cfg.failure_ttl_s is not None:
            state_ok = state_ok | (F.col("state") == "failed")
        if cfg.staleness_s is not None:
            state_ok = state_ok | (F.col("state") == "fetched")
        elig = (
            current.filter(
                state_ok
                & (F.col("next_fetch_ts") <= now_lit)
                & F.col("robots_allowed")
            )
            .join(
                F.broadcast(host_state) if cfg.broadcast_dims else host_state,
                "registrable_domain",
                "left",
            )
            .filter(F.col("blocked_until").isNull() | (F.col("blocked_until") <= now_lit))
        )
        # 3. token-bucket budget -> skew-safe rank -------------------------
        # LAZY refill: tokens in host_state are as-of asof_round (the last
        # round that touched the host); refill covers the whole gap in one
        # capped step — exactly equal to per-round iteration (cap commutes,
        # see _read_host_state) — so untouched hosts never need a rewrite.
        lazy_elapsed = (
            (F.lit(k) - F.col("asof_round")).cast("double") * F.lit(cfg.round_duration_s)
        )
        avail = refill_tokens(
            F.col("tokens"), F.col("refill_rate"), lazy_elapsed, F.col("capacity")
        )
        budget = F.floor(avail).cast("int")
        if self.budget_overrides is not None:  # W2: per-domain cap
            elig = elig.join(
                F.broadcast(
                    self.budget_overrides.select(
                        "registrable_domain",
                        F.col("budget").cast("int").alias("__override_budget"),
                    )
                ),
                "registrable_domain",
                "left",
            )
            budget = F.least(budget, F.coalesce(F.col("__override_budget"), budget))
        elig = elig.withColumn("host_budget", budget).filter(
            F.col("host_budget") >= 1
        )
        batch = rank_fetch_batch(elig, n_salts=cfg.n_salts).select(
            "url", "url_hash", "bucket", "host", "registrable_domain",
            "priority", "next_fetch_ts", "attempt", "discovered_round",
        )
        batch = materialize(batch)  # reused 4×

        # Two-phase small rounds (round-4 floor cut): when the driver-side
        # active-row bound says everything still schedulable fits in a tiny
        # batch, collect the batch ITSELF (bounded ≤ threshold rows by the
        # same driver-tracked bound that armed the path) BEFORE the
        # fetch/probe DAG exists. Empty rounds exit immediately; tiny rounds
        # (a) prune the range-clustered cached corpus to the batch's own
        # buckets — in-memory batch min/max stats then skip every other
        # cached partition, so a 1-URL tail round costs O(batch) instead of
        # O(corpus) (a real network fetch is O(batch); the simulation was
        # the one place LESS scalable than reality) — and (b) rebuild the
        # batch as a LocalRelation, which collapses every downstream plan
        # that references it (broadcast fetch join, missing anti-join,
        # per-host fold, transition rows) to a trivial local node. Tail
        # rounds are dominated by parallelism-independent DRIVER cost
        # (per-round Catalyst analysis + codegen — round literals defeat the
        # plan cache), profiled at ~5.5 s for a 1-URL round; shrinking the
        # plans is the only lever that cost responds to. Heavy rounds (the
        # common case mid-crawl) never take this branch and pay nothing.
        pages_src = self.pages_idx
        small = (
            cfg.small_round_threshold > 0
            and cfg.broadcast_fetch
            and self._next_round_bound is not None
            and self._next_round_bound <= cfg.small_round_threshold
        )
        if small:
            # Round-trip next_fetch_ts as epoch MICROS, not TimestampType:
            # Row conversion goes through the Python driver's LOCAL timezone
            # (fromInternal/toInternal), and spark.sql.session.timeZone=UTC
            # does not pin the driver process TZ — on a DST-observing host a
            # ts in the fold-back hour could shift an hour and silently
            # diverge engine-vs-simulator. Integer micros are exact.
            batch_long = batch.withColumn(
                "next_fetch_ts", F.unix_micros(F.col("next_fetch_ts"))
            )
            batch_schema = batch_long.schema
            jd("small_probe")
            batch_rows = batch_long.collect()
            tick("small_probe")
            if not batch_rows:
                return self._finish_no_batch(k, t_start, cached, current)
            batch = spark.createDataFrame(
                batch_rows, schema=batch_schema
            ).withColumn(
                "next_fetch_ts", F.timestamp_micros(F.col("next_fetch_ts"))
            )
            pages_src = pages_src.filter(
                F.col("__pbucket").isin(
                    sorted({int(r["bucket"]) for r in batch_rows})
                )
            )
        # Empty-round fast path (round-3 ADVICE): while waiting out backoffs
        # the batch is empty round after round, but the combined stats action
        # below still runs the full fetch-join/explode/probe DAG (with
        # broadcast_fetch=False that shuffles against the persisted corpus
        # each time). After any empty round, probe cheaply FIRST — one
        # limit(1) job over the already-persisted batch — and skip straight
        # to the drained/empty-commit path. Non-empty rounds (the common
        # case) never pay the extra job. (The small-round histogram above
        # already answered emptiness when it ran.)
        elif self._prev_round_empty and batch.limit(1).count() == 0:
            return self._finish_no_batch(k, t_start, cached, current)

        # 4-5. fetch (simulated from the pages corpus) + extract -----------
        if cfg.broadcast_fetch:
            hit = pages_src.join(F.broadcast(batch), "url_hash", "inner")
        else:
            # shuffle only the batch onto the index's partitioning; the
            # shuffle_hash hint keeps AQE from re-sorting the cached corpus
            # (SMJ) or pulling the batch to the driver (broadcast)
            hit = pages_src.join(
                batch.repartition(self._pages_parts, "url_hash").hint("shuffle_hash"),
                "url_hash",
                "inner",
            )
        hit = hit.drop("__pbucket")  # clustering key; absent in co-partitioned mode
        if cfg.transient_fail_mod > 1:
            transient = (
                F.pmod(
                    F.xxhash64(F.concat(F.col("url"), F.col("attempt").cast("string"))),
                    F.lit(cfg.transient_fail_mod),
                )
                == 0
            )
        else:
            transient = F.lit(False)
        # One materialization for the whole fetch+extract stage: status,
        # text, out-links computed in a single pass, html dropped before the
        # checkpoint so only extracted data is persisted.
        fetched = (
            hit.withColumn("pid", F.spark_partition_id())
            .withColumn("fstatus", F.when(transient, "transient").otherwise("fetched"))
            .withColumn("page", extract_page_udf(F.col("html"), F.col("url")))
            .withColumn("text", F.col("page.text"))
            .withColumn("outlinks", F.col("page.outlinks"))
        )
        if cfg.extract_entities:
            fetched = fetched.withColumn("embedded_json", F.col("page.embedded_json"))
        fetched = fetched.drop("html", "page")
        fetched = materialize(fetched)
        ok = fetched.filter(F.col("fstatus") == "fetched")
        failed_transient = fetched.filter(F.col("fstatus") == "transient")
        missing = batch.join(fetched.select("url_hash"), "url_hash", "left_anti")

        # Discovery candidates + Bloom flags, built before the stats action
        # so the combined stats job below materializes link-dedup + probe in
        # one pass over the just-cached fetch output.
        exploded = ok.select(
            F.col("priority").alias("parent_priority"),
            F.col("url").alias("__parent_url"),
            F.explode("outlinks").alias("url"),
        )
        # F3: per-scope link predicates — pure column exprs, applied BEFORE
        # the groupBy/anti-join so filtered links never enter the shuffle
        if cfg.link_shape is not None:
            exploded = exploded.filter(F.col("url").rlike(cfg.link_shape))
        if cfg.link_same_scope is not None:
            link_scope = F.regexp_extract("url", cfg.link_same_scope, 1)
            parent_scope = F.regexp_extract("__parent_url", cfg.link_same_scope, 1)
            exploded = exploded.filter(
                (link_scope != "") & (link_scope == parent_scope)
            )
        links = (
            exploded.drop("__parent_url")
            .withColumn("url_hash", url_hash_expr(F.col("url")))
            # deterministic dedup: several parents may link the same URL —
            # keep max priority (dropDuplicates would pick an arbitrary row)
            .groupBy("url_hash")
            .agg(F.max("parent_priority").alias("parent_priority"), F.min("url").alias("url"))
        )
        flagged = materialize(flag_maybe_seen(links, self._bloom, spark))

        # TWO ordered stats actions per round (was one 3-branch union; round-5
        # event-log profile): with the branches fused, AQE submits the
        # independent shuffle stages CONCURRENTLY and the cheap counter
        # branches race the heavy links chain for the same uncached `fetched`
        # partitions — the losers hold task slots blocked on the BlockManager
        # per-block lock (profiled: a 15.5 s stage wall carrying 4.5 core-s
        # of work). Ordered actions keep every input of action 2 already
        # cached by action 1, so nothing ever blocks:
        #   1. the heavy chain alone — fetch join -> parse (python) fused
        #      with explode/shuffle -> link dedup -> Bloom flag — one LINEAR
        #      DAG (python parse overlaps JVM shuffle work task-pipelined,
        #      the property the round-4 A/B measured as faster), returning
        #      only the suspect bucket list;
        #   2. the batch count + per-status fetch counters, pure cache scans.
        jd("fetch_parse_dedup_probe")
        suspect_buckets = sorted(
            int(r["bucket"])
            for r in flagged.filter(F.col("__maybe_seen"))
            .select(bucket_expr(F.col("url_hash"), cfg.n_buckets).alias("bucket"))
            .distinct()
            .collect()
        )
        b_stat = batch.agg(F.count("*").alias("n")).select(
            F.lit("batch").alias("tag"), F.lit("").alias("fstatus"),
            F.lit(-1).cast("int").alias("pid"), F.col("n").cast("long").alias("n"),
            F.lit(0).cast("long").alias("raw_links"),
        )
        s_stat = (
            fetched.groupBy("fstatus", "pid")
            .agg(F.count("*").alias("n"), F.sum(F.size("outlinks")).alias("raw_links"))
            .select(
                F.lit("stage").alias("tag"), "fstatus",
                F.col("pid").cast("int").alias("pid"),
                F.col("n").cast("long").alias("n"),
                F.coalesce(F.col("raw_links"), F.lit(0)).cast("long").alias("raw_links"),
            )
        )
        jd("stats")
        stat_rows = b_stat.unionByName(s_stat).collect()
        tick("sched_fetch_probe")
        n_batch = sum(r["n"] for r in stat_rows if r["tag"] == "batch")
        if n_batch == 0:
            # drained probe: when NO row can ever become eligible again the
            # caller can stop immediately instead of counting empty rounds
            # (and skip the bookkeeping commit — nothing changed, nothing
            # will; resume replays the same empty round)
            return self._finish_no_batch(k, t_start, cached, current)
        stage_rows = [r for r in stat_rows if r["tag"] == "stage"]
        n_ok = sum(r["n"] for r in stage_rows if r["fstatus"] == "fetched")
        n_raw_links = sum(r["raw_links"] or 0 for r in stage_rows if r["fstatus"] == "fetched")
        n_transient = sum(r["n"] for r in stage_rows if r["fstatus"] == "transient")
        n_missing = n_batch - n_ok - n_transient
        pool = ThreadPoolExecutor(max_workers=6)

        def submit(name, fn, *args):
            # job descriptions are thread-local: label inside the pool thread
            def run():
                jd(name)
                return fn(*args)
            return pool.submit(run)

        # Results/seen appends depend only on `ok` (already checkpointed):
        # start them NOW in background threads so the write overlaps the
        # discovery stage. Spark schedules concurrent jobs fairly; each
        # SnapshotTable commit is independent and atomic, and the rounds row
        # (the resume barrier) is written only after every future resolves.
        # Delta appends inherit the cached fetch stage's partitioning (256
        # map partitions at the bench shape) and wrote one TINY file each —
        # every later read of the table then paid a per-file open/stat cost
        # (and, before the session threshold fix, a distributed listing JOB:
        # 948 listed paths for the transitions delta by round 3, seconds per
        # round in the r6 event-log profile). The row counts are already on
        # the driver from the stats action, so size the file count from them
        # (guide §6: output files in the 100 MB-1 GB band): ~15 KB/page row
        # -> 16k rows/file ≈ 250 MB; ~50 B/transition row -> 4M rows/file.
        n_results_files = max(1, int(n_ok) // 16_384 + 1)
        n_trans_files = max(1, int(n_batch) // 4_000_000 + 1)
        results_rows = ok.select(
            "url", "url_hash", "warc_ts",
            F.lit("fetched").alias("status"), "text", "lang",
            F.lit(k).cast("int").alias("round"),
        ).coalesce(n_results_files)
        seen_rows = ok.select("url_hash", "bucket", F.lit(now).alias("crawl_ts"))
        # Pin both known-side snapshots BEFORE the background seen append is
        # submitted: the round's discovery reads a fixed file list and is
        # immune to the in-flight commit landing mid-round (ADVICE r1 — the
        # round stays deterministic by construction regardless of thread
        # timing; this round's fetches are covered by the frontier side).
        seen_snap0 = self.t["seen"].current_snapshot_id()
        frontier_snap0 = self.t["frontier"].current_snapshot_id()
        # Frontier state transitions (section 7 semantically, built here so
        # the append overlaps discovery — it depends only on the persisted
        # fetch stage, like results/seen).
        give_up = F.col("attempt") + 1 >= cfg.max_attempts
        if cfg.staleness_s is not None:  # T10: stamp re-crawl due time
            fetched_nft = F.lit(now + dt.timedelta(seconds=cfg.staleness_s))
            fetched_attempt = F.lit(0).cast("int")
        else:
            fetched_nft = F.col("next_fetch_ts")
            fetched_attempt = F.col("attempt")
        backoff_nft = backoff_next_fetch_ts(now_lit, F.col("attempt"))
        if cfg.failure_ttl_s is not None:  # T5: stamp expiry; attempts restart
            failed_nft = F.lit(now + dt.timedelta(seconds=cfg.failure_ttl_s))
            failed_attempt = F.lit(0).cast("int")
        else:
            failed_nft = F.col("next_fetch_ts")
            failed_attempt = F.col("attempt")
        changed = (
            ok.select("url_hash", F.lit("fetched").alias("new_state"),
                      fetched_nft.alias("new_nft"), fetched_attempt.alias("new_attempt"))
            .unionByName(
                missing.select("url_hash", F.lit("failed").alias("new_state"),
                               failed_nft.alias("new_nft"),
                               failed_attempt.alias("new_attempt"))
            )
            .unionByName(
                failed_transient.select(
                    "url_hash",
                    F.when(give_up, "failed").otherwise("discovered").alias("new_state"),
                    (
                        F.when(give_up, failed_nft).otherwise(backoff_nft)
                        if cfg.failure_ttl_s is not None
                        else backoff_nft
                    ).alias("new_nft"),
                    (
                        F.when(give_up, failed_attempt).otherwise(F.col("attempt") + 1)
                        if cfg.failure_ttl_s is not None
                        else F.col("attempt") + 1
                    ).cast("int").alias("new_attempt"),
                )
            )
        )
        trans_rows = changed.select(
            "url_hash",
            F.col("new_state").alias("state"),
            F.col("new_nft").alias("next_fetch_ts"),
            F.col("new_attempt").alias("attempt"),
            F.lit(k).cast("int").alias("round"),
            # verdict unchanged by state transitions; only the robots-TTL
            # refresh writes a non-null here
            F.lit(None).cast("boolean").alias("robots_allowed"),
        ).coalesce(n_trans_files)
        fut_results = submit("commit:results", self.t["results"].append, results_rows, {"round": k})
        fut_seen = submit(
            "commit:seen", self.t["seen"].append, seen_rows, {"round": k}, "bucket"
        )
        fut_trans = submit("commit:transitions", self.t["transitions"].append, trans_rows, {"round": k})
        fut_entities = None
        if cfg.extract_entities:
            # nested per-page entities: parse the embedded payload with an
            # explicit schema (JVM from_json), keep comments NESTED as
            # array<struct> — the reference's repo->issue->comments model
            issue = F.element_at(
                F.from_json("embedded_json", PAYLOAD_DDL)["payload"]["preloadedQueries"], 1
            )["result"]["data"]["repository"]["issue"]
            comments = F.transform(
                F.filter(
                    issue["frontTimelineItems"]["edges"],
                    lambda e: e["node"]["__typename"] == "IssueComment",
                ),
                lambda e: F.struct(
                    e["node"]["author"]["login"].alias("author"),
                    F.to_timestamp(
                        e["node"]["createdAt"], "yyyy-MM-dd'T'HH:mm:ss'Z'"
                    ).alias("timestamp"),
                    e["node"]["body"].alias("content"),
                ),
            )
            # W4 inside the engine table: comments chronologically sorted
            # (reference src/pr_scraper.py:721-722), JVM-side comparator
            comments = F.array_sort(
                comments,
                lambda a, b: F.when(a["timestamp"] < b["timestamp"], -1)
                .when(a["timestamp"] > b["timestamp"], 1)
                .otherwise(0),
            )
            entities_rows = ok.filter(F.col("embedded_json").isNotNull()).select(
                "url_hash",
                "url",
                F.lit(k).cast("int").alias("round"),
                F.struct(
                    issue["number"].alias("number"),
                    issue["state"].alias("state"),
                    comments.alias("comments"),
                ).alias("issue"),
            ).coalesce(n_results_files)
            fut_entities = submit(
                "commit:entities", self.t["entities"].append, entities_rows, {"round": k}
            )

        # 6. discovery: out-links -> new frontier rows ---------------------
        def known_loader(buckets: list[int]) -> DataFrame:
            """Known keys (frontier ∪ seen) restricted to the given hash
            buckets — both tables are bucket-partitioned, so the backstop
            anti-join reads only files that can hold a duplicate. Frontier
            archive partitions (terminal rows moved to bucket+n_buckets at
            compaction) are part of the known set, hence the pair."""
            both = list(buckets) + [b + cfg.n_buckets for b in buckets]
            fr = self.t["frontier"].read_partitions(spark, "bucket", both, frontier_snap0)
            sn = self.t["seen"].read_partitions(spark, "bucket", buckets, seen_snap0)
            return fr.select("url_hash").unionByName(sn.select("url_hash"))

        # links + probe verdicts were cached and their suspect buckets
        # collected inside the combined stats action above — discovery here
        # is just the exact backstop over the pruned known-key files
        jd("discover")
        fresh = resolve_unseen(flagged, known_loader, suspect_buckets)
        new_rows = (
            fresh.withColumn("bucket", bucket_expr(F.col("url_hash"), cfg.n_buckets))
            .withColumn("host", host_expr(F.col("url")))
            .withColumn("registrable_domain", registrable_domain_expr(F.col("host")))
            .withColumn(
                "priority",
                F.greatest(
                    F.col("parent_priority") * cfg.priority_decay, F.lit(0.01)
                ),
            )
            .withColumn("next_fetch_ts", F.lit(self.now(k + 1)))
            .withColumn("state", F.lit("discovered"))
            .withColumn("attempt", F.lit(0).cast("int"))
            .withColumn("discovered_round", F.lit(k + 1).cast("int"))
            .transform(self._with_robots_allowed)
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )
        new_rows = materialize(new_rows)
        # Distributed incremental Bloom maintenance: per-bucket delta bitmaps
        # built executor-side, OR-merged on the driver — no collect() of raw
        # url_hashes, and the returned key count IS n_new (one job serves
        # bloom-add + discovery count).
        if self._bloom is not None:
            n_new, n_new_blocked = self._bloom.add_df(
                new_rows.select("url_hash", "robots_allowed"),
                false_count_of="robots_allowed",
            )
        else:
            row = new_rows.agg(
                F.count("*").alias("n"),
                F.sum((~F.coalesce(F.col("robots_allowed"), F.lit(True)))
                      .cast("long")).alias("b"),
            ).collect()[0]
            n_new, n_new_blocked = int(row["n"]), int(row["b"] or 0)
        tick("discover")

        # host_state fold: spend tokens, breaker — TOUCHED DOMAINS ONLY ----
        # (round-3 verdict #3: the full-table overwrite was O(all domains
        # ever seen) per round; at 10^7-10^8 registrable domains that is the
        # same anti-pattern the frontier's transitions delta was built to
        # avoid. A round now APPENDS one row per domain it scheduled — the
        # only rows whose state changes beyond the lazy capped refill —
        # plus rows for newly-discovered domains; _read_host_state resolves
        # latest-wins and compact() folds the delta.)
        # One tagged union + one aggregation instead of three per-frame
        # groupBys joined separately (r6: the old shape planned 9-18 little
        # broadcast/agg jobs inside every round's host_state commit). Every
        # ok/transient domain is by construction also a batch domain, so the
        # single aggregate is exactly the old inner+left+left join result.
        per_host = (
            batch.select(
                "registrable_domain",
                F.lit(1).alias("__att"), F.lit(0).alias("__fail"), F.lit(0).alias("__ok"),
            )
            .unionByName(
                failed_transient.select(
                    "registrable_domain",
                    F.lit(0).alias("__att"), F.lit(1).alias("__fail"), F.lit(0).alias("__ok"),
                )
            )
            .unionByName(
                ok.select(
                    "registrable_domain",
                    F.lit(0).alias("__att"), F.lit(0).alias("__fail"), F.lit(1).alias("__ok"),
                )
            )
            .groupBy("registrable_domain")
            .agg(
                F.sum("__att").alias("attempted"),
                F.sum("__fail").alias("round_failures"),
                F.sum("__ok").alias("round_successes"),
            )
        )
        hs_touched = (
            host_state.join(per_host, "registrable_domain", "inner")
            .withColumn(
                "tokens",
                F.greatest(
                    F.lit(0.0),
                    refill_tokens(F.col("tokens"), F.col("refill_rate"),
                                  lazy_elapsed, F.col("capacity"))
                    - F.col("attempted"),
                )
            )
        )
        if cfg.adaptive_rate:
            hs_touched = hs_touched.withColumn(
                "refill_rate",
                adapt_refill_rate(
                    F.col("refill_rate"), F.col("base_refill_rate"),
                    F.col("attempted"), F.col("round_failures"),
                    F.col("round_successes"),
                ),
            )
        hs_touched = apply_circuit_breaker(hs_touched.drop("attempted"), now_lit)
        hs_touched = hs_touched.withColumn("asof_round", F.lit(k).cast("int"))
        # new domains discovered this round join host_state lazily
        new_domains = new_rows.select("registrable_domain").distinct().join(
            host_state.select("registrable_domain"), "registrable_domain", "left_anti"
        )
        # one ~100 B row per touched/new domain: a single file per round
        # keeps the per-round host_state latest-wins read O(few files)
        # (bounded by n_batch domains; see the delta-file sizing note above)
        hs_delta = hs_touched.select(*self.HOST_COLS).unionByName(
            self._new_host_rows(new_domains, asof_round=k)
        ).coalesce(max(1, int(n_batch) // 4_000_000 + 1))

        # ------------------------------------------------- commits (S7/T6)
        tick("plan_updates")
        # bucketed append: keeps EVERY frontier file prunable by the
        # known_loader backstop (an unpartitioned append would be
        # conservatively re-read for every suspect bucket)
        fut_frontier = submit(
            "commit:frontier", self.t["frontier"].append, new_rows, {"round": k}, "bucket"
        )
        # host_state delta append is independent of every other commit — run
        # it in the pool too so the commit barrier is max(), not sum()
        fut_host = submit("commit:host_state", self.t["host_state"].append, hs_delta, {"round": k})
        host_snap = fut_host.result()
        frontier_snap = fut_frontier.result()
        transitions_snap = fut_trans.result()
        results_snap = fut_results.result()
        seen_snap = fut_seen.result()
        entities_snap = (
            fut_entities.result() if fut_entities is not None
            else self.t["entities"].current_snapshot_id()
        )
        pool.shutdown()
        tick("w_all")

        wall_ms = int((time.monotonic() - t_start) * 1000)
        # per-partition lineage assembled from the already-collected stage rows
        by_pid: dict[int, list[int]] = {}
        for r in stage_rows:
            ent = by_pid.setdefault(int(r["pid"]), [0, 0])
            if r["fstatus"] == "fetched":
                ent[0] += int(r["n"])
            else:
                ent[1] += int(r["n"])
        # per-partition rows carry per-partition fetch/failure counts only;
        # the GLOBAL dedup count (n_raw_links − n_new) is recorded exactly
        # once on its own stage row — summing urls_deduped over a round now
        # gives the true number instead of overcounting by the partition
        # count (round-3 verdict #4)
        metrics_snap = self.t["metrics"].append_local(
            (
                [
                    (k, "fetch", pid, ent[0], 0, ent[1], wall_ms, frontier_snap)
                    for pid, ent in sorted(by_pid.items())
                ]
                or [(k, "fetch", -1, 0, 0, 0, wall_ms, frontier_snap)]
            )
            + [(k, "dedup", -1, 0, int(n_raw_links) - n_new, 0, wall_ms, frontier_snap)],
            METRICS_SCHEMA,
            {"round": k},
        )
        self.t["rounds"].append_local(
            [
                (
                    k, True, n_ok, int(n_transient + n_missing), n_new, n_batch,
                    wall_ms, frontier_snap, seen_snap, results_snap, host_snap,
                    metrics_snap, transitions_snap, entities_snap,
                )
            ],
            ROUNDS_SCHEMA,
            {"round": k},
        )
        self._release_round_blocks(cached)
        self._known_count += n_new
        # exactly one transition row per scheduled URL was appended
        self._trans_rows += int(n_batch)
        # Active-row bound maintenance: rows leave the schedulable set only
        # when their new state is terminal under the CURRENT config —
        # fetched is terminal unless staleness re-crawls (T10), missing->
        # failed is terminal unless failure TTL re-admits (T5). Transients
        # (including give-ups, an over-count) and re-enterable states stay
        # counted, so the bound NEVER under-predicts; discoveries add only
        # their robots-ALLOWED rows (blocked rows are never eligible and
        # would otherwise accumulate into the bound forever).
        if self._next_round_bound is not None:
            gone = (int(n_ok) if cfg.staleness_s is None else 0) + (
                int(n_missing) if cfg.failure_ttl_s is None else 0
            )
            self._next_round_bound = (
                max(0, self._next_round_bound - gone)
                + int(n_new) - int(n_new_blocked)
            )
        self._prev_round_empty = False
        out = {
            "round": k, "eligible": n_batch, "fetched": n_ok,
            "transient": n_transient, "missing": n_missing,
            "links": int(n_raw_links), "new": n_new, "wall_ms": wall_ms,
        }
        if os.environ.get("SPARK_GRAFT_PROFILE"):
            out["prof"] = prof
        return out

    def checkpoint_stats(self) -> DataFrame:
        """A6: checkpoint-statistics rollup over the rounds lineage table
        (reference ``get_statistics``, src/checkpoint_manager.py:282-296):
        completed rounds, fetched/failed totals, success rate, last round."""
        rounds = self.t["rounds"].read(self.spark)
        fetched = F.sum("fetched")
        failed = F.sum("failed")
        return rounds.agg(
            F.count("*").alias("rounds"),
            F.sum(F.col("completed").cast("long")).alias("completed_rounds"),
            fetched.alias("fetched"),
            failed.alias("failed"),
            F.round(fetched / F.greatest(fetched + failed, F.lit(1)), 6)
            .alias("success_rate"),
            F.max("round").alias("last_round"),
            F.sum("wall_ms").alias("total_wall_ms"),
        )

    # ------------------------------------------------------------------ run
    def run(self, seeds: DataFrame | None = None, max_rounds: int | None = None,
            log=None) -> list[dict]:
        """Run (or resume) the crawl to convergence; returns round stats."""
        if seeds is not None:
            t_i = time.monotonic()
            self.init_frontier(seeds)
            if os.environ.get("SPARK_GRAFT_PROFILE"):
                print(f"  [prof] init_frontier {time.monotonic() - t_i:.2f}s",
                      file=sys.stderr)
            start = 0
        else:
            start = self.resume_round()
        cap = max_rounds if max_rounds is not None else self.cfg.max_rounds
        stats, empty, since_compact = [], 0, 0
        # With robots TTL armed, robots-blocked rows (EXCLUDED from the
        # bound) can re-enter at a future refresh, so bound 0 no longer
        # proves drained-forever — the skip stays off and trailing rounds
        # run out the normal empty/drained probes instead.
        ttl_live = self.cfg.robots_ttl_rounds > 0 and self._robots_provider is not None
        for k in range(start, cap):
            if self._next_round_bound == 0 and not ttl_live:
                # The driver-tracked active-row bound never under-predicts
                # (seeds − terminal-under-config + allowed discoveries), so
                # bound 0 proves no row can ever become eligible again —
                # the same certainty as run_round's drained probe, without
                # launching a single job. Outcome-equivalent to running the
                # trailing empty round(s): nothing is committed either way
                # (resume replays the same empty round), so the simulator
                # mirror — which just runs the empty rounds out — reaches
                # identical fetch/seen outcomes.
                s = {"round": k, "eligible": 0, "fetched": 0, "transient": 0,
                     "missing": 0, "links": 0, "new": 0, "wall_ms": 0,
                     "drained": True}
                stats.append(s)
                if log:
                    log(s)
                break
            s = self.run_round(k)
            stats.append(s)
            if log:
                log(s)
            if s.get("drained"):
                break  # no row can ever become eligible again (A10 fast path)
            empty = empty + 1 if s["eligible"] == 0 else 0
            if empty >= self.cfg.empty_rounds_stop:
                break
            # Periodic compaction (round-3 verdict #2): every round replays
            # the transitions delta through a latest-wins window, so on long
            # crawls the delta must be folded back into the bucketed
            # frontier every compact_every_rounds ACTIVE rounds to keep
            # per-round cost O(recent rounds), not O(crawl lifetime).
            # Resume-safe: the rounds row written before the compact records
            # pre-compact snapshots, and rollback to them restores exactly
            # that state (delta + base ≡ folded base by construction).
            since_compact = since_compact + 1 if s["eligible"] > 0 else since_compact
            if (
                self.cfg.compact_every_rounds
                and since_compact >= self.cfg.compact_every_rounds
            ):
                self.compact()
                since_compact = 0
                if self.cfg.expire_snapshots_keep:
                    for t in self.t.values():
                        t.expire_snapshots(keep_last=self.cfg.expire_snapshots_keep)
        # fold the transitions delta into the frontier so readers see final
        # states without replaying the delta (resume-safe: rollback restores)
        t_c = time.monotonic()
        self.compact()
        if os.environ.get("SPARK_GRAFT_PROFILE"):
            print(f"  [prof] final compact {time.monotonic() - t_c:.2f}s",
                  file=sys.stderr)
        return stats
