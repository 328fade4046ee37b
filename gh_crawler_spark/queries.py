"""Operator-coverage query registry (driver correctness contract).

Each entry is one operator family from SURVEY.md §2 expressed twice:
  * a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
  * an equivalent DuckDB SQL oracle (None for non-SQL-expressible ops —
    the driver then records a weaker rows-only check)

Conventions that keep the driver's value-hash compare stable:
  * every computed/aggregate column aliased identically on both sides
  * DOUBLE aggregates rounded to fixed decimals (summation-order noise)
  * DuckDB ``sum`` over integers cast to BIGINT (it returns HUGEINT)
  * timestamps emitted as formatted strings when they appear in output
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gh_crawler_spark.functions.urls import canonicalize_url_expr, registrable_domain_expr

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread an unsplittable small scan over the cores before per-row-HEAVY
    work (tokenize/shingle/Arrow decode). The sandbox parquet tables are
    single-file/single-row-group, so a tokenize-class operator otherwise runs
    its whole map stage as ONE task (guide §2.5: unsplittable input —
    repartition immediately after the read). Gated on the scan's partition
    count so a real multi-file corpus never pays the extra shuffle. Applied
    only to heavy-map queries: for projection-only queries the extra
    exchange+stage measurably COSTS on the cold single-shot path (A/B:
    frontier_pipeline 8.8 s vs 2.6 s cold) while buying nothing — their
    per-row work is tiny next to stage overhead. Round-robin order is
    irrelevant to results: the driver compares under canonical row ordering,
    and no spread consumer does an order-sensitive float aggregation."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


# A reproducible URL column synthesized from documents (with canonicalization
# traps), so URL operators have an oracle-able fixture (FIXTURES.md §5).
_URL_SPARK = (
    "concat('HTTPS://docs.', upper(source), '-Site.COM:443/docs/', cast(doc_id as string), "
    "case when doc_id % 3 = 0 then '/' else '' end, "
    "case when doc_id % 4 = 0 then '?b=2&a=1' else '' end, "
    "case when doc_id % 5 = 0 then '#frag' else '' end)"
)
_URL_DUCK = (
    "concat('HTTPS://docs.', upper(source), '-Site.COM:443/docs/', cast(doc_id as varchar), "
    "case when doc_id % 3 = 0 then '/' else '' end, "
    "case when doc_id % 4 = 0 then '?b=2&a=1' else '' end, "
    "case when doc_id % 5 = 0 then '#frag' else '' end)"
)

def _canon_duck(u: str) -> str:
    """DuckDB re-implementation of the engine canonical form (spec in
    functions/urls.py) specialized to the synthesized URLs above: scheme is
    https, port is the default :443, path never empty, query '' or unsorted
    'b=2&a=1', optional #fragment."""
    nofrag = f"split_part({u}, '#', 1)"
    rest = f"split_part({nofrag}, '://', 2)"
    host = f"lower(split_part(split_part({rest}, '/', 1), ':', 1))"
    path = f"regexp_replace('/' || split_part(regexp_replace({rest}, '^[^/]*/', ''), '?', 1), '/+$', '')"
    query = f"CASE WHEN contains({nofrag}, '?b=2&a=1') THEN '?a=1&b=2' ELSE '' END"
    return f"concat('https://', {host}, {path}, {query})"


def q_f1_priority_filter(spark, sf_dir):
    """F1: threshold filter + projection (star-threshold analog)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 200000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_F1 = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_totalprice >= 200000.0
"""


def q_f4_state_isin(spark, sf_dir):
    """F4: IN-list state predicate + count by group."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "P"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


SQL_F4 = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders WHERE o_orderstatus IN ('F','P') GROUP BY o_orderstatus
"""


def q_f6_min_content(spark, sf_dir):
    """F6: min-content length predicate (len(body) > k)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") > 200)
        .select("doc_id", F.length("text").alias("text_len"))
    )


SQL_F6 = """
SELECT doc_id, CAST(length(text) AS INT) AS text_len
FROM documents WHERE length(text) > 200
"""


def q_f10_status_classify(spark, sf_dir):
    """F10: retryable-error classification (status -> action column)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "retry")
        .when(F.col("event_type") == "purchase", "done")
        .otherwise("skip")
        .alias("action"),
    )


SQL_F10 = """
SELECT event_id,
  CASE WHEN event_type = 'error' THEN 'retry'
       WHEN event_type = 'purchase' THEN 'done'
       ELSE 'skip' END AS action
FROM events
"""


def q_j1_seen_anti_join(spark, sf_dir):
    """J1: the core dedup anti-join (customers with no orders)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


SQL_J1 = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


def q_j2_remaining_work(spark, sf_dir):
    """J2/U3: remaining = discovered − scraped − failed (two anti-joins)."""
    o = _t(spark, sf_dir, "orders")
    scraped = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    failed = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        o.select("o_orderkey")
        .join(scraped, "o_orderkey", "left_anti")
        .join(failed, "o_orderkey", "left_anti")
    )


SQL_J2 = """
SELECT o_orderkey FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_j4_hash_equi_join(spark, sf_dir):
    """J4: hash equi-join + grouped revenue (PR↔issues embed analog)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_J4 = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_j5_lead_join(spark, sf_dir):
    """J5/W3: lead() over per-key ordered history (previous-commit analog)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.lead("event_id").over(w).alias("next_event_id"),
    )


SQL_J5 = """
SELECT event_id, user_id,
       lead(event_id) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_event_id
FROM events
"""


def q_j9_lookup_join(spark, sf_dir):
    """J9: small-dim lookup join (broadcast)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )


SQL_J9 = "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"


def q_a1_pricing_summary(spark, sf_dir):
    """A1/A4 headline: TPC-H Q1-style grouped aggregate (stat counters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_A1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_a4_conditional_counts(spark, sf_dir):
    """A4: open/closed conditional counts per key."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.count("*").alias("n_total"),
    )


SQL_A4 = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(count(*) AS BIGINT) AS n_total
FROM orders GROUP BY o_orderpriority
"""


def q_a5_progress_summary(spark, sf_dir):
    """A5: coverage summary with percentage. The grand total comes from an
    empty-frame window over the ALREADY-AGGREGATED per-type counts (a handful
    of rows), not a separate count() job — the plan stays one pass."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return per_type.select(
        "event_type", "n", F.round(F.col("n") / total * 100, 4).alias("pct")
    )


SQL_A5 = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 100.0 / (SELECT count(*) FROM events), 4) AS pct
FROM events GROUP BY event_type
"""


def q_a7_throughput(spark, sf_dir):
    """A7: per-hour throughput (fetch/min analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"))
        .agg(F.count("*").alias("n"))
    )


SQL_A7 = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def q_a8_success_rate(spark, sf_dir):
    """A8: success-rate summary."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.avg(F.when(F.col("event_type") != "error", 1.0).otherwise(0.0)) * 100, 4).alias(
            "success_pct"
        )
    )


SQL_A8 = """
SELECT round(avg(CASE WHEN event_type != 'error' THEN 1.0 ELSE 0.0 END) * 100, 4) AS success_pct
FROM events
"""


def q_w1_topk_per_key(spark, sf_dir):
    """W1/L1: deterministic top-K per key (fetch-batch ranking)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


SQL_W1 = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders) WHERE rk <= 3
"""


def q_w4_chronological_concat(spark, sf_dir):
    """W4: chronological ordering within key, emitted as a joined string."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "pair", F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("pair")), lambda s: s["event_type"]),
                ",",
            ).alias("timeline")
        )
    )


SQL_W4 = """
SELECT user_id, string_agg(event_type, ',' ORDER BY ts ASC, event_id ASC) AS timeline
FROM events GROUP BY user_id
"""


def q_w5_first_wins_dedup(spark, sf_dir):
    """W5/J6: first-occurrence-wins dedup per key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


SQL_W5 = """
SELECT user_id, event_id, event_type FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events) WHERE rn = 1
"""


def q_l2_global_topk(spark, sf_dir):
    """L2: deterministic global top-K (ordered before limit)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SQL_L2 = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_l3_truncation(spark, sf_dir):
    """L3: reference truncation rule s[:k] + '...' (byte-identical)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(
            F.length("text") > 100, F.concat(F.substring("text", 1, 100), F.lit("..."))
        )
        .otherwise(F.col("text"))
        .alias("content"),
    )


SQL_L3 = """
SELECT doc_id,
  CASE WHEN length(text) > 100 THEN substring(text, 1, 100) || '...' ELSE text END AS content
FROM documents
"""


def q_u1_union_dedup(spark, sf_dir):
    """U1: union of two discovery streams + dedup."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.unionByName(b).distinct()


SQL_U1 = """
SELECT DISTINCT o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


def q_u3_except(spark, sf_dir):
    """U3: set difference (exceptAll-style remaining work)."""
    c = _t(spark, sf_dir, "customer")
    with_orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.select("c_custkey").exceptAll(with_orders.distinct())


SQL_U3 = """
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS c_custkey FROM orders
"""


def q_x2_extract_int(spark, sf_dir):
    """X2: safe_extract_int — first digit run after cleaning."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.regexp_replace("props", "[ ,]", ""), r"(\d+)", 1)
        .cast("long")
        .alias("k_value"),
    )


SQL_X2 = r"""
SELECT event_id,
       CAST(regexp_extract(regexp_replace(props, '[ ,]', '', 'g'), '(\d+)', 1) AS BIGINT) AS k_value
FROM events
"""


def q_x3_k_suffix(spark, sf_dir):
    """X3: '74.8k' -> 74800 parse (k-suffix numbers)."""
    ev = _t(spark, sf_dir, "events")
    s = F.concat(F.round(F.col("value"), 1).cast("string"), F.lit("k"))
    return ev.select(
        "event_id",
        F.round(F.regexp_extract(s, r"([\d.]+)k", 1).cast("double") * 1000)
        .cast("long")
        .alias("parsed"),
    )


SQL_X3 = r"""
SELECT event_id,
       CAST(round(CAST(regexp_extract(concat(CAST(round(value, 1) AS VARCHAR), 'k'), '([\d.]+)k', 1) AS DOUBLE) * 1000) AS BIGINT) AS parsed
FROM events
"""


def q_x5_canonicalize(spark, sf_dir):
    """X5: the engine canonical form, column-expr vs DuckDB SQL (the core
    parity query for the frontier key path)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        canonicalize_url_expr(F.expr(_URL_SPARK)).alias("canonical_url"),
    )


SQL_X5 = f"""
SELECT doc_id, {_canon_duck(f'({_URL_DUCK})')} AS canonical_url
FROM documents
"""


def q_x7_registrable_domain(spark, sf_dir):
    """X7: registrable-domain extraction (PSL-subset rule)."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lower("source"), F.lit(".docs.example.co.uk"))
    return d.select("doc_id", registrable_domain_expr(host).alias("regdom"))


SQL_X7 = """
SELECT doc_id, 'example.co.uk' AS regdom FROM documents
"""


def q_x12_split_cleanup(spark, sf_dir):
    """X12: title cleanup — take text before first marker, trimmed."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.trim(F.substring_index("text", " ", 3)).alias("title3")
    )


SQL_X12 = """
SELECT doc_id,
  trim(CASE WHEN length(text) - length(replace(text, ' ', '')) >= 3
       THEN split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2) || ' ' || split_part(text, ' ', 3)
       ELSE text END) AS title3
FROM documents
"""


def q_x13_timestamp_roundtrip(spark, sf_dir):
    """X13: ISO-string <-> timestamp round-trip + lexicographic==temporal."""
    ev = _t(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    return ev.select(
        "event_id",
        iso.alias("iso"),
        F.date_format(F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("roundtrip"),
    )


SQL_X13 = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso,
       strftime(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '%Y-%m-%dT%H:%M:%S.%f'),
                '%Y-%m-%d %H:%M:%S.%f') AS roundtrip
FROM events
"""


def q_t2_backoff_schedule(spark, sf_dir):
    """T2: exponential-backoff schedule column (min(60, 2·2^attempt))."""
    ev = _t(spark, sf_dir, "events")
    attempt = (F.col("event_id") % 6).cast("int")
    return ev.select(
        "event_id",
        F.least(F.lit(60.0), F.lit(2.0) * F.pow(F.lit(2.0), attempt))
        .cast("long")
        .alias("backoff_s"),
    )


SQL_T2 = """
SELECT event_id,
       CAST(least(60.0, 2.0 * power(2.0, CAST(event_id % 6 AS INT))) AS BIGINT) AS backoff_s
FROM events
"""


def q_t10_staleness(spark, sf_dir):
    """T10: staleness filter (re-crawl entries older than cutoff)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("ts") < "2024-01-08").select("event_id", "user_id")


SQL_T10 = """
SELECT event_id, user_id FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
"""


def q_a2_a3_derived_arithmetic(spark, sf_dir):
    """A2/A3: max-id aggregate + derived arithmetic (closed = latest − open,
    reference src/repository_scraper.py:186-196,379-403)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max("o_orderkey").alias("latest_key"),
        (F.max("o_orderkey") - F.count("*")).alias("derived_gap"),
    )


SQL_A2A3 = """
SELECT o_custkey, CAST(max(o_orderkey) AS BIGINT) AS latest_key,
       CAST(max(o_orderkey) - count(*) AS BIGINT) AS derived_gap
FROM orders GROUP BY o_custkey
"""


def q_u2_union_seen_sets(spark, sf_dir):
    """U2: union of two seen-set sources then distinct (output-dir URLs ∪
    current-file URLs, reference src/checkpoint_manager.py:203)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = o.select(F.col("o_orderkey").alias("k"))
    b = li.select(F.col("l_orderkey").alias("k"))
    return a.unionByName(b).distinct().agg(
        F.count("*").alias("n_distinct"), F.sum("k").alias("sum_k")
    )


SQL_U2 = """
SELECT CAST(count(*) AS BIGINT) AS n_distinct, CAST(sum(k) AS BIGINT) AS sum_k
FROM (SELECT o_orderkey AS k FROM orders UNION SELECT l_orderkey AS k FROM lineitem)
"""


def q_j6_selector_rank_dedup(spark, sf_dir):
    """J6/W5: first-occurrence-wins across prioritized selector passes
    (reference seen_pr_numbers cascade, src/pr_scraper.py:344-401): the same
    key found by several 'selectors' keeps the lowest selector rank."""
    ev = _t(spark, sf_dir, "events")
    # simulate two selector passes producing overlapping keys
    pass1 = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.lit(1).alias("selector_rank")
    )
    pass2 = ev.filter(F.col("value") > 5).select("user_id", F.lit(2).alias("selector_rank"))
    both = pass1.unionByName(pass2)
    w = Window.partitionBy("user_id").orderBy(F.col("selector_rank").asc())
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "selector_rank")
    )


SQL_J6 = """
SELECT user_id, selector_rank FROM (
  SELECT user_id, selector_rank,
         row_number() OVER (PARTITION BY user_id ORDER BY selector_rank ASC) AS rn
  FROM (
    SELECT user_id, 1 AS selector_rank FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, 2 AS selector_rank FROM events WHERE value > 5)
) WHERE rn = 1
"""


def q_j4b_nested_embed(spark, sf_dir):
    """J4 embed shape: join + collect_list(struct) sorted chronologically,
    rendered as a string for the oracle compare (PR ↔ related-issues embed,
    reference src/pr_scraper.py:788-823)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    li = _t(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("l_linenumber"), F.col("l_partkey")))
                    ),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("embedded_parts")
        )
    )


SQL_J4B = """
SELECT o_orderkey,
       coalesce(string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey), '')
         AS embedded_parts
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey % 100 = 0
GROUP BY o_orderkey
"""


def q_l1_budget_cap(spark, sf_dir):
    """L1: per-key budget cap — least(n, cap) (global PR cap analog)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.least(F.count("*"), F.lit(5)).alias("capped_n")
    )


SQL_L1 = """
SELECT o_custkey, CAST(least(count(*), 5) AS BIGINT) AS capped_n
FROM orders GROUP BY o_custkey
"""


def q_a11_validation_agg(spark, sf_dir):
    """A11: sampling-validation aggregates (density / distinct / invalid)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n_invalid"),
    )


SQL_A11 = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(avg(value), 4) AS avg_value,
       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
FROM events GROUP BY event_type
"""


def q_x6_url_to_filename(spark, sf_dir):
    """X6: URL -> safe filename (replace scheme + '/' -> '_')."""
    d = _t(spark, sf_dir, "documents")
    url = F.expr(_URL_SPARK)
    return d.select(
        "doc_id",
        F.regexp_replace(F.regexp_replace(url, "^https?://", ""), "/", "_").alias("fname"),
    )


SQL_X6 = f"""
SELECT doc_id,
       replace(regexp_replace(({_URL_DUCK}), '^https?://', ''), '/', '_') AS fname
FROM documents
"""


def q_x8_ref_extract(spark, sf_dir):
    """X8: extract-all references (regexp_extract_all, joined for compare)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.array_join(
            F.regexp_extract_all(F.col("props"), F.lit(r"(\d+)"), 1), ","
        ).alias("refs"),
    )


SQL_X8 = r"""
SELECT event_id, array_to_string(regexp_extract_all(props, '(\d+)', 1), ',') AS refs
FROM events
"""


def q_x10_embedded_json(spark, sf_dir):
    """X10: embedded-JSON extraction with an explicit schema (from_json)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_value"),
    )


SQL_X10 = """
SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k_value
FROM events
"""


def q_x15_duration_format(spark, sf_dir):
    """X15: seconds -> human duration (reference src/utils.py:82-91)."""
    ev = _t(spark, sf_dir, "events")
    sec = (F.col("event_id") % 7200).cast("double")
    return ev.select(
        "event_id",
        F.when(sec < 60, F.concat(sec.cast("int").cast("string"), F.lit(" seconds")))
        .when(sec < 3600, F.concat(F.round(sec / 60, 1).cast("string"), F.lit(" minutes")))
        .otherwise(F.concat(F.round(sec / 3600, 1).cast("string"), F.lit(" hours")))
        .alias("duration"),
    )


SQL_X15 = """
SELECT event_id,
  CASE WHEN event_id % 7200 < 60
         THEN CAST(CAST(event_id % 7200 AS INT) AS VARCHAR) || ' seconds'
       WHEN event_id % 7200 < 3600
         THEN CAST(round((event_id % 7200) / 60.0, 1) AS VARCHAR) || ' minutes'
       ELSE CAST(round((event_id % 7200) / 3600.0, 1) AS VARCHAR) || ' hours'
  END AS duration
FROM events
"""


# --------------------------------------------------------------------------
# training-data pipeline operators (SURVEY-plus: dedup / similarity / text
# analysis / multimodal plumbing) — oracle-checked where DuckDB can express
# the same computation, rows-only otherwise (hash-sketch internals)
# --------------------------------------------------------------------------

# DuckDB equivalents of the textops column expressions
_D_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x != '')"
_D_EN = "['the','a','an','of','to','in','and','is','are','was','were','be','for','on','with','as','at','by','it','this','that','from','or','not']"
_D_DE = "['der','die','das','und','ist','sind','ein','eine','zu','mit','von','für','auf','als']"
_D_STOP_EN = f"(CASE WHEN len({_D_TOKS}) > 0 THEN len(list_filter({_D_TOKS}, x -> list_contains({_D_EN}, x))) * 1.0 / len({_D_TOKS}) ELSE 0.0 END)"
_D_STOP_DE = f"(CASE WHEN len({_D_TOKS}) > 0 THEN len(list_filter({_D_TOKS}, x -> list_contains({_D_DE}, x))) * 1.0 / len({_D_TOKS}) ELSE 0.0 END)"
_D_PUNCT = r"(CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text) ELSE 0.0 END)"


def q_td_text_analysis(spark, sf_dir):
    """Text analysis: tokens, stopword/punct ratios, quality, lang guess,
    fingerprint — one projection over documents (operators/textops.py)."""
    from gh_crawler_spark.operators.textops import analyze_documents

    return analyze_documents(_spread(spark, _t(spark, sf_dir, "documents")))


SQL_TD_TEXT = f"""
SELECT doc_id,
  CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_D_TOKS}) END AS INT) AS n_tokens,
  round({_D_STOP_EN}, 4) AS stopword_ratio,
  round({_D_PUNCT}, 4) AS punct_ratio,
  round(((CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1.0
               WHEN length(text) >= 20 THEN 0.5 ELSE 0.0 END)
       + (CASE WHEN {_D_PUNCT} < 0.1 THEN 1.0 ELSE 0.3 END)
       + (CASE WHEN {_D_STOP_EN} > 0.05 THEN 1.0 ELSE 0.4 END)) / 3.0, 4) AS quality,
  CASE WHEN {_D_STOP_EN} < 0.02 AND {_D_STOP_DE} < 0.02 THEN 'other'
       WHEN {_D_STOP_EN} >= {_D_STOP_DE} THEN 'en' ELSE 'de' END AS lang_guess,
  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_td_dedup_exact(spark, sf_dir):
    """Exact dedup groups by normalized-text fingerprint."""
    from gh_crawler_spark.operators.dedup_text import dedup_exact

    # NOT spread: md5-per-row is too cheap to amortize the extra exchange —
    # the spread variant measured 1.1-2.1 s cold vs 0.38-0.43 s unspread
    return dedup_exact(_t(spark, sf_dir, "documents"))


SQL_TD_DEDUP_EXACT = r"""
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY 1
"""


def q_td_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (the dedup verifier stage)."""
    from gh_crawler_spark.operators.dedup_text import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_spread(spark, _t(spark, sf_dir, "documents")), k=3, threshold=0.2)


SQL_TD_JACCARD = rf"""
WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT d1, d2, round(common * 1.0 / (sa.n + sb.n - common), 4) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.2
"""


def q_td_minhash_lsh(spark, sf_dir):
    """MinHash-LSH candidates verified by exact Jaccard. Fully oracled since
    round 5: SQL_TD_MINHASH re-runs the ENTIRE pipeline (shingles -> K-M
    xxhash64 signature minima -> banded buckets -> candidate join -> exact
    verify) in DuckDB on the pure-SQL XXH64 (functions/duck_xxh64.py)."""
    from gh_crawler_spark.operators.dedup_text import minhash_lsh_pairs

    return minhash_lsh_pairs(_spread(spark, _t(spark, sf_dir, "documents")), threshold=0.2)


def q_td_simhash(spark, sf_dir):
    """SimHash near-dup pairs. Oracled since round 5: SQL_TD_SIMHASH rebuilds
    the 64 xxhash64 sign-vote bits, the pigeonhole chunk join and the
    bit_count(xor) verify in DuckDB via the pure-SQL XXH64."""
    from gh_crawler_spark.operators.dedup_text import simhash_near_pairs

    return simhash_near_pairs(_spread(spark, _t(spark, sf_dir, "documents")), max_hamming=3)


def q_td_ann_cosine(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for the first 5 vectors."""
    from gh_crawler_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


SQL_TD_ANN = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 5
"""


def q_td_lsh_ann(spark, sf_dir):
    """LSH-bucketed ANN top-5. Oracled since round 5: the hash-derived
    hyperplanes are CONSTANTS, so SQL_TD_LSH_ANN regenerates them with the
    pure-SQL XXH64 and replays bucket sign-bits + re-rank in DuckDB."""
    from gh_crawler_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), dim=64, k=5,
                    n_planes=8, n_tables=2)


def q_td_ivf_ann(spark, sf_dir):
    """IVF ANN top-5 at nprobe < n_cells — the pruning path (registered
    past-cap as td_ivf_ann_probe, rows-only; recall + file pruning are
    pytest-asserted; the driver-recorded td_ivf_ann entry is the full-probe
    variant whose brute-force identity makes SQL_TD_ANN a sound oracle)."""
    from gh_crawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_cells=8, nprobe=3)


def q_td_media_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload -> metadata via mapInPandas
    (deterministic fake decode; formula mirrored in the SQL oracle)."""
    from gh_crawler_spark.operators.multimodal import as_media_table, extract_media_meta

    media = as_media_table(_spread(spark, _t(spark, sf_dir, "documents")))
    return extract_media_meta(media, deterministic_fake=True)


SQL_TD_MEDIA = """
SELECT doc_id, 'image/fake' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS n_channels
FROM documents
"""


def q_td_frame_sample(spark, sf_dir):
    """Frame-sampling explode plumbing for video payloads."""
    from gh_crawler_spark.operators.multimodal import as_media_table, frame_sample_plan

    return frame_sample_plan(as_media_table(_t(spark, sf_dir, "documents")), every_n=10)


SQL_TD_FRAMES = """
SELECT doc_id, CAST(u.f AS INT) AS frame_no
FROM documents,
     UNNEST(generate_series(0, greatest(CAST(octet_length(encode(text)) / 100 AS INT) - 1, 0), 10)) AS u(f)
"""


# --------------------------------------------------------------------------
# frontier-pipeline showcase on oracle-able fixtures
# --------------------------------------------------------------------------


def q_x16_url_hash(spark, sf_dir):
    """X16: xxhash64 frontier keys. Oracled since round 5 by SQL_X16 (the
    pure-SQL XXH64 over the DuckDB canonical form); Python/Spark parity is
    additionally asserted in tests/test_hashing.py."""
    from gh_crawler_spark.functions.urls import url_hash_expr

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        url_hash_expr(canonicalize_url_expr(F.expr(_URL_SPARK))).alias("url_hash"),
    )


def q_frontier_pipeline(spark, sf_dir):
    """Flagship compact pipeline: canonicalize -> dedup by canonical key ->
    per-domain top-K schedule — the crawl round's core, on oracle-able data."""
    d = _t(spark, sf_dir, "documents")
    canon = (
        d.select(
            "doc_id",
            canonicalize_url_expr(F.expr(_URL_SPARK)).alias("url"),
            F.col("n_chars").cast("double").alias("priority"),
        )
        .withColumn("registrable_domain", registrable_domain_expr(
            F.split(F.split(F.col("url"), "://", 2).getItem(1), "/", 2).getItem(0)
        ))
    )
    w = Window.partitionBy("registrable_domain").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    return (
        canon.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("registrable_domain", "doc_id", "url", "priority", "rk")
    )


SQL_FRONTIER = f"""
WITH canon AS (
  SELECT doc_id, {_canon_duck(f'({_URL_DUCK})')} AS url,
         CAST(n_chars AS DOUBLE) AS priority,
         lower(source) || '-site.com' AS registrable_domain
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY registrable_domain
                               ORDER BY priority DESC, doc_id ASC) AS rk
  FROM canon)
SELECT registrable_domain, doc_id, url, priority, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 10
"""


def q_x4_entity_id(spark, sf_dir):
    """X4: entity id from URL path — the reference's ``/pull/(\\d+)`` probe
    (src/pr_scraper.py:556-565), over a synthesized pull-request URL."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://git.example/"), F.col("source"),
        F.lit("/pull/"), F.col("doc_id").cast("string"), F.lit("?tab=files"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"/pull/(\d+)", 1).cast("long").alias("pr_number"),
    )


SQL_X4 = r"""
SELECT doc_id,
       'https://git.example/' || source || '/pull/' || CAST(doc_id AS VARCHAR) || '?tab=files' AS url,
       CAST(regexp_extract('https://git.example/' || source || '/pull/' || CAST(doc_id AS VARCHAR) || '?tab=files',
                           '/pull/(\d+)', 1) AS BIGINT) AS pr_number
FROM documents
"""


def q_x9_sha_extract(spark, sf_dir):
    """X9: hex-SHA extraction + validation (src/commit_scraper.py:326-345) —
    pull the 32-hex digest out of surrounding prose and validate its shape."""
    d = _t(spark, sf_dir, "documents")
    prose = F.concat(F.lit("commit "), F.md5("text"), F.lit(" fixed the build"))
    sha = F.regexp_extract(prose, r"\b([0-9a-f]{32})\b", 1)
    return d.select(
        "doc_id",
        sha.alias("sha"),
        ((F.length(sha) == 32) & sha.rlike("^[0-9a-f]+$")).alias("valid"),
    )


SQL_X9 = r"""
SELECT doc_id,
       regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{32})\b', 1) AS sha,
       (length(regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{32})\b', 1)) = 32
        AND regexp_matches(regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{32})\b', 1), '^[0-9a-f]+$')) AS valid
FROM documents
"""


# X10 (real): the reference walks payload.preloadedQueries[].result.data.
# repository.issue.frontTimelineItems.edges filtering __typename ==
# 'IssueComment' (src/issue_scraper.py:408-505,507-557). The fixture embeds
# that exact nesting as a JSON string; the engine recovers it with an explicit
# nested StructType + from_json + explode + filter — all JVM-side.
_X10B_SCHEMA = (
    "payload STRUCT<preloadedQueries: ARRAY<STRUCT<result: STRUCT<data: "
    "STRUCT<repository: STRUCT<issue: STRUCT<number: BIGINT, state: STRING, "
    "frontTimelineItems: STRUCT<edges: ARRAY<STRUCT<node: "
    "STRUCT<__typename: STRING, author: STRUCT<login: STRING>, "
    "createdAt: STRING, body: STRING>>>>>>>>>>>"
)


def _x10b_json_spark():
    """Fixture payload with the full Comment shape (author/createdAt/body,
    reference src/models.py:38-42); comment timestamps are REVERSED for even
    doc_ids so the chronological sort (W4) is observable."""
    state = (
        F.when(F.col("doc_id") % 3 == 0, "open")
        .when(F.col("doc_id") % 3 == 1, "closed")
        .otherwise("merged")
    )
    did = F.col("doc_id").cast("string")
    even = F.col("doc_id") % 2 == 0
    ts1 = F.when(even, "2024-03-01T02:00:00Z").otherwise("2024-03-01T01:00:00Z")
    ts2 = F.when(even, "2024-03-01T01:00:00Z").otherwise("2024-03-01T02:00:00Z")
    a1 = F.concat(F.lit("u"), (F.col("doc_id") % 7).cast("string"))
    a2 = F.concat(F.lit("u"), ((F.col("doc_id") + 3) % 7).cast("string"))
    return F.concat(
        F.lit('{"payload":{"preloadedQueries":[{"result":{"data":{"repository":'
              '{"issue":{"number":'), did,
        F.lit(',"state":"'), state,
        F.lit('","frontTimelineItems":{"edges":['
              '{"node":{"__typename":"IssueComment","author":{"login":"'), a1,
        F.lit('"},"createdAt":"'), ts1,
        F.lit('","body":"b'), did, F.lit('-1"}},'
              '{"node":{"__typename":"CrossReferencedEvent","body":"x"}},'
              '{"node":{"__typename":"IssueComment","author":{"login":"'), a2,
        F.lit('"},"createdAt":"'), ts2,
        F.lit('","body":"b'), did, F.lit('-2"}}]}}}}}}]}}'),
    )


def q_x10b_embedded_timeline(spark, sf_dir):
    """X10 (deep) + W4: 5-level nested embedded-JSON extraction with
    typename filtering and CHRONOLOGICAL comment ordering — explicit schema,
    from_json, array_sort comparator, posexplode; no Python."""
    d = _t(spark, sf_dir, "documents")
    parsed = d.select(
        "doc_id", F.from_json(_x10b_json_spark(), _X10B_SCHEMA).alias("j")
    )
    q = parsed.select(
        "doc_id", F.explode("j.payload.preloadedQueries").alias("pq")
    ).select("doc_id", F.col("pq.result.data.repository.issue").alias("issue"))
    comments = F.transform(
        F.filter(
            F.col("issue.frontTimelineItems.edges"),
            lambda e: e["node"]["__typename"] == "IssueComment",
        ),
        lambda e: F.struct(
            e["node"]["author"]["login"].alias("author"),
            F.to_timestamp(e["node"]["createdAt"], "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("timestamp"),
            e["node"]["body"].alias("content"),
        ),
    )
    comments = F.array_sort(
        comments,
        lambda a, b: F.when(a["timestamp"] < b["timestamp"], -1)
        .when(a["timestamp"] > b["timestamp"], 1)
        .otherwise(0),
    )
    return (
        q.select(
            "doc_id",
            F.col("issue.number").alias("issue_number"),
            F.col("issue.state").alias("issue_state"),
            F.posexplode(comments).alias("pos", "c"),
        )
        .select(
            "doc_id", "issue_number", "issue_state",
            (F.col("pos") + 1).cast("int").alias("seq"),
            F.col("c.author").alias("author"),
            F.date_format("c.timestamp", "yyyy-MM-dd HH:mm:ss").alias("created_ts"),
            F.col("c.content").alias("content"),
        )
    )


# Oracle: the fixture is deterministic and closed-form — after the
# chronological sort, seq 1 is always the 01:00 comment; for even doc_ids
# that is comment #2 (timestamps reversed in the raw payload), so the sort
# is genuinely exercised, not a no-op.
SQL_X10B = """
WITH c AS (
  SELECT doc_id, seq,
         CASE WHEN doc_id % 2 = 0 THEN 3 - seq ELSE seq END AS cidx
  FROM documents, (VALUES (1), (2)) AS t(seq))
SELECT doc_id,
       CAST(doc_id AS BIGINT) AS issue_number,
       CASE WHEN doc_id % 3 = 0 THEN 'open'
            WHEN doc_id % 3 = 1 THEN 'closed' ELSE 'merged' END AS issue_state,
       CAST(seq AS INT) AS seq,
       'u' || CAST((doc_id + CASE WHEN cidx = 1 THEN 0 ELSE 3 END) % 7 AS VARCHAR) AS author,
       '2024-03-01 0' || CAST(seq AS VARCHAR) || ':00:00' AS created_ts,
       'b' || CAST(doc_id AS VARCHAR) || '-' || CAST(cidx AS VARCHAR) AS content
FROM c
"""


def q_x11_content_cleaning(spark, sf_dir):
    """X11: UI-boilerplate removal pass (reference strips 'Skip to content',
    nav/footer chrome etc., src/issue_scraper.py:342-364) + whitespace
    collapse, over text dirtied with known chrome."""
    d = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("Skip to content\nSign in to comment\n"),
        F.col("text"),
        F.lit("\nLoading\nWrite Preview"),
    )
    ui = r"(?i)(skip to content|sign in to comment|write preview|^loading$)"
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(dirty, ui, ""), r"\s+", " ")
    )
    return d.select("doc_id", cleaned.alias("cleaned"))


SQL_X11 = r"""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace('Skip to content' || chr(10) || 'Sign in to comment' || chr(10) || text || chr(10) || 'Loading' || chr(10) || 'Write Preview',
                   '(?i)(skip to content|sign in to comment|write preview|^loading$)', '', 'g'),
    '\s+', ' ', 'g')) AS cleaned
FROM documents
"""


def q_x14_state_classify(spark, sf_dir):
    """X14: content-derived state classification — the reference probes page
    text for merged/closed/open markers (src/pr_scraper.py:583-610)."""
    d = _t(spark, sf_dir, "documents")
    probe = F.concat(
        F.lit("Status: "),
        F.when(F.col("doc_id") % 4 == 0, "was merged into main")
        .when(F.col("doc_id") % 4 == 1, "closed this as not planned")
        .when(F.col("doc_id") % 4 == 2, "wants to merge 3 commits")
        .otherwise("opened this issue"),
    )
    state = (
        F.when(probe.contains("was merged"), "merged")
        .when(probe.contains("closed this"), "closed")
        .otherwise("open")
    )
    return d.select("doc_id", probe.alias("probe_text"), state.alias("state"))


SQL_X14 = """
SELECT doc_id,
  'Status: ' || CASE WHEN doc_id % 4 = 0 THEN 'was merged into main'
                     WHEN doc_id % 4 = 1 THEN 'closed this as not planned'
                     WHEN doc_id % 4 = 2 THEN 'wants to merge 3 commits'
                     ELSE 'opened this issue' END AS probe_text,
  CASE WHEN doc_id % 4 = 0 THEN 'merged'
       WHEN doc_id % 4 = 1 THEN 'closed' ELSE 'open' END AS state
FROM documents
"""


def q_j8_short_sha_join(spark, sf_dir):
    """J8: short-prefix -> full-hash resolution (src/commit_scraper.py:
    206-231): references carry an 8-char prefix; resolve by equi-joining on
    ``substring(full, 1, 8)`` — a plain join key, never a LIKE scan."""
    d = _t(spark, sf_dir, "documents")
    shas = d.select("doc_id", F.md5("text").alias("sha"))
    refs = d.select(
        F.col("doc_id").alias("ref_doc"),
        F.substring(F.md5("text"), 1, 8).alias("short_sha"),
    )
    return (
        refs.join(shas, F.substring(F.col("sha"), 1, 8) == F.col("short_sha"))
        .select("ref_doc", F.col("doc_id").alias("resolved_doc"), "sha", "short_sha")
    )


SQL_J8 = """
WITH shas AS (SELECT doc_id, md5(text) AS sha FROM documents),
refs AS (SELECT doc_id AS ref_doc, substr(md5(text), 1, 8) AS short_sha FROM documents)
SELECT ref_doc, s.doc_id AS resolved_doc, sha, short_sha
FROM refs JOIN shas s ON substr(s.sha, 1, 8) = refs.short_sha
"""


def q_t5_failure_ttl(spark, sf_dir):
    """T5: failed-entry TTL expiry (reference 7-day failed cache,
    src/failed_issue_cache.py:31,52-59): stamp expiry at failure time, an
    entry is retryable when the clock passes it."""
    ev = _t(spark, sf_dir, "events")
    expires = F.timestamp_add("DAY", F.lit(7), F.col("ts"))
    return (
        ev.filter(F.col("event_type") == "error")
        .select(
            "event_id",
            F.date_format(expires, "yyyy-MM-dd HH:mm:ss").alias("expires_ts"),
            (expires <= F.lit("2024-01-10 00:00:00").cast("timestamp")).alias("retryable"),
        )
    )


SQL_T5 = """
SELECT event_id,
       strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS expires_ts,
       (ts + INTERVAL 7 DAY <= TIMESTAMP '2024-01-10 00:00:00') AS retryable
FROM events WHERE event_type = 'error'
"""


def q_w2_budget_override(spark, sf_dir):
    """W2: per-key budget with an override table — the reference's
    REPOSITORY_PR_LIMITS map (src/config.py:96-102): override CAPS the
    token-derived budget, missing keys keep it."""
    ev = _t(spark, sf_dir, "events")
    base = F.floor(F.round(F.sum("value"), 4)).cast("long")
    override = F.when(F.col("user_id") % 10 == 0, F.lit(3).cast("long"))
    return (
        ev.groupBy("user_id")
        .agg(base.alias("base_budget"))
        .select(
            "user_id",
            "base_budget",
            F.least(F.col("base_budget"), F.coalesce(override, F.col("base_budget")))
            .alias("budget"),
        )
    )


SQL_W2 = """
SELECT user_id, base_budget,
       least(base_budget, coalesce(CASE WHEN user_id % 10 = 0 THEN 3 END, base_budget)) AS budget
FROM (SELECT user_id, CAST(floor(round(sum(value), 4)) AS BIGINT) AS base_budget
      FROM events GROUP BY user_id)
"""


def q_a9_cache_stats(spark, sf_dir):
    """A9: cache-statistics rollup (reference unified_cache_manager stats,
    src/unified_cache_manager.py:433-459): totals + hit rate per source."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("entries"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.round(F.count("*") / F.sum(F.count("*")).over(Window.partitionBy()), 6)
        .alias("share"),
    )


SQL_A9 = """
SELECT event_type, CAST(count(*) AS BIGINT) AS entries,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM events GROUP BY event_type
"""


def q_td_ngram_jaccard_pruned(spark, sf_dir):
    """Hot-shingle drop (the 100-TB path of the Jaccard verifier): shingles
    appearing in more than ``max_shingle_doc_freq`` docs are dropped BEFORE
    the inverted-index self-join — stopword shingles carry the skew."""
    from gh_crawler_spark.operators.dedup_text import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _spread(spark, _t(spark, sf_dir, "documents")), k=3, threshold=0.2,
        max_shingle_doc_freq=20,
    )


SQL_TD_JACCARD_PRUNED = rf"""
WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 20),
sh AS (SELECT sh0.* FROM sh0 JOIN keep ON keep.s = sh0.s),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT d1, d2, round(common * 1.0 / (sa.n + sb.n - common), 4) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.2
"""


def q_td_cc_groups(spark, sf_dir):
    """Exact near-dup GROUPS via distributed connected components (iterative
    min-label propagation — one shuffle per round, driver holds only the
    convergence flag). Fixture: chain edges (doc-1, doc) within runs of 10
    consecutive ids, so components are multi-hop and the closure is exact."""
    from gh_crawler_spark.operators.dedup_text import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = d.filter(F.col("doc_id") % 10 != 0).select(
        (F.col("doc_id") - 1).alias("d1"), F.col("doc_id").alias("d2")
    )
    return connected_components(pairs)


# closed-form oracle: a chain's min-reachable id is the start of its run
SQL_TD_CC = """
SELECT doc_id, CAST(doc_id - doc_id % 10 AS BIGINT) AS component
FROM documents
WHERE doc_id % 10 != 0
   OR EXISTS (SELECT 1 FROM documents d2
              WHERE d2.doc_id = documents.doc_id + 1 AND d2.doc_id % 10 != 0)
"""


def q_f3_same_repo_pull_links(spark, sf_dir):
    """F3: per-repo URL predicate (reference src/pr_scraper.py:431-448) —
    an extracted out-link is valid only if it is a ``/pull/N`` URL of the
    SAME repo as the page it came from. Static regex, captured repo compared
    to the page's repo — no per-row pattern compilation."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    links = F.array(
        F.concat(F.lit("https://git.example/org/"), F.col("source"),
                 F.lit("/pull/"), (F.col("doc_id") + 1).cast("string")),
        F.concat(F.lit("https://git.example/org/other/pull/"), did),
        F.concat(F.lit("https://git.example/org/"), F.col("source"),
                 F.lit("/issues/"), did),
        F.concat(F.lit("https://git.example/org/"), F.col("source"),
                 F.lit("/pull/"), did, F.lit("/files")),
    )
    link_repo = F.regexp_extract(
        F.col("link"), r"^https://git\.example/org/([^/]+)/pull/\d+$", 1
    )
    return (
        d.select("doc_id", "source", F.explode(links).alias("link"))
        .withColumn("valid", (link_repo != "") & (link_repo == F.col("source")))
    )


SQL_F3 = r"""
WITH links AS (
  SELECT doc_id, source, UNNEST(ARRAY[
    'https://git.example/org/' || source || '/pull/' || CAST(doc_id + 1 AS VARCHAR),
    'https://git.example/org/other/pull/' || CAST(doc_id AS VARCHAR),
    'https://git.example/org/' || source || '/issues/' || CAST(doc_id AS VARCHAR),
    'https://git.example/org/' || source || '/pull/' || CAST(doc_id AS VARCHAR) || '/files'
  ]) AS link
  FROM documents)
SELECT doc_id, source, link,
       (regexp_extract(link, '^https://git\.example/org/([^/]+)/pull/\d+$', 1) <> ''
        AND regexp_extract(link, '^https://git\.example/org/([^/]+)/pull/\d+$', 1) = source) AS valid
FROM links
"""


def q_f5_id_range_sanity(spark, sf_dir):
    """F5: id-range sanity predicate (reference src/issue_validator.py:18-41:
    ``0 < n <= 100000``) — candidates outside the plausible range are
    rejected before any fetch is attempted."""
    d = _t(spark, sf_dir, "documents")
    cand = (F.col("doc_id") * 37 % 150000) - 5
    return d.select(
        "doc_id",
        cand.alias("candidate"),
        ((cand > 0) & (cand <= 100000)).alias("valid"),
    )


SQL_F5 = """
SELECT doc_id, (doc_id * 37) % 150000 - 5 AS candidate,
       ((doc_id * 37) % 150000 - 5 > 0 AND (doc_id * 37) % 150000 - 5 <= 100000) AS valid
FROM documents
"""


def q_a6_checkpoint_stats(spark, sf_dir):
    """A6: checkpoint-statistics rollup (reference get_statistics,
    src/checkpoint_manager.py:282-296): totals, completed/failed split,
    completion rate, last-update watermark — one single-pass aggregate."""
    ev = _t(spark, sf_dir, "events")
    failed = F.sum((F.col("event_type") == "error").cast("long"))
    total = F.count("*")
    return ev.agg(
        total.alias("total"),
        (total - failed).alias("completed"),
        failed.alias("failed"),
        F.round((total - failed) / total, 6).alias("completion_rate"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_updated"),
    )


SQL_A6 = """
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(count(*) - sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS completed,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
       round((count(*) - sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)) * 1.0 / count(*), 6) AS completion_rate,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_updated
FROM events
"""


# --------------------------------------------------------------------------
# consolidated suites + SQL-expressible hash-sketch oracles (round 5)
#
# The driver records correctness rows for only the FIRST 50 registry entries,
# which squeezed 12 §2-operator oracles out of CORRECTNESS_r04 (round-4
# verdict item #2). Two moves close that: (a) per-row scalar trivia merges
# into SUITE queries — one row per source table, one column per operator, so
# the value-hash still verifies each op exactly; (b) the hash-sketch entries
# gain REAL DuckDB oracles via functions/duck_xxh64.py (XXH64 as pure SQL —
# verdict item #3), so nothing needs a rows-only waiver to sit in the window.
# The original fine-grained entries remain registered PAST the cap for
# bench.py timings and tools/check_oracles.py.
# --------------------------------------------------------------------------

from gh_crawler_spark.functions.duck_xxh64 import (
    XXH64_MACROS,
    xxh64_int_stages,
    xxh64_str_stages,
)


def q_x_scalar_suite(spark, sf_dir):
    """Events-table scalar-extraction suite: one column per operator —
    X2 safe-int (k_value), X3 k-suffix (parsed), X8 extract-all (refs),
    X10 embedded JSON (k_json), X13 timestamp round-trip (iso, roundtrip),
    X15 duration format (duration). Same expressions as the individual
    entries (kept past the cap); the hash compare verifies each column."""
    ev = _t(spark, sf_dir, "events")
    sec = (F.col("event_id") % 7200).cast("double")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    s3 = F.concat(F.round(F.col("value"), 1).cast("string"), F.lit("k"))
    return ev.select(
        "event_id",
        F.regexp_extract(F.regexp_replace("props", "[ ,]", ""), r"(\d+)", 1)
        .cast("long").alias("k_value"),
        F.round(F.regexp_extract(s3, r"([\d.]+)k", 1).cast("double") * 1000)
        .cast("long").alias("parsed"),
        F.array_join(F.regexp_extract_all(F.col("props"), F.lit(r"(\d+)"), 1), ",")
        .alias("refs"),
        F.from_json("props", "k INT").getField("k").alias("k_json"),
        iso.alias("iso"),
        F.date_format(
            F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        ).alias("roundtrip"),
        F.when(sec < 60, F.concat(sec.cast("int").cast("string"), F.lit(" seconds")))
        .when(sec < 3600, F.concat(F.round(sec / 60, 1).cast("string"), F.lit(" minutes")))
        .otherwise(F.concat(F.round(sec / 3600, 1).cast("string"), F.lit(" hours")))
        .alias("duration"),
    )


SQL_X_SCALAR_SUITE = r"""
SELECT event_id,
       CAST(regexp_extract(regexp_replace(props, '[ ,]', '', 'g'), '(\d+)', 1) AS BIGINT) AS k_value,
       CAST(round(CAST(regexp_extract(concat(CAST(round(value, 1) AS VARCHAR), 'k'), '([\d.]+)k', 1) AS DOUBLE) * 1000) AS BIGINT) AS parsed,
       array_to_string(regexp_extract_all(props, '(\d+)', 1), ',') AS refs,
       CAST(json_extract(props, '$.k') AS INT) AS k_json,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso,
       strftime(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '%Y-%m-%dT%H:%M:%S.%f'),
                '%Y-%m-%d %H:%M:%S.%f') AS roundtrip,
       CASE WHEN event_id % 7200 < 60
              THEN CAST(CAST(event_id % 7200 AS INT) AS VARCHAR) || ' seconds'
            WHEN event_id % 7200 < 3600
              THEN CAST(round((event_id % 7200) / 60.0, 1) AS VARCHAR) || ' minutes'
            ELSE CAST(round((event_id % 7200) / 3600.0, 1) AS VARCHAR) || ' hours'
       END AS duration
FROM events
"""


def q_x_doc_suite(spark, sf_dir):
    """Documents-table URL/text-extraction suite: X4 entity id (url,
    pr_number), X5 canonicalize (canonical_url), X6 url->filename (fname),
    X7 registrable domain (regdom), X9 SHA extract (sha, valid), X11
    content cleaning (cleaned), X12 title cleanup (title3), X14 state
    classify (probe_text, state), X16 frontier hash (url_hash — oracled by
    the pure-SQL XXH64 in functions/duck_xxh64.py)."""
    from gh_crawler_spark.functions.urls import url_hash_expr

    d = _t(spark, sf_dir, "documents")
    x4url = F.concat(
        F.lit("https://git.example/"), F.col("source"),
        F.lit("/pull/"), F.col("doc_id").cast("string"), F.lit("?tab=files"),
    )
    canon = canonicalize_url_expr(F.expr(_URL_SPARK))
    prose = F.concat(F.lit("commit "), F.md5("text"), F.lit(" fixed the build"))
    sha = F.regexp_extract(prose, r"\b([0-9a-f]{32})\b", 1)
    dirty = F.concat(
        F.lit("Skip to content\nSign in to comment\n"), F.col("text"),
        F.lit("\nLoading\nWrite Preview"),
    )
    ui = r"(?i)(skip to content|sign in to comment|write preview|^loading$)"
    probe = F.concat(
        F.lit("Status: "),
        F.when(F.col("doc_id") % 4 == 0, "was merged into main")
        .when(F.col("doc_id") % 4 == 1, "closed this as not planned")
        .when(F.col("doc_id") % 4 == 2, "wants to merge 3 commits")
        .otherwise("opened this issue"),
    )
    return d.select(
        "doc_id",
        x4url.alias("url"),
        F.regexp_extract(x4url, r"/pull/(\d+)", 1).cast("long").alias("pr_number"),
        canon.alias("canonical_url"),
        F.regexp_replace(
            F.regexp_replace(F.expr(_URL_SPARK), "^https?://", ""), "/", "_"
        ).alias("fname"),
        registrable_domain_expr(
            F.concat(F.lower("source"), F.lit(".docs.example.co.uk"))
        ).alias("regdom"),
        sha.alias("sha"),
        ((F.length(sha) == 32) & sha.rlike("^[0-9a-f]+$")).alias("valid"),
        F.trim(
            F.regexp_replace(F.regexp_replace(dirty, ui, ""), r"\s+", " ")
        ).alias("cleaned"),
        F.trim(F.substring_index("text", " ", 3)).alias("title3"),
        probe.alias("probe_text"),
        F.when(probe.contains("was merged"), "merged")
        .when(probe.contains("closed this"), "closed")
        .otherwise("open")
        .alias("state"),
        url_hash_expr(canon).alias("url_hash"),
    )


_X_DOC_KEEP = ("doc_id, url, pr_number, canonical_url, fname, regdom, sha, "
               "valid, cleaned, title3, probe_text, state")
_X_DOC_INNER = rf"""
SELECT doc_id,
       'https://git.example/' || source || '/pull/' || CAST(doc_id AS VARCHAR) || '?tab=files' AS url,
       CAST(regexp_extract('https://git.example/' || source || '/pull/' || CAST(doc_id AS VARCHAR) || '?tab=files',
                           '/pull/(\d+)', 1) AS BIGINT) AS pr_number,
       {_canon_duck(f'({_URL_DUCK})')} AS canonical_url,
       replace(regexp_replace(({_URL_DUCK}), '^https?://', ''), '/', '_') AS fname,
       'example.co.uk' AS regdom,
       regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{{32}})\b', 1) AS sha,
       (length(regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{{32}})\b', 1)) = 32
        AND regexp_matches(regexp_extract('commit ' || md5(text) || ' fixed the build', '\b([0-9a-f]{{32}})\b', 1), '^[0-9a-f]+$')) AS valid,
       trim(regexp_replace(
         regexp_replace('Skip to content' || chr(10) || 'Sign in to comment' || chr(10) || text || chr(10) || 'Loading' || chr(10) || 'Write Preview',
                        '(?i)(skip to content|sign in to comment|write preview|^loading$)', '', 'g'),
         '\s+', ' ', 'g')) AS cleaned,
       trim(CASE WHEN length(text) - length(replace(text, ' ', '')) >= 3
            THEN split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2) || ' ' || split_part(text, ' ', 3)
            ELSE text END) AS title3,
       'Status: ' || CASE WHEN doc_id % 4 = 0 THEN 'was merged into main'
                          WHEN doc_id % 4 = 1 THEN 'closed this as not planned'
                          WHEN doc_id % 4 = 2 THEN 'wants to merge 3 commits'
                          ELSE 'opened this issue' END AS probe_text,
       CASE WHEN doc_id % 4 = 0 THEN 'merged'
            WHEN doc_id % 4 = 1 THEN 'closed' ELSE 'open' END AS state
FROM documents
"""

SQL_X_DOC_SUITE = XXH64_MACROS + xxh64_str_stages(
    _X_DOC_INNER, "canonical_url", "url_hash", keep=_X_DOC_KEEP
)


def q_u_set_ops(spark, sf_dir):
    """U2+U3 combined set-operations entry: the U2 union-distinct seen-set
    summary and the U3 exceptAll remaining-work rows in one tagged relation
    (op, k) — U3 keeps row-level granularity; U2's two scalars become two
    tagged rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    u2 = (
        o.select(F.col("o_orderkey").alias("k"))
        .unionByName(li.select(F.col("l_orderkey").alias("k")))
        .distinct()
        .agg(F.count("*").alias("n_distinct"), F.sum("k").alias("sum_k"))
    )
    u2rows = u2.select(
        F.explode(
            F.array(
                F.struct(F.lit("u2_n_distinct").alias("op"), F.col("n_distinct").alias("k")),
                F.struct(F.lit("u2_sum").alias("op"), F.col("sum_k").alias("k")),
            )
        ).alias("r")
    ).select("r.op", "r.k")
    u3rows = (
        c.select("c_custkey")
        .exceptAll(o.select(F.col("o_custkey").alias("c_custkey")).distinct())
        .select(F.lit("u3_except").alias("op"), F.col("c_custkey").alias("k"))
    )
    return u2rows.unionByName(u3rows)


SQL_U_SET_OPS = """
SELECT 'u2_n_distinct' AS op, CAST(count(*) AS BIGINT) AS k
FROM (SELECT o_orderkey AS k FROM orders UNION SELECT l_orderkey AS k FROM lineitem)
UNION ALL
SELECT 'u2_sum' AS op, CAST(sum(k) AS BIGINT) AS k
FROM (SELECT o_orderkey AS k FROM orders UNION SELECT l_orderkey AS k FROM lineitem)
UNION ALL
SELECT 'u3_except' AS op, k FROM (
  SELECT c_custkey AS k FROM customer
  EXCEPT ALL
  SELECT DISTINCT o_custkey AS k FROM orders)
"""


# X16 standalone oracle (also covered as x_doc_suite.url_hash): the frontier
# key F.xxhash64(canonical_url) against the staged pure-SQL XXH64.
SQL_X16 = XXH64_MACROS + xxh64_str_stages(
    f"SELECT doc_id, {_canon_duck(f'({_URL_DUCK})')} AS __cu FROM documents",
    "__cu", "url_hash", keep="doc_id",
)


# ---- td_minhash_lsh oracle -------------------------------------------------
# Reproduces operators/dedup_text.py::minhash_lsh_pairs end-to-end in SQL:
# distinct word-3-gram shingles; Kirsch-Mitzenmacher h1/h2 from
# xxhash64(shingle) and the CHAINED xxhash64(shingle, lit(1)) (Spark hashes
# multi-column input by seeding each column's hash with the previous — the
# int 1 is hashed over its 4 LE bytes with seed = hash(shingle); parity
# pytest: tests/test_hashing.py::test_two_arg_chain); 32 signature minima;
# 8 bands of 4 re-hashed via xxhash64 of the comma-joined band slice;
# band-bucket candidate pairs; exact-Jaccard verification at the engine's
# ROUNDED threshold compare.
_MH_SHINGLES = rf"""
toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
dsh AS (SELECT DISTINCT s FROM sh)
"""

SQL_TD_MINHASH = (
    XXH64_MACROS
    + f"WITH {_MH_SHINGLES},\n"
    + "h1t AS ("
    + xxh64_str_stages("SELECT s FROM dsh", "s", "u1", keep="s", signed=False)
    + "),\nh2t AS ("
    + xxh64_int_stages("SELECT s, u1 FROM h1t", 1, "u2", keep="s, u1",
                       seed_expr="u1", signed=False)
    + """),
hh AS (SELECT s, (u1 % 4294967296)::BIGINT AS h1, (u2 % 4294967296)::BIGINT AS h2 FROM h2t),
sigs AS (
  SELECT sh.doc_id, i.i AS i, min(hh.h1 + i.i * hh.h2) AS g
  FROM sh JOIN hh ON sh.s = hh.s
  CROSS JOIN (SELECT unnest(range(0, 32)) AS i) i
  GROUP BY sh.doc_id, i.i),
sigl AS (SELECT doc_id, list(g ORDER BY i) AS sig FROM sigs GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b AS band,
         array_to_string(sig[4*b.b+1 : 4*b.b+4], ',') AS bstr
  FROM sigl CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b),
bh AS ("""
    + xxh64_str_stages("SELECT doc_id, band, bstr FROM bands", "bstr", "bhash",
                       keep="doc_id, band", signed=False)
    + """),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bh a JOIN bh b
           ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
common AS (SELECT c.d1, c.d2, count(*) AS common
           FROM cand c
           JOIN sh x ON x.doc_id = c.d1
           JOIN sh y ON y.doc_id = c.d2 AND y.s = x.s
           GROUP BY c.d1, c.d2)
SELECT d1, d2, round(common * 1.0 / (sa.n + sb.n - common), 4) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
WHERE round(common * 1.0 / (sa.n + sb.n - common), 4) >= 0.2
"""
)


# ---- td_simhash oracle -------------------------------------------------
# operators/dedup_text.py::simhash_near_pairs in SQL: per-token (with
# multiplicity) xxhash64 sign votes over 64 bits, packed signature, the
# d+1=4-chunk pigeonhole candidate join, bit_count(xor) verification.
SQL_TD_SIMHASH = (
    XXH64_MACROS
    + f"""
WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS t FROM documents),
dt AS (SELECT DISTINCT t FROM toks),
ht AS ("""
    + xxh64_str_stages("SELECT t FROM dt", "t", "ut", keep="t", signed=False)
    + """),
tok_h AS (SELECT toks.doc_id, ht.ut FROM toks JOIN ht ON toks.t = ht.t),
votes AS (
  SELECT doc_id, i.i AS i,
         sum(CASE WHEN (ut // (1::HUGEINT << i.i)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM tok_h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
  GROUP BY doc_id, i.i),
sigu AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END)::HUGEINT AS us
  FROM votes GROUP BY doc_id),
sig AS (SELECT doc_id, xx_signed(us) AS simhash, us FROM sigu),
chunks AS (
  SELECT doc_id, simhash, c.c AS chunk_id,
         ((us // (1::HUGEINT << (16 * c.c))) % 65536)::BIGINT AS cv
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                a.simhash AS s1, b.simhash AS s2
         FROM chunks a JOIN chunks b
           ON a.chunk_id = b.chunk_id AND a.cv = b.cv AND a.doc_id < b.doc_id)
SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= 3
"""
)


# ---- td_lsh_ann oracle -------------------------------------------------
# operators/similarity.py::lsh_topk in SQL. The hyperplanes are themselves
# xxhash64-derived constants (pmod(hash('plane:<id>:<j>'), 20000) - 10000)
# / 1e4, so with the SQL XXH64 the planes, bucket sign bits, candidate
# equi-join and exact re-rank are all oracle-expressible. The bucket dot
# product folds LEFT in index order exactly like the engine's
# F.aggregate(zip_with(...)) (list_reduce starts from element 1, and IEEE
# (0.0 + x) == x), so the sign bits match bit-for-bit.
SQL_TD_LSH_ANN = (
    XXH64_MACROS
    + """
WITH pl AS (
  SELECT t.t AS tbl, p.p AS p, j.j AS j,
         'plane:' || CAST(t.t*8 + p.p AS VARCHAR) || ':' || CAST(j.j AS VARCHAR) AS ps
  FROM (SELECT unnest(range(0, 2)) AS t) t
  CROSS JOIN (SELECT unnest(range(0, 8)) AS p) p
  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j),
ph AS ("""
    + xxh64_str_stages("SELECT tbl, p, j, ps FROM pl", "ps", "hs", keep="tbl, p, j")
    + """),
planes AS (
  SELECT tbl, p, list((((hs % 20000) + 20000) % 20000 - 10000) / 10000.0 ORDER BY j) AS pv
  FROM ph GROUP BY tbl, p),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dots AS (
  SELECT e.vec_id, pl.tbl, pl.p,
         list_reduce(list_transform(range(1, 65), k -> e.v[k] * pl.pv[k]), (a, b) -> a + b) AS d
  FROM e CROSS JOIN planes pl),
buckets AS (
  SELECT vec_id, tbl,
         CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, tbl),
qb AS (SELECT b.vec_id AS query_id, b.tbl, b.bucket, e.v AS qv
       FROM buckets b JOIN e ON e.vec_id = b.vec_id WHERE b.vec_id < 5),
cb AS (SELECT b.vec_id AS neighbor_id, b.tbl, b.bucket, e.v AS cv
       FROM buckets b JOIN e ON e.vec_id = b.vec_id),
cand AS (
  SELECT query_id, neighbor_id, any_value(qv) AS qv, any_value(cv) AS cv
  FROM cb JOIN qb USING (tbl, bucket)
  WHERE neighbor_id != query_id
  GROUP BY query_id, neighbor_id),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM cand),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 5
"""
)


def q_td_ivf_ann_full(spark, sf_dir):
    """IVF ANN at nprobe = n_cells (full probe): every stage of the inverted
    file runs — hash-seeded centroids, Lloyd refinement, cell assignment,
    probe ranking — and the result is PROVABLY the exact brute-force top-k
    (tests/test_similarity.py asserts the identity), so the brute-force SQL
    is a sound oracle. The nprobe < n_cells pruning path is pytest-gated
    (recall floor + file-level pruning assertions)."""
    from gh_crawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_cells=8, nprobe=8)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# ORDER MATTERS: the per-round driver records correctness rows for only the
# FIRST 50 entries. The first block is exactly 50 entries and covers every
# registry-checkable SURVEY §2 operator plus the full training-data family —
# per-row scalar trivia rides in two SUITE entries (one column per operator,
# so the value-hash still verifies each op), and every hash-sketch entry has
# a real DuckDB oracle via the pure-SQL XXH64 (functions/duck_xxh64.py).
# The second block keeps the fine-grained per-operator entries for bench.py
# timings and tools/check_oracles.py — identical expressions, same oracles.
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # --- filters -----------------------------------------------------------
    "f1_priority_filter": (q_f1_priority_filter, SQL_F1),
    "f3_same_repo_pull_links": (q_f3_same_repo_pull_links, SQL_F3),
    "f4_state_isin": (q_f4_state_isin, SQL_F4),
    "f5_id_range_sanity": (q_f5_id_range_sanity, SQL_F5),
    "f6_min_content": (q_f6_min_content, SQL_F6),
    "f10_status_classify": (q_f10_status_classify, SQL_F10),
    # --- joins -------------------------------------------------------------
    "j1_seen_anti_join": (q_j1_seen_anti_join, SQL_J1),
    "j2_remaining_work": (q_j2_remaining_work, SQL_J2),
    "j4_hash_equi_join": (q_j4_hash_equi_join, SQL_J4),
    "j5_lead_join": (q_j5_lead_join, SQL_J5),
    "j6_selector_rank_dedup": (q_j6_selector_rank_dedup, SQL_J6),
    "j8_short_sha_join": (q_j8_short_sha_join, SQL_J8),
    "j9_lookup_join": (q_j9_lookup_join, SQL_J9),
    # --- aggregates --------------------------------------------------------
    "a1_pricing_summary": (q_a1_pricing_summary, SQL_A1),
    "a2_a3_derived_arithmetic": (q_a2_a3_derived_arithmetic, SQL_A2A3),
    "a4_conditional_counts": (q_a4_conditional_counts, SQL_A4),
    "a5_progress_summary": (q_a5_progress_summary, SQL_A5),
    "a6_checkpoint_stats": (q_a6_checkpoint_stats, SQL_A6),
    "a7_throughput": (q_a7_throughput, SQL_A7),
    "a8_success_rate": (q_a8_success_rate, SQL_A8),
    "a9_cache_stats": (q_a9_cache_stats, SQL_A9),
    "a11_validation_agg": (q_a11_validation_agg, SQL_A11),
    # --- windows / limits / unions -----------------------------------------
    "w1_topk_per_key": (q_w1_topk_per_key, SQL_W1),
    "w2_budget_override": (q_w2_budget_override, SQL_W2),
    "w4_chronological_concat": (q_w4_chronological_concat, SQL_W4),
    "w5_first_wins_dedup": (q_w5_first_wins_dedup, SQL_W5),
    "l1_budget_cap": (q_l1_budget_cap, SQL_L1),
    "l2_global_topk": (q_l2_global_topk, SQL_L2),
    "l3_truncation": (q_l3_truncation, SQL_L3),
    "u1_union_dedup": (q_u1_union_dedup, SQL_U1),
    "u_set_ops": (q_u_set_ops, SQL_U_SET_OPS),
    # --- extraction (suites cover X2-X16 scalars; X10-deep is its own) ------
    "x_scalar_suite": (q_x_scalar_suite, SQL_X_SCALAR_SUITE),
    "x_doc_suite": (q_x_doc_suite, SQL_X_DOC_SUITE),
    "x10b_embedded_timeline": (q_x10b_embedded_timeline, SQL_X10B),
    # --- temporal/politeness + flagship pipeline ---------------------------
    "t2_backoff_schedule": (q_t2_backoff_schedule, SQL_T2),
    "t5_failure_ttl": (q_t5_failure_ttl, SQL_T5),
    "t10_staleness": (q_t10_staleness, SQL_T10),
    "frontier_pipeline": (q_frontier_pipeline, SQL_FRONTIER),
    # --- training-data pipeline --------------------------------------------
    "td_text_analysis": (q_td_text_analysis, SQL_TD_TEXT),
    "td_dedup_exact": (q_td_dedup_exact, SQL_TD_DEDUP_EXACT),
    "td_ngram_jaccard": (q_td_ngram_jaccard, SQL_TD_JACCARD),
    "td_ngram_jaccard_pruned": (q_td_ngram_jaccard_pruned, SQL_TD_JACCARD_PRUNED),
    "td_cc_groups": (q_td_cc_groups, SQL_TD_CC),
    "td_minhash_lsh": (q_td_minhash_lsh, SQL_TD_MINHASH),
    "td_simhash": (q_td_simhash, SQL_TD_SIMHASH),
    "td_ann_cosine": (q_td_ann_cosine, SQL_TD_ANN),
    "td_lsh_ann": (q_td_lsh_ann, SQL_TD_LSH_ANN),
    "td_ivf_ann": (q_td_ivf_ann_full, SQL_TD_ANN),
    "td_media_meta": (q_td_media_meta, SQL_TD_MEDIA),
    "td_frame_sample": (q_td_frame_sample, SQL_TD_FRAMES),
    # ===== entries below are PAST the driver's 50-entry recording cap ======
    # (the fine-grained per-operator forms of the suite columns above, plus
    # true variants; all still verified by tools/check_oracles.py)
    "j4b_nested_embed": (q_j4b_nested_embed, SQL_J4B),
    "x2_extract_int": (q_x2_extract_int, SQL_X2),
    "x3_k_suffix": (q_x3_k_suffix, SQL_X3),
    "x4_entity_id": (q_x4_entity_id, SQL_X4),
    "x5_canonicalize": (q_x5_canonicalize, SQL_X5),
    "x6_url_to_filename": (q_x6_url_to_filename, SQL_X6),
    "x7_registrable_domain": (q_x7_registrable_domain, SQL_X7),
    "x8_ref_extract": (q_x8_ref_extract, SQL_X8),
    "x9_sha_extract": (q_x9_sha_extract, SQL_X9),
    "x10_embedded_json": (q_x10_embedded_json, SQL_X10),
    "x11_content_cleaning": (q_x11_content_cleaning, SQL_X11),
    "x12_split_cleanup": (q_x12_split_cleanup, SQL_X12),
    "x13_timestamp_roundtrip": (q_x13_timestamp_roundtrip, SQL_X13),
    "x14_state_classify": (q_x14_state_classify, SQL_X14),
    "x15_duration_format": (q_x15_duration_format, SQL_X15),
    "x16_url_hash": (q_x16_url_hash, SQL_X16),
    "u2_union_seen_sets": (q_u2_union_seen_sets, SQL_U2),
    "u3_except": (q_u3_except, SQL_U3),
    # nprobe < n_cells IVF (the pruning path the driver-recorded full-probe
    # entry can't show; recall + file-pruning pytest-gated, rows-only here)
    "td_ivf_ann_probe": (q_td_ivf_ann, None),
}
