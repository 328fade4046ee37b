"""gh_crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
crawler LoveCatc/gh-crawler (see SURVEY.md): seed URLs -> canonicalize ->
xxhash64 -> Bloom-prefiltered seen anti-join -> politeness (per-host token
buckets, robots, circuit breaker) -> window-ranked (priority, next_fetch_ts)
fetch batches -> byte-identical text extraction -> per-round atomic snapshot
commits with lineage + metrics, resumable.

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row Python
in the hot path, no RDDs.
"""

__version__ = "0.1.0"
