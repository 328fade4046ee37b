"""SparkSession factory tuned for the crawl engine.

Local-mode settings mirror what we would submit to a real cluster via
``spark-submit --py-files engine.zip`` (see bench.py): AQE on (runtime
coalescing + skew-join handling for the seen anti-join), Arrow on (all engine
UDFs are pandas/Arrow-vectorized), shuffle partitions sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession


_PY_WARMED: set[str] = set()


def _prefork_python_workers(spark: SparkSession) -> None:
    """Pre-fork one Arrow/pandas Python worker per core at session build.

    The first pandas-UDF job of a session pays worker daemon startup plus a
    per-worker ``import pandas`` (~0.5 s each, one wave across the cores) —
    a one-time session cost that production amortizes over hours but that
    otherwise lands inside whichever operator happens to touch the Python
    boundary first (guide §4.5: heavyweight init belongs in setup, not the
    measured path). One tiny 1-task-per-core pandas job moves it to session
    construction; ``spark.python.worker.reuse`` (default on) keeps the warm
    workers for every later task. Guarded per application id — getOrCreate
    callers share one session and must not re-pay it."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PY_WARMED or os.environ.get("SPARK_GRAFT_NO_PYWARM"):
        return
    _PY_WARMED.add(app_id)
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        n = spark.sparkContext.defaultParallelism

        @F.pandas_udf("long")
        def _warm(s: "pd.Series") -> "pd.Series":
            return s

        spark.range(n, numPartitions=n).select(_warm("id")).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass  # warm-up is best-effort; a failure must never block the session


def get_spark(
    app_name: str = "gh_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` -> ``local[*]``. On a real cluster the same engine code is
    submitted with ``spark-submit --master yarn|k8s --py-files engine.zip``;
    nothing here is local-mode-specific except the master URL.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    master = f"local[{cores}]" if cores and cores > 0 else "local[*]"
    n_shuffle = shuffle_partitions or (cores if cores and cores > 0 else (os.cpu_count() or 8))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("SPARK_GRAFT_ARROW_BATCH", "512"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Snapshot-table reads pass explicit file lists from the manifest
        # (tables.py), so there is no directory tree to discover — but any
        # read of >32 paths still launched a distributed "listing leaf
        # files" JOB (default parallelPartitionDiscovery.threshold=32) just
        # to stat known files. Round-6 event-log profile: those listing jobs
        # cost whole seconds per crawl round (948-path transitions delta,
        # 191-319-path frontier/seen). Below the threshold the driver stats
        # the files itself — microseconds on local disk, and still the right
        # call for manifest-backed tables on a real cluster where the
        # listing is one RPC per known file, not a tree walk.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    )
    # Diagnostic overrides (event logging for gap profiling, etc.) without
    # touching call sites: SPARK_GRAFT_EXTRA_CONF='{"spark.eventLog.enabled":
    # "true", ...}'. Explicit extra_conf from the caller wins.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    merged = dict(json.loads(env_conf)) if env_conf else {}
    merged.update(extra_conf or {})
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _prefork_python_workers(spark)
    try:
        # Releasing a round's localCheckpoint blocks (crawler.truncate_lineage)
        # warns "... was locally checkpointed, its lineage has been truncated"
        # once per RDD — intentional (the round is over; nothing recomputes),
        # so keep the per-round noise out of WARN-level logs. Scoped to the
        # emitting CLASS logger (org.apache.spark.rdd.RDD — verified against
        # the spark-core jar), not the whole rdd package: checkpoint-data /
        # block-loss warnings from sibling classes still surface (ADVICE r5).
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.RDD", jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:
        pass  # diagnostic nicety only; any log4j API drift is non-fatal
    return spark
