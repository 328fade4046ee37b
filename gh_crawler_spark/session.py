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
    try:
        # Releasing a round's localCheckpoint blocks (crawler.truncate_lineage)
        # warns "lineage has been truncated and cannot be recomputed" once per
        # RDD — intentional (the round is over; nothing recomputes), so keep
        # the per-round noise out of WARN-level logs.
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd", jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:
        pass  # diagnostic nicety only; any log4j API drift is non-fatal
    return spark
