"""Per-query isolation bench (guide §1.4): noop-sink timing with repeats +
explain("formatted") dumps. Supplementary to the FROZEN bench.py — the driver
never runs this file; its numbers are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py                      # all headline queries, 3 reps
  python bench_extra.py td_minhash_lsh ...   # just those queries
  SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=before \
      python bench_extra.py                  # also dump explain() files

Reports, per query: rep1 (cold — what bench.py's single-shot sees: planning +
codegen + execution) and min of the remaining reps (steady-state execution).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import HEADLINE
    from gh_crawler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    names = sys.argv[1:] or HEADLINE

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    from gh_crawler_spark.queries import QUERIES

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out = {}
    for name in names:
        fn, _sql = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        samples = []
        for i in range(reps):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        out[name] = {
            "rep1": samples[0],
            "min_rest": min(samples[1:]) if len(samples) > 1 else None,
            "samples": samples,
        }
        log(f"  {name}: rep1={samples[0]}s rest={samples[1:]}")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}), flush=True)


if __name__ == "__main__":
    main()
