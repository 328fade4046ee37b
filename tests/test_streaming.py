"""Structured Streaming layer: extract -> dedup -> windowed metrics."""

import pytest

from gh_crawler_spark.sources.pages import PAGES_SCHEMA, generate_pages
from gh_crawler_spark.streaming.stream import (
    dedup_stream,
    rate_limit_stream,
    stream_extract,
    throughput_metrics_stream,
)


@pytest.fixture(scope="module")
def drop_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("drop")
    generate_pages(spark, 120, seed=5, n_domains=20).write.mode("overwrite").parquet(str(d))
    return str(d)


def _run(query_builder, name):
    q = query_builder.queryName(name).format("memory").trigger(availableNow=True).start()
    q.awaitTermination(120)
    return q


def test_stream_extract_and_dedup(spark, drop_dir, tmp_path):
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    deduped = dedup_stream(stream_extract(stream))
    q = _run(
        deduped.writeStream.option("checkpointLocation", str(tmp_path / "ck1")),
        "t_extracted",
    )
    out = spark.sql("SELECT * FROM t_extracted")
    assert out.count() == 120  # corpus has unique canonical urls
    row = out.first()
    assert row["url_hash"] is not None and row["text"]
    # canonical urls: no fragments, lowercase hosts
    assert all("#" not in r["canonical_url"] for r in out.collect())
    q.stop()


def test_rate_limit_stream_stateful(spark, drop_dir, tmp_path):
    """T1 as applyInPandasWithState: a tight per-domain bucket admits at most
    `capacity` urls of each domain in the (single) micro-batch; the rest are
    emitted admitted=false, never dropped."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    limited = rate_limit_stream(stream_extract(stream), rate_per_s=0.0, capacity=3.0)
    q = _run(
        limited.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3")),
        "t_limited",
    )
    out = spark.sql(
        "SELECT registrable_domain, "
        "sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS ok, count(*) AS n "
        "FROM t_limited GROUP BY registrable_domain"
    ).collect()
    assert out  # stream produced per-domain rows
    total = sum(r["n"] for r in out)
    assert total == 120  # nothing dropped, only flagged
    for r in out:
        assert r["ok"] <= 3
        assert r["ok"] == min(3, r["n"])  # bucket admits exactly its capacity
    q.stop()


def test_throughput_metrics_stream(spark, drop_dir, tmp_path):
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    metrics = throughput_metrics_stream(stream_extract(stream), window="1 day")
    q = _run(
        metrics.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2")),
        "t_metrics",
    )
    out = spark.sql("SELECT sum(n_urls) AS total FROM t_metrics").first()
    # append mode emits only watermark-finalized windows: the trailing
    # window (still inside the watermark horizon at stream end) is withheld
    assert 100 <= out["total"] <= 120
    q.stop()
