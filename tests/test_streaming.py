"""Structured Streaming layer: extract -> dedup -> windowed metrics."""

import pytest

from gh_crawler_spark.sources.pages import PAGES_SCHEMA, generate_pages
from gh_crawler_spark.streaming.stream import (
    dedup_stream,
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
