from gh_crawler_spark.streaming.stream import (  # noqa: F401
    dedup_stream,
    stream_extract,
    throughput_metrics_stream,
)
