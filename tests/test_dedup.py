"""J1: Bloom-prefiltered seen anti-join — no false negatives, exact result."""

import numpy as np
from pyspark.sql import functions as F

from gh_crawler_spark.operators.dedup import PartitionedBloom, filter_unseen


def test_bloom_no_false_negatives(spark):
    seen = spark.range(0, 5000).select(F.xxhash64("id").alias("url_hash"))
    bloom = PartitionedBloom.build(seen, n_buckets=16, expected_per_bucket=500)
    keys = np.array([r["url_hash"] for r in seen.collect()])
    assert bloom.might_contain_np(keys).all()


def test_bloom_fpp_reasonable(spark):
    seen = spark.range(0, 5000).select(F.xxhash64("id").alias("url_hash"))
    bloom = PartitionedBloom.build(seen, n_buckets=16, expected_per_bucket=500, fpp=0.01)
    fresh = spark.range(100_000, 110_000).select(F.xxhash64("id").alias("url_hash"))
    keys = np.array([r["url_hash"] for r in fresh.collect()])
    fp_rate = bloom.might_contain_np(keys).mean()
    assert fp_rate < 0.05  # 1% target with headroom


def test_filter_unseen_matches_exact_anti_join(spark):
    cands = spark.range(0, 3000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("payload")
    )
    seen = spark.range(1500, 4000).select(F.xxhash64("id").alias("url_hash"))
    bloom = PartitionedBloom.build(seen, n_buckets=8, expected_per_bucket=400)
    with_bloom = filter_unseen(cands, seen, bloom=bloom, spark=spark)
    exact = cands.join(seen, "url_hash", "left_anti")
    got = sorted(r["payload"] for r in with_bloom.collect())
    want = sorted(r["payload"] for r in exact.collect())
    assert got == want == list(range(0, 1500))


def test_add_df_matches_build_and_counts(spark):
    """Incremental distributed add == one-shot build, bit for bit; the
    returned key count replaces a separate count() job."""
    all_keys = spark.range(0, 4000).select(F.xxhash64("id").alias("url_hash"))
    first = spark.range(0, 2500).select(F.xxhash64("id").alias("url_hash"))
    second = spark.range(2500, 4000).select(F.xxhash64("id").alias("url_hash"))
    built = PartitionedBloom.build(all_keys, n_buckets=16, expected_per_bucket=300)
    inc = PartitionedBloom.empty(n_buckets=16, expected_per_bucket=300)
    assert inc.add_df(first) == 2500
    assert inc.add_df(second) == 1500
    assert set(built.bitmaps) == set(inc.bitmaps)
    for b, bits in built.bitmaps.items():
        assert np.array_equal(bits, inc.bitmaps[b]), b
    assert inc.add_df(spark.range(0, 0).select(F.xxhash64("id").alias("url_hash"))) == 0


def test_crawler_never_collects_url_hashes():
    """The flagship pipeline's serial-collection guard (round-1 verdict #2):
    crawler.py must not pull url_hash keys to the driver — Bloom maintenance
    goes through the distributed add_df path."""
    import inspect

    import gh_crawler_spark.crawler as crawler_mod

    src = inspect.getsource(crawler_mod)
    for line in src.splitlines():
        if ".collect()" in line:
            assert "url_hash" not in line, line


def test_filter_unseen_without_bloom(spark):
    cands = spark.range(0, 100).select(F.xxhash64("id").alias("url_hash"))
    seen = spark.range(50, 100).select(F.xxhash64("id").alias("url_hash"))
    assert filter_unseen(cands, seen).count() == 50
