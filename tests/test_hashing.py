"""X16: hash stability — pure-Python XXH64 must equal Spark's xxhash64."""

from pyspark.sql import functions as F

from gh_crawler_spark.functions.hashing import xxhash64_py


def test_spark_parity(spark):
    vals = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "hello world",
        "https://example.com/path?a=1&b=2",
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "y" * 100,
        "日本語テキスト",
        "mixed 日本語 and ascii with spaces   ",
    ]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "s STRING")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxhash64_py(r["s"]) == r["h"], r["s"]


def test_deterministic():
    assert xxhash64_py("abc") == xxhash64_py("abc")
    assert xxhash64_py("abc") != xxhash64_py("abd")
