"""X16: hash stability — pure-Python XXH64 must equal Spark's xxhash64, and
the DuckDB pure-SQL XXH64 (the oracle-side identity) must equal both."""

import random

from pyspark.sql import functions as F

from gh_crawler_spark.functions.hashing import xxhash64_bytes, xxhash64_py


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


def test_two_arg_chain(spark):
    """Spark's multi-column xxhash64 chains per column: hash(col2, seed=
    hash(col1, 42)), IntegerType hashed over its 4 LE bytes. The MinHash h2
    (xxhash64(shingle, lit(1)), dedup_text.py) and its DuckDB oracle
    (queries.SQL_TD_MINHASH via duck_xxh64.xxh64_int_stages) both lean on
    exactly this identity."""
    vals = ["", "a", "tok1 tok2 tok3", "x" * 57, "日本語テキスト"]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "s STRING")
        .select("s", F.xxhash64("s", F.lit(1)).alias("h2"))
        .collect()
    )
    for r in rows:
        u1 = xxhash64_bytes(r["s"].encode("utf-8"), 42)
        want_u = xxhash64_bytes((1).to_bytes(4, "little"), u1)
        want = want_u - (1 << 64) if want_u >= (1 << 63) else want_u
        assert want == r["h2"], r["s"]


def test_duckdb_sql_xxh64_parity():
    """functions/duck_xxh64.py (XXH64 as staged DuckDB SQL) equals
    hashing.xxhash64_bytes — which test_spark_parity pins to Spark — over
    random byte strings crossing every length regime (empty / tails only /
    1..3 stripes), plus the chained-seed int path."""
    import duckdb

    from gh_crawler_spark.functions.duck_xxh64 import (
        XXH64_MACROS,
        xxh64_int_stages,
        xxh64_stages,
        xxh64_str_stages,
    )

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(XXH64_MACROS)
    rng = random.Random(13)
    cases = [b"", b"a", b"abcd", b"abcdefgh", b"x" * 31, b"x" * 32, b"y" * 64,
             b"z" * 100] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 130)))
        for _ in range(25)
    ]
    for bs in cases:
        u = xxhash64_bytes(bs, 42)
        want = u - (1 << 64) if u >= (1 << 63) else u
        lst = "[" + ",".join(f"{b}::HUGEINT" for b in bs) + "]::HUGEINT[]"
        got = con.execute(
            xxh64_stages("SELECT 1 AS one", lst, "h", keep="one")
        ).fetchone()[1]
        assert int(got) == want, f"len={len(bs)}"
    # string path (UTF-8 bytes, not codepoints) + chained int-seed path
    strs = ["", "hello world", "日本語" * 9, "tok1 tok2 tok3", "x" * 57]
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(strs))
    inner = f"SELECT * FROM (VALUES {vals}) AS t(id, s)"
    q1 = xxh64_str_stages(inner, "s", "u1", keep="id, s", signed=False)
    q2 = xxh64_int_stages(f"({q1})", 1, "h2", keep="id, s", seed_expr="u1",
                          signed=False)
    for id_, s, h2 in con.execute(q2 + " ORDER BY id").fetchall():
        u1 = xxhash64_bytes(s.encode("utf-8"), 42)
        assert int(h2) == xxhash64_bytes((1).to_bytes(4, "little"), u1), s
