"""X1/L3/§5.2: extraction spec + the byte-identical corpus invariant."""

from pyspark.sql import functions as F

from gh_crawler_spark.functions.text import (
    extract_outlinks_py,
    extract_outlinks_udf,
    extract_text_py,
    extract_text_udf,
    truncate_ref,
)
from gh_crawler_spark.sources.pages import generate_pages


def test_strip_script_style():
    html = (
        b"<html><head><style>.x{}</style><script>bad()</script></head>"
        b"<body><p>Hello</p> <noscript>no</noscript><div>world &amp; more</div></body></html>"
    )
    assert extract_text_py(html) == "Hello world & more"


def test_whitespace_collapse():
    assert extract_text_py(b"<p>a\n\n  b</p>\t<p>c</p>") == "a b c"


def test_outlinks_canonicalized_deduped_ordered():
    html = (
        b'<a href="https://A.com/x/">one</a>'
        b'<a href="https://a.com/x">dup</a>'
        b'<a href="/rel">rel</a>'
        b'<a href="#frag">skip</a>'
        b'<a href="mailto:x@y.z">skip</a>'
        b'<a href="//cdn.b.com/y?b=2&a=1">proto-rel</a>'
    )
    got = extract_outlinks_py(html, "https://base.org/dir/page")
    assert got == [
        "https://a.com/x",
        "https://base.org/rel",
        "https://cdn.b.com/y?a=1&b=2",
    ]


def test_truncate_ref_rule():
    assert truncate_ref("abcdef", 4) == "abcd..."
    assert truncate_ref("abcd", 4) == "abcd"


def test_fast_equals_parser():
    """The regex engine and the html.parser reference implement ONE spec:
    byte-equal text and identical out-links across the synthetic corpus."""
    from gh_crawler_spark.functions.text import (
        extract_outlinks_parser_py,
        extract_text_parser_py,
    )
    from gh_crawler_spark.sources.pages import _make_html

    for seed, n, nd, paras in ((7, 400, 40, (1, 6)), (42, 1000, 100, (30, 70))):
        for i in range(0, 200):
            h = _make_html(seed, i, n, nd, paras)
            assert extract_text_py(h) == extract_text_parser_py(h), (seed, i)
            assert extract_outlinks_py(h, "https://b.org/x") == \
                extract_outlinks_parser_py(h, "https://b.org/x"), (seed, i)


def test_corpus_byte_identical(spark):
    """The per-row invariant (BASELINE.json input_hint): UDF(html) == text
    for every row of the synthetic corpus, compared inside Spark."""
    pages = generate_pages(spark, 400, seed=7, n_domains=40)
    bad = (
        pages.withColumn("got", extract_text_udf(F.col("html")))
        .filter(F.col("got") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_outlinks_udf_parity(spark):
    pages = generate_pages(spark, 50, seed=7, n_domains=40)
    rows = (
        pages.withColumn("links", extract_outlinks_udf(F.col("html"), F.col("url")))
        .select("url", "html", "links")
        .collect()
    )
    for r in rows:
        assert list(r["links"]) == extract_outlinks_py(bytes(r["html"]), r["url"])
