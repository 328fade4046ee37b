"""Training-data text analysis operators."""

from pyspark.sql import functions as F

from gh_crawler_spark.operators.textops import analyze_documents


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat and it was good", "en"),
        (1, "der hund ist ein tier und das ist gut", "de"),
        (2, "xyzzy plugh qwop zzz", "??"),
        (3, "", "??"),
        (4, "  the   cat  sat on the mat and it was good ", "en"),  # ws variant of 0
        (5, "Word! With, punct?! lots;; of:: it...", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_analyze_documents(spark):
    got = {r["doc_id"]: r for r in analyze_documents(_docs(spark)).collect()}
    assert got[0]["n_tokens"] == 10
    assert got[0]["lang_guess"] == "en"
    assert got[1]["lang_guess"] == "de"
    assert got[2]["lang_guess"] == "other"
    assert got[3]["n_tokens"] == 0
    # fingerprint is whitespace/case-normalized: doc 4 == doc 0
    assert got[4]["fingerprint"] == got[0]["fingerprint"]
    assert got[5]["punct_ratio"] > 0.2
    assert got[0]["quality"] > got[2]["quality"]


def test_quality_in_unit_interval(spark):
    rows = analyze_documents(_docs(spark)).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
