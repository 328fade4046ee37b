"""Seed-JSON ingestion (S1/S2/F1/F2) and JSONL sink/recovery (S7-S9)."""

import json

from pyspark.sql import functions as F

from gh_crawler_spark.sources.jsonl import export_results_jsonl, recover_seen_from_jsonl
from gh_crawler_spark.sources.seeds import load_seeds_json, seed_summary

SEED_FILE = {
    "language": "Python",
    "summary": {"total_repositories": 3, "total_stars": 60, "average_stars": 20.0},
    "repositories": [
        {"url": "https://github.com/a/one", "stars": 50, "language": ["Python"]},
        {"url": "https://github.com/b/two", "stars": 9, "language": ["Go"]},
        {"url": "not a url", "stars": 999, "language": []},
        {"url": "https://site.example.com/page", "stars": 1, "language": None},
    ],
}


def test_load_seeds_json(spark, tmp_path):
    p1 = tmp_path / "s1.json"
    p1.write_text(json.dumps(SEED_FILE))
    p2 = tmp_path / "s2.json"
    other = dict(SEED_FILE, repositories=[
        {"url": "https://github.com/c/three", "stars": 30, "language": ["Rust"]}
    ])
    p2.write_text(json.dumps(other))

    seeds = load_seeds_json(spark, [str(p1), str(p2)])
    rows = {r["url"]: r for r in seeds.collect()}
    assert "not a url" not in rows            # F2 validity predicate
    assert set(rows) == {
        "https://github.com/a/one", "https://github.com/b/two",
        "https://site.example.com/page", "https://github.com/c/three",
    }
    assert rows["https://github.com/a/one"]["priority"] == 50.0
    assert rows["https://site.example.com/page"]["tags"] == []

    # F1 star threshold
    filtered = load_seeds_json(spark, [str(p1), str(p2)], min_priority=10)
    assert {r["url"] for r in filtered.collect()} == {
        "https://github.com/a/one", "https://github.com/c/three",
    }

    s = seed_summary(seeds).first()
    assert s["total_repositories"] == 4
    assert s["top_repository_url"] == "https://github.com/a/one"


def test_jsonl_roundtrip(spark, tmp_path):
    import datetime as dt

    rows = [
        ("https://x.com/a", 11, dt.datetime(2024, 1, 1), "fetched", "hello", "en", 0),
        ("https://x.com/b", 22, dt.datetime(2024, 1, 2), "fetched", "world", "en", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "url STRING, url_hash BIGINT, warc_ts TIMESTAMP, status STRING, "
        "text STRING, lang STRING, round INT",
    )
    out = str(tmp_path / "out_jsonl")
    export_results_jsonl(df, out, compress=False)
    seen = recover_seen_from_jsonl(spark, out)
    assert sorted(r["url_hash"] for r in seen.collect()) == [11, 22]
