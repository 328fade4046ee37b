"""Multimodal binary-column plumbing (decode stub, metadata, frame sampling)."""

import pytest
from pyspark.sql import functions as F

from gh_crawler_spark.operators.multimodal import (
    as_media_table,
    extract_media_meta,
    fake_decode,
    frame_sample_plan,
    real_decode,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "short"), (1, "x" * 250), (2, "y" * 999)],
        "doc_id BIGINT, text STRING",
    )


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"bytes")


def test_media_meta_deterministic_fake(spark):
    media = as_media_table(_docs(spark))
    got = {r["doc_id"]: r for r in
           extract_media_meta(media, deterministic_fake=True).collect()}
    assert got[1]["n_bytes"] == 250
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == fake_decode(b"x" * 250)
    assert got[0]["media_type"] == "image/fake"


def test_media_meta_injectable_decode(spark):
    media = as_media_table(_docs(spark))
    got = extract_media_meta(media, decode_fn=lambda b: (7, 8, 9)).collect()
    assert all((r["width"], r["height"], r["n_channels"]) == (7, 8, 9) for r in got)


def test_frame_sample_plan(spark):
    media = as_media_table(_docs(spark))
    frames = frame_sample_plan(media, every_n=2).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    # doc 2: 999 bytes -> 9 fake frames -> samples 0,2,4,6,8
    assert sorted(per_doc[2]) == [0, 2, 4, 6, 8]
    assert sorted(per_doc[0]) == [0]
