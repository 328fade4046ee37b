"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The decode libraries (PIL/ffmpeg/librosa)
are NOT in this container, so the decode step is stubbed: ``decode_fn`` is
injectable; the default raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces seed-stable fake metadata from the
bytes themselves. The Spark-side plumbing — schema, batch shape, partition
flow — is real and tested either way.

Scale notes: binary columns must NEVER be read when a query doesn't need them
(column pruning does this automatically as long as the payload sits in its own
column); decode parallelism = input partitions, so repartition by size bands
before heavy decodes to level batch cost.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: wrap a text table as a media table (payload = utf-8 bytes),
    so the binary plumbing is exercised against the synthetic corpus."""
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived purely from byte length
    (identical formula is used by the SQL oracle)."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 3 + 1)


def real_decode(payload: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "image decode requires PIL/ffmpeg, not present in this container; "
        "inject decode_fn or use deterministic_fake=True"
    )


def extract_media_meta(
    media: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode/metadata stage as mapInPandas (Arrow batches of binary)."""
    fn = decode_fn or (fake_decode if deterministic_fake else real_decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [fn(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_channels": [m[2] for m in meta],
                }
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: emits (doc_id, frame_no) rows for frames the
    decode stage would extract — pure exprs; actual pixel extraction is the
    stubbed decode. Demonstrates the explode/flatMap shape for video."""
    n_frames = (F.octet_length("payload") / 100).cast("int")  # fake frame count
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_no"),
    )
