"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The default decoder (:func:`real_decode`)
parses PNG/GIF/JPEG *headers* with pure stdlib ``struct`` — exactly the
metadata this stage returns — so it needs no native libs. Pixel-level work
(PIL/ffmpeg/librosa are NOT in this container) comes in through the
injectable ``decode_fn``; ``deterministic_fake=True`` produces seed-stable
fake metadata from the bytes themselves for oracle-checked tests. The
Spark-side plumbing — schema, batch shape, partition flow — is real and
tested either way.

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


# PNG color type -> sample channels (spec: 0 gray, 2 RGB, 3 palette-indexed,
# 4 gray+alpha, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers carry the frame header; C4/C8/CC look like SOFs but are
# DHT / JPG-extension / DAC
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def real_decode(payload: bytes) -> tuple[int, int, int]:
    """Header-only image decode: (width, height, n_channels) for PNG / GIF /
    JPEG via pure-stdlib ``struct`` — the metadata this operator actually
    returns needs no pixel decode, so no PIL/ffmpeg dependency. Full pixel
    work (resize, feature extraction) still comes in through the injectable
    ``decode_fn``.

    Raises ``ValueError`` for payloads that aren't one of the three formats
    (route those through an injected decoder or ``deterministic_fake``).
    """
    import struct

    # PNG: 8-byte signature, then the IHDR chunk (len+type at 8..16,
    # width/height big-endian at 16..24, bit depth + color type follow)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("truncated/invalid PNG: no IHDR at offset 12")
        width, height = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return (int(width), int(height), _PNG_CHANNELS.get(color_type, 3))

    # GIF: 6-byte version, then the logical screen descriptor
    # (width/height little-endian u16); pixels are palette-indexed RGB
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF: no logical screen descriptor")
        width, height = struct.unpack("<HH", payload[6:10])
        return (int(width), int(height), 3)

    # JPEG: walk the marker stream to the first SOFn frame header
    # (precision u8, height u16 BE, width u16 BE, component count u8)
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:  # not a marker — corrupt stream
                break
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length segment
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    break
                precision_off = i + 4
                height, width = struct.unpack(
                    ">HH", payload[precision_off + 1 : precision_off + 5]
                )
                n_components = payload[precision_off + 5]
                return (int(width), int(height), int(n_components))
            i += 2 + seg_len
        raise ValueError("JPEG with no parseable SOF frame header")

    raise ValueError(
        "unrecognized image format (PNG/GIF/JPEG headers supported); inject "
        "decode_fn for other formats or use deterministic_fake=True"
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
