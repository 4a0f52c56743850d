"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, UDF signatures, batch shape)
is real and tested; the codec step is STUBBED — the container ships no
image/audio libraries, so decode raises ``NotImplementedError`` unless a
library is importable, and ``fake=True`` substitutes a deterministic
hash-derived feature vector so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table_schema",
    "decode_image_features",
    "resize_images",
    "sample_video_frames",
]

# canonical media-table layout: payload stays opaque binary; all filtering /
# routing happens on the typed metadata (so scans prune without touching
# payload bytes — at 100 TB the payload column is only read by the UDF stage)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def media_table_schema():
    """ValidationSchema for the media table (engine-checkable metadata)."""
    from ..plans.schema import SchemaBuilder

    return (
        SchemaBuilder("media")
        .column("media_id", "str", nullable=False, unique=True)
        .column("kind", "str", nullable=False, isin=["image", "audio", "video"])
        .column("width", "int", ge=1, le=65536)
        .column("height", "int", ge=1, le=65536)
        .column("duration_ms", "int", ge=0)
        .column("payload", "binary")
        .conditional_check("video_has_duration", "kind = 'video'", "duration_ms IS NOT NULL")
        .build()
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: sha256-seeded, unit-scaled."""
    h = hashlib.sha256(payload or b"").digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    return [
        int.from_bytes(raw[i * 4 : (i + 1) * 4], "big") / 2**32 for i in range(dim)
    ]


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Decode images → feature vectors via mapInPandas (one Arrow batch in,
    one out; payload column read only here). Real decode needs PIL — absent
    in this container → NotImplementedError unless ``fake``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            # real decode is NOT implemented — never silently emit stub
            # vectors as if they were decoded features, even with PIL present
            raise NotImplementedError(
                "real image decode is not implemented (container ships no "
                "imaging libs); pass fake=True for the deterministic stub"
            )
        for pdf in batches:
            feats = [
                _fake_features(p, dim) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize stub: passes metadata through with new dims; payload re-encode
    is the stubbed step (sha256-truncated placeholder when ``fake``)."""
    schema = df.schema

    def run(batches: Iterator) -> Iterator:
        if not fake:
            raise NotImplementedError(
                "real image resize is not implemented; pass fake=True for the stub"
            )
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            pdf[payload_col] = [
                None if p is None else hashlib.sha256(bytes(p)).digest()
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp (frame payload
    stubbed). Output schema (media_id, ts_ms, frame) — the real decoder slots
    in behind the same mapInPandas signature."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            raise NotImplementedError(
                "video decode requires an AV library (not in this container); "
                "pass fake=True for the deterministic stub"
            )
        for pdf in batches:
            # vectorized row expansion: one repeat + one concatenated
            # timestamp ramp per batch (no per-row Python loop); only the
            # frame digests remain per-output-row work, which a real decoder
            # replaces wholesale behind this same signature.
            import numpy as np

            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            counts = np.maximum((dur + every_ms - 1) // every_ms, 0)
            ids = pdf[id_col].to_numpy().repeat(counts)
            ts = (
                np.concatenate([np.arange(c, dtype="int64") for c in counts])
                * every_ms
                if counts.sum()
                else np.array([], dtype="int64")
            )
            frames = [
                hashlib.sha256(f"{i}@{t}".encode()).digest()
                for i, t in zip(ids, ts)
            ]
            yield pd.DataFrame({id_col: ids, "ts_ms": ts, "frame": frames})

    return df.filter(F.col("kind") == "video").select(
        id_col, "duration_ms"
    ).mapInPandas(run, out_schema)
