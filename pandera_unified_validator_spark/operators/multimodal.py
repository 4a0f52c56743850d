"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, UDF signatures, batch shape)
is real and tested. The codec layer (round 4) is REAL for the formats a
bare stdlib+numpy runtime can parse — uncompressed 24-bit **BMP** (decode,
nearest-neighbor resize, re-encode) and PCM **WAV** (decode to samples) —
with a soft PIL dispatch for compressed images when the library exists;
anything else raises ``NotImplementedError`` rather than silently emitting
stub output, and ``fake=True`` substitutes a deterministic hash-derived
feature vector so pipelines are testable without any payload parsing at
all. Payload bytes are only ever touched inside the mapInPandas stage.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table_schema",
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "decode_image_features",
    "decode_audio_features",
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


# ------------------------------------------------------------ real codecs --
# Pure stdlib+numpy parsers for the uncompressed container formats — no
# imaging/AV library required, bit-exact and deterministic.

def encode_bmp(arr) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += a[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


def decode_bmp(payload: bytes):
    """24-bit uncompressed BMP bytes → RGB uint8 array (h, w, 3)."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    rows = []
    for y in range(h):
        start = off + y * stride
        rows.append(np.frombuffer(payload, np.uint8, row, start).reshape(w, 3)[:, ::-1])
    a = np.stack(rows)
    return a[::-1] if bottom_up else a


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """int16 mono sample array → PCM WAV bytes."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(s), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(s),
    )
    return hdr + s


def decode_wav(payload: bytes):
    """PCM WAV bytes → (float64 mono samples in [-1, 1], sample_rate).
    Walks RIFF chunks; 16-bit PCM only (the interchange baseline)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    rate, channels, bits, data = None, None, None, None
    while pos + 8 <= n:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"only 16-bit PCM WAV (fmt={fmt} bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    x = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


def _image_features(arr, dim: int) -> list[float]:
    """Deterministic feature vector from an RGB array: [mean_r, mean_g,
    mean_b, aspect] + a g×g nearest-neighbor grayscale grid (g = ⌊√(dim−4)⌋),
    zero-padded to ``dim``. Everything rounds to 6 dp so the layout is
    engine-replayable (the driver oracle recomputes the channel means from
    the pixel-generation arithmetic in SQL)."""
    import numpy as np

    h, w, _ = arr.shape
    a = arr.astype("float64")
    head = [
        a[..., 0].mean() / 255.0,
        a[..., 1].mean() / 255.0,
        a[..., 2].mean() / 255.0,
        w / h,
    ]
    g = max(int((dim - 4) ** 0.5), 1)
    ys = np.linspace(0, h - 1, g).round().astype(int)
    xs = np.linspace(0, w - 1, g).round().astype(int)
    grid = (a.mean(axis=2)[np.ix_(ys, xs)] / 255.0).ravel()
    feat = head + grid.tolist()
    feat = feat[:dim] + [0.0] * max(dim - len(feat), 0)
    return [round(float(v), 6) for v in feat]


def _audio_features(x, rate: int, dim: int) -> list[float]:
    """[duration_sec, rms, peak, zero-crossing rate] + (dim−4)-chunk
    mean-abs envelope, zero-padded to ``dim``; 6-dp rounding."""
    import numpy as np

    n = len(x)
    head = [
        n / rate,
        float(np.sqrt((x * x).mean())) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0,
    ]
    k = max(dim - 4, 1)
    env = []
    if n:
        edges = np.linspace(0, n, k + 1).astype(int)
        env = [
            float(np.abs(x[a:b]).mean()) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    feat = head + env
    feat = feat[:dim] + [0.0] * max(dim - len(feat), 0)
    return [round(float(v), 6) for v in feat]


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
    one out; payload column read only here). REAL decode for uncompressed
    24-bit BMP payloads (stdlib+numpy, ``decode_bmp``); other formats
    dispatch to PIL when importable, else raise — never silently emit stub
    vectors as if they were decoded features. ``fake=True`` bypasses
    parsing entirely with the sha256-derived stand-in."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def decode_one(p: bytes) -> list[float]:
        import numpy as np

        if p[:2] == b"BM":
            return _image_features(decode_bmp(p), dim)
        try:  # pragma: no cover - PIL absent in this container
            import io

            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            raise NotImplementedError(
                "payload is not BMP and PIL is unavailable; only uncompressed "
                "24-bit BMP decodes without an imaging library "
                "(pass fake=True for the deterministic stub)"
            ) from None
        arr = np.asarray(Image.open(io.BytesIO(p)).convert("RGB"))  # pragma: no cover
        return _image_features(arr, dim)  # pragma: no cover

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if fake:
                feats = [
                    _fake_features(p, dim) if p is not None else None
                    for p in pdf[payload_col]
                ]
            else:
                feats = [
                    decode_one(bytes(p)) if p is not None else None
                    for p in pdf[payload_col]
                ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode audio → feature vectors (duration/rms/peak/zero-cross +
    mean-abs envelope) via mapInPandas. REAL decode for 16-bit PCM WAV
    (stdlib struct + numpy, ``decode_wav``); other containers raise.
    Same batch contract as ``decode_image_features``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if fake:
                feats = [
                    _fake_features(p, dim) if p is not None else None
                    for p in pdf[payload_col]
                ]
            else:
                feats = [
                    _audio_features(*decode_wav(bytes(p)), dim) if p is not None else None
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
    """Resize images to (width, height). REAL for uncompressed 24-bit BMP
    payloads: decode → nearest-neighbor index resample → re-encode as BMP
    (pure numpy; deterministic). Non-BMP payloads raise unless ``fake``,
    which substitutes the sha256-truncated placeholder payload. Metadata
    dims are rewritten either way."""
    schema = df.schema

    def resize_one(p: bytes) -> bytes:
        import numpy as np

        if p[:2] != b"BM":
            raise NotImplementedError(
                "payload is not BMP; real resize is implemented for "
                "uncompressed 24-bit BMP only (pass fake=True for the stub)"
            )
        arr = decode_bmp(p)
        h, w, _ = arr.shape
        ys = np.linspace(0, h - 1, height).round().astype(int)
        xs = np.linspace(0, w - 1, width).round().astype(int)
        return encode_bmp(arr[np.ix_(ys, xs)])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            if fake:
                pdf[payload_col] = [
                    None if p is None else hashlib.sha256(bytes(p)).digest()
                    for p in pdf[payload_col]
                ]
            else:
                pdf[payload_col] = [
                    None if p is None else resize_one(bytes(p))
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
