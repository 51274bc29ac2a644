"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` kernels so each executor processes media
in columnar batches without JVM round trips.

The actual codecs (PIL/libav/...) are NOT available in this
environment, so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives "pixels" from the bytes — keeping
the Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) real and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema for a multimodal asset row
MEDIA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("data", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType(), True), True),
    ]
)


def _fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte histogram folded
    to ``dim`` buckets, L1-normalized."""
    buckets = [0] * dim
    for b in data:
        buckets[b % dim] += 1
    total = sum(buckets) or 1
    return [b / total for b in buckets]


def decode_image(data: bytes):
    """Real decoder entry point — image libs absent in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this environment; "
        "use extract_features(..., fake=True) for the deterministic stub"
    )


def extract_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """media rows → (asset_id, n_bytes, feature array<float>).

    Arrow-batched; one pandas batch in, one out. At scale this is a pure
    map stage: no shuffle, executor-local decode, output columnar.
    """
    import pandas as pd

    if not fake:
        decode_image(b"")  # raises: real codecs unavailable

    def run(batches):
        for pdf in batches:
            feats = [
                _fake_decode(bytes(d) if d is not None else b"", dim) for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(bytes(d)) if d is not None else 0 for d in pdf["data"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("data", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image rows → resized binary (Arrow-batched mapInPandas).

    A real implementation would decode with PIL and re-encode; the
    deterministic fake keeps the plumbing honest — output bytes derive
    from the input bytes and requested dims, so round-trip tests can
    assert on them."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = r["data"]
                if data is None:
                    rows.append((r["asset_id"], None, width, height))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image codecs unavailable in this environment; "
                        "use fake=True or plug in PIL"
                    )
                # fake resize: resample the byte stream to width*height
                n = max(1, len(data))
                out = bytes(
                    data[(i * n) // (width * height)] for i in range(width * height)
                )
                rows.append((r["asset_id"], out, width, height))
            yield pd.DataFrame(
                rows, columns=["asset_id", "data", "width", "height"]
            )

    return media.where(F.col("media_type") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def _probe_bytes(data: bytes):
    """(format, width, height, sample_rate, duration_ms) from container
    headers only — REAL parsing (PNG/GIF/BMP/JPEG/WAV magic + headers),
    no codec library involved; pixel decode stays behind the stub."""
    import struct

    if data is None or len(data) < 12:
        return (None, None, None, None, None)
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack_from(">II", data, 16)
        return ("png", w, h, None, None)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return ("gif", w, h, None, None)
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        return ("bmp", w, abs(h), None, None)
    if data[:2] == b"\xff\xd8":  # JPEG: walk markers to the first SOF
        p = 2
        while p + 9 < len(data):
            if data[p] != 0xFF:
                p += 1
                continue
            marker = data[p + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                p += 2
                continue
            seglen = struct.unpack_from(">H", data, p + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", data, p + 5)
                return ("jpeg", w, h, None, None)
            p += 2 + seglen
        return ("jpeg", None, None, None, None)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        p = 12
        rate, byte_rate, data_size = None, None, None
        while p + 8 <= len(data):
            cid = data[p : p + 4]
            csize = struct.unpack_from("<I", data, p + 4)[0]
            if cid == b"fmt " and p + 16 <= len(data):
                rate, byte_rate = struct.unpack_from("<II", data, p + 12)
            elif cid == b"data":
                data_size = csize
            p += 8 + csize + (csize & 1)
        dur = (
            int(data_size * 1000 / byte_rate)
            if data_size is not None and byte_rate
            else None
        )
        return ("wav", None, None, rate, dur)
    return ("unknown", None, None, None, None)


def probe_media(media: DataFrame) -> DataFrame:
    """media rows → header-derived metadata (Arrow-batched mapInPandas).

    Unlike :func:`extract_features`, this path is fully REAL: container
    formats are identified and dimensioned from their headers
    (PNG IHDR, GIF screen descriptor, BMP info header, JPEG SOF
    markers, WAV fmt/data chunks) without any codec dependency. Pure
    narrow map — no shuffle, columnar in/out."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            probed = [
                _probe_bytes(bytes(d) if d is not None else None)
                for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": [p[0] for p in probed],
                    "width": pd.array([p[1] for p in probed], dtype="Int32"),
                    "height": pd.array([p[2] for p in probed], dtype="Int32"),
                    "sample_rate": pd.array([p[3] for p in probed], dtype="Int32"),
                    "duration_ms": pd.array([p[4] for p in probed], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → frame-sample plan (asset_id, frame_idx, ts_ms).

    The frame *schedule* is computed JVM-side with ``sequence``; actual
    frame extraction would plug into the stubbed decoder."""
    return media.where(F.col("media_type") == "video").select(
        "asset_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") - 1) / every_ms, F.lit(0)).cast("long"))
        ).alias("frame_idx", "step"),
    ).select("asset_id", "frame_idx", (F.col("step") * every_ms).alias("ts_ms"))
