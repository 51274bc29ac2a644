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
