"""Parquet I/O with the genome-partitioned layout + metadata sidecars.

Reference conventions replicated exactly:
- flat Parquet save/load with metadata sidecars
  (GenomicDataset.scala:324-347; ADAMContext.loadParquet* :1814-1857)
- partitioned layout: ``positionBin = floor(start / partitionSize)``,
  written ``partitionBy("referenceName", "positionBin")`` with a
  ``_partitionedByStartPos`` flag file recording the bin size
  (GenomicDataset.saveAsPartitionedParquet :380-394, ADAMContext
  :3763, GenomicDataset.scala:365-371)
- region loads on the partitioned layout add bin-range clauses so
  Catalyst prunes partitions, with a 1-bin lookback for records that
  straddle a bin boundary (GenomicDataset.scala:3355-3383)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adam_spark.core.genomic_frame import GenomicFrame
from adam_spark.core.metadata import GenomicMetadata

FLAG_FILE = "_partitionedByStartPos"
DEFAULT_PARTITION_SIZE = 1_000_000


def save_parquet(gf: GenomicFrame, path: str, mode: str = "error") -> None:
    gf.df.write.mode(mode).parquet(path)
    gf.meta.save(path)


def load_parquet(spark: SparkSession, path: str, kind: str | None = None) -> GenomicFrame:
    meta = GenomicMetadata.load(path)
    if kind is not None:
        meta.kind = kind
    return GenomicFrame(spark.read.parquet(path), meta)


def save_partitioned_parquet(
    gf: GenomicFrame,
    path: str,
    partition_size: int = DEFAULT_PARTITION_SIZE,
    mode: str = "error",
) -> None:
    """Hive-partitioned write on (referenceName, positionBin)."""
    df = gf.df.withColumn(
        "positionBin", F.floor(F.col("start") / F.lit(float(partition_size)))
    )
    df.write.mode(mode).partitionBy("referenceName", "positionBin").parquet(path)
    gf.meta.save(path)
    with open(os.path.join(path, FLAG_FILE), "w") as f:
        f.write(str(partition_size))


def is_partitioned(path: str) -> bool:
    return os.path.exists(os.path.join(path, FLAG_FILE))


def partition_size(path: str) -> int:
    with open(os.path.join(path, FLAG_FILE)) as f:
        return int(f.read().strip() or DEFAULT_PARTITION_SIZE)


def load_partitioned_parquet(
    spark: SparkSession,
    path: str,
    regions: list[tuple[str, int, int]] | None = None,
    kind: str | None = None,
) -> GenomicFrame:
    """Load the partitioned layout, partition-pruned to ``regions``.

    The filter ORs, per region, ``referenceName = name AND positionBin
    BETWEEN floor(start/size) − 1 AND floor((end−1)/size)`` (the −1 is
    the reference's lookback partition for boundary-straddling records)
    plus the exact overlap predicate. ``positionBin`` is a partition
    column, so Catalyst prunes directories before any file is opened.
    """
    psize = partition_size(path) if is_partitioned(path) else DEFAULT_PARTITION_SIZE
    df = spark.read.parquet(path)
    meta = GenomicMetadata.load(path)
    if kind is not None:
        meta.kind = kind
    if regions:
        pred = None
        for name, rstart, rend in regions:
            p = (
                (F.col("referenceName") == F.lit(name))
                & (F.col("positionBin") >= F.lit(rstart // psize - 1))
                & (F.col("positionBin") <= F.lit(max(rend - 1, rstart) // psize))
                & (F.col("start") < F.lit(rend))
                & (F.col("end") > F.lit(rstart))
            )
            pred = p if pred is None else (pred | p)
        df = df.where(pred)
    return GenomicFrame(df.drop("positionBin"), meta)
