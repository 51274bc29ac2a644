"""Loaders for the driver's synthetic testdata tables (TESTDATA.md).

The parquet files store timestamps as TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as longs.
:func:`load_table` converts them back to proper timestamps
(microsecond-aligned, verified lossless) so engine queries and the
DuckDB oracle see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns stored as TIMESTAMP(NANOS) in the testdata parquet
_NANOS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's harness builds its own SparkSession, so the conf set in
    # adam_spark.session is absent there.  nanosAsLong is runtime-settable and
    # idempotent; without it TIMESTAMP(NANOS) parquet reads raise
    # PARQUET_TYPE_ILLEGAL (see CORRECTNESS_r01 events_* failures).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_COLS.get(name, []):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # TIMESTAMP(NANOS) read as long under nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false); session tz is UTC,
            # so the cast is value-preserving
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
