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


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's harness builds its own SparkSession, so the conf set in
    # adam_spark.session is absent there.  nanosAsLong is runtime-settable;
    # without it TIMESTAMP(NANOS) parquet reads raise PARQUET_TYPE_ILLEGAL
    # (see CORRECTNESS_r01 events_* failures).  The conf is scoped to the
    # schema-capturing read() call and restored afterward so a foreign
    # session's other parquet reads are unaffected (verified: execution
    # keeps the schema captured at read time, so restoring is safe).
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    finally:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
    for c in _NANOS_COLS.get(name, []):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # TIMESTAMP(NANOS) read as long under nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false): make the wall
            # clock the UTC instant regardless of session timezone —
            # cast() interprets the wall time in the session zone, and
            # from_utc_timestamp undoes that shift.  (Sole caveat: wall
            # times inside a DST transition window of a DST-observing
            # session zone; UTC sessions are always exact.)
            tz = spark.conf.get("spark.sql.session.timeZone")
            df = df.withColumn(
                c, F.from_utc_timestamp(F.col(c).cast("timestamp"), tz)
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
