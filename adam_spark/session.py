"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the conf below is chosen so the same
logical plans survive a 1000-executor cluster: AQE on (runtime coalesce +
skew-join splitting), broadcast threshold tuned, Arrow enabled for the
pandas-UDF kernels, and shuffle partitions sized by env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "adam-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("ADAM_SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split small local files finely so narrow pipelines (broadcast
        # joins, per-row folds) use every core even on MB-scale inputs;
        # on a real cluster the input is split-rich and this knob is
        # neutral — override via ADAM_SPARK_MAX_PARTITION_BYTES
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("ADAM_SPARK_MAX_PARTITION_BYTES", str(1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        # the driver's testdata parquet carries TIMESTAMP(NANOS), which the
        # Spark reader rejects by default; read as long and convert (values
        # are microsecond-aligned, so the conversion is lossless)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("ADAM_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # permissive expression semantics (Spark 3-style): the data model is
        # nullable-everything with no invariants, so out-of-range accesses and
        # unparseable casts must yield null, not runtime errors
        .config("spark.sql.ansi.enabled", "false")
    )
    return builder.getOrCreate()
