"""Parquet round trips: flat + partitioned layout with pruning."""

from pyspark.sql import functions as F

from adam_spark.sources.parquet import (
    is_partitioned,
    load_parquet,
    load_partitioned_parquet,
    partition_size,
    save_parquet,
    save_partitioned_parquet,
)


def test_flat_roundtrip(fixtures, tmp_path, spark):
    gf = fixtures.features()
    p = str(tmp_path / "features")
    save_parquet(gf, p)
    back = load_parquet(spark, p)
    assert back.df.count() == gf.df.count()
    assert back.meta.kind == "feature"
    assert back.meta.references == gf.meta.references
    assert [g.id for g in back.meta.read_groups] == ["rg1", "rg2"]


def test_partitioned_roundtrip_and_pruning(fixtures, tmp_path, spark):
    gf = fixtures.features()
    p = str(tmp_path / "features_part")
    save_partitioned_parquet(gf, p, partition_size=10_000)
    assert is_partitioned(p)
    assert partition_size(p) == 10_000
    back = load_partitioned_parquet(spark, p)
    assert back.df.count() == gf.df.count()
    assert sorted(back.df.columns) == sorted(gf.df.columns)

    region = ("chr1", 20_000, 40_000)
    pruned = load_partitioned_parquet(spark, p, regions=[region])
    want = gf.df.where(
        (F.col("referenceName") == "chr1") & (F.col("start") < 40_000) & (F.col("end") > 20_000)
    )
    assert pruned.df.count() == want.count()
    # partition pruning visible in the plan: the scan reads a subset of files
    plan = pruned.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "positionBin" not in plan
