"""Bucketed pre-binned layout: correctness vs the online region join
plus the plan gate that justifies its existence (zero Exchange on the
narrow-branch bucket join — the reference's reused-sort copartition,
GenomicDataset.scala:2919-3076, re-expressed as Spark bucketing)."""

import pytest
from pyspark.sql import functions as F

from adam_spark.operators.region_join import region_join
from adam_spark.sources.bucketed import (
    bucketed_region_join,
    save_binned_bucketed,
)


@pytest.fixture()
def frames(spark):
    rows_l = [
        ("chr1", 10, 50, "l1"),
        ("chr1", 40, 80, "l2"),
        ("chr1", 200, 220, "l3"),
        ("chr2", 5, 25, "l4"),
        ("chr1", 0, 100_000, "lwide"),  # wide: bypasses the bin explode
    ]
    rows_r = [
        ("chr1", 45, 60, "r1"),
        ("chr1", 75, 90, "r2"),
        ("chr1", 300, 310, "r3"),
        ("chr2", 20, 30, "r4"),
        ("chr2", 1, 90_000, "rwide"),
    ]
    schema = "referenceName STRING, start LONG, end LONG, id STRING"
    return (
        spark.createDataFrame(rows_l, schema),
        spark.createDataFrame(rows_r, schema),
    )


def _pairs(df):
    return sorted((r["id"], r["id_r"]) for r in df.collect())


def test_bucketed_join_matches_online_join(spark, frames, tmp_path):
    left, right = frames
    save_binned_bucketed(
        left, "bk_left", str(tmp_path / "l"), bin_size=64, buckets=4
    )
    save_binned_bucketed(
        right, "bk_right", str(tmp_path / "r"), bin_size=64, buckets=4
    )
    try:
        got = bucketed_region_join(spark, "bk_left", "bk_right")
        want = region_join(left, right, how="inner", bin_size=64)
        assert _pairs(got) == _pairs(want)
        assert len(_pairs(got)) > 0
    finally:
        for t in ("bk_left", "bk_right", "bk_left__wide", "bk_right__wide"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_plan_has_no_exchange_on_narrow_branch(
    spark, frames, tmp_path
):
    left, right = frames
    save_binned_bucketed(
        left.where(F.col("id") != "lwide"),
        "bkp_left",
        str(tmp_path / "l"),
        bin_size=64,
        buckets=4,
    )
    save_binned_bucketed(
        right.where(F.col("id") != "rwide"),
        "bkp_right",
        str(tmp_path / "r"),
        bin_size=64,
        buckets=4,
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # big-big case: disable auto-broadcast so the planner must use
        # the bucket layout (small sides legitimately broadcast instead)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lb = spark.table("bkp_left")
        rb = (
            spark.table("bkp_right")
            .withColumnRenamed("id", "id_r")
            .withColumnRenamed("referenceName", "rn")
            .withColumnRenamed("start", "s2")
            .withColumnRenamed("end", "e2")
            .withColumnRenamed("__bin", "__rbin")
        )
        core = lb.join(
            rb,
            (F.col("referenceName") == F.col("rn"))
            & (F.col("__bin") == F.col("__rbin"))
            & (F.col("start") < F.col("e2"))
            & (F.col("s2") < F.col("end")),
            "inner",
        )
        plan = core._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the full user-facing join also keeps its narrow branch
        # exchange-free: the only Exchanges allowed are the broadcast
        # wide channels (absent here, so none at all)
        full = bucketed_region_join(spark, "bkp_left", "bkp_right")
        fplan = full._jdf.queryExecution().executedPlan().toString()
        # shuffles print as "Exchange hashpartitioning/..."; the only
        # allowed exchanges are the wide channels' explicit broadcasts
        assert "Exchange" not in fplan.replace("BroadcastExchange", ""), fplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for t in ("bkp_left", "bkp_right", "bkp_left__wide", "bkp_right__wide"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_mismatch_raises(spark, frames, tmp_path):
    left, right = frames
    save_binned_bucketed(left, "bm_left", str(tmp_path / "l"), bin_size=64, buckets=4)
    save_binned_bucketed(
        right, "bm_right", str(tmp_path / "r"), bin_size=128, buckets=4
    )
    try:
        with pytest.raises(ValueError, match="bucket specs differ"):
            bucketed_region_join(spark, "bm_left", "bm_right")
    finally:
        for t in ("bm_left", "bm_right", "bm_left__wide", "bm_right__wide"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_null_coordinate_rows_survive_layout(spark, tmp_path):
    """Rows with null start/end cannot bin but must not vanish from the
    materialized layout (it is a queryable table, not only a join
    input); they ride the wide side table and never match joins."""
    from adam_spark.sources.bucketed import save_binned_bucketed

    df = spark.createDataFrame(
        [("c1", 10, 20, "a"), ("c1", None, None, "unplaced"), ("c1", 5, None, "half")],
        "referenceName string, start long, end long, name string",
    )
    save_binned_bucketed(df, "t_nulls", str(tmp_path / "t_nulls"), bin_size=16)
    got = {r["name"] for r in spark.table("t_nulls").collect()} | {
        r["name"] for r in spark.table("t_nulls__wide").collect()
    }
    assert got == {"a", "unplaced", "half"}


def test_queryname_bucketed_fragments_no_exchange(spark, tmp_path):
    """Fragment grouping over a queryname-bucketed layout plans with
    ZERO Exchange (the reference's queryname-grouped fast path,
    docs/benchmarks/algorithms.rst:44-51) and matches the plain
    groupBy result."""
    from adam_spark.operators.conversions import alignments_to_fragments
    from adam_spark.sources.bucketed import save_queryname_bucketed
    from adam_spark import schemas

    rows = []
    for i in range(200):
        for mate, flag in ((0, 99), (1, 147)):
            rows.append((f"r{i:04d}", flag % 2 == 1, f"c{i%3}", i * 10, i * 10 + 10,
                         mate, True, True, 100 if mate == 0 else -100))
    df = spark.createDataFrame(
        rows,
        "readName string, readPaired boolean, referenceName string, start long, "
        "end long, readInFragment int, readMapped boolean, primaryAlignment boolean, "
        "insertSize long",
    )
    aln = schemas.conform(df, schemas.ALIGNMENT)
    save_queryname_bucketed(aln, "qname_bk_t", str(tmp_path / "qname_bk"), buckets=4)
    loaded = spark.table("qname_bk_t")
    frags = alignments_to_fragments(loaded)
    plan = frags._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["name"]: len(r["alignments"]) for r in frags.collect()}
    assert len(got) == 200 and all(v == 2 for v in got.values())
    # same result as the shuffle path on the unbucketed frame
    base = {r["name"]: len(r["alignments"])
            for r in alignments_to_fragments(aln).collect()}
    assert got == base
