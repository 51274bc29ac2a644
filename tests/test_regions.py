"""ReferenceRegion algebra tests (reference: ReferenceRegionSuite)."""

import pyspark.sql.functions as F
import pytest

from adam_spark.core import regions as R


@pytest.fixture()
def pairs(spark):
    rows = [
        # (a_ref, a_start, a_end, b_ref, b_start, b_end, label)
        ("c1", 10, 20, "c1", 15, 25, "overlap"),
        ("c1", 10, 20, "c1", 20, 30, "adjacent"),
        ("c1", 10, 20, "c1", 25, 30, "gap5"),
        ("c1", 10, 30, "c1", 15, 20, "contains"),
        ("c1", 10, 20, "c2", 10, 20, "diff_contig"),
        ("c1", 10, 20, "c1", 10, 20, "equal"),
    ]
    return spark.createDataFrame(
        rows,
        "a_ref string, a_start long, a_end long, b_ref string, b_start long, b_end long, label string",
    )


def _ab():
    a = R.RegionCols(F.col("a_ref"), F.col("a_start"), F.col("a_end"))
    b = R.RegionCols(F.col("b_ref"), F.col("b_start"), F.col("b_end"))
    return a, b


def test_overlaps_contains_adjacent(pairs):
    a, b = _ab()
    got = {
        r["label"]: (r["ov"], r["ct"], r["adj"])
        for r in pairs.select(
            "label",
            R.overlaps(a, b).alias("ov"),
            R.contains(a, b).alias("ct"),
            R.is_adjacent(a, b).alias("adj"),
        ).collect()
    }
    assert got["overlap"] == (True, False, False)
    assert got["adjacent"] == (False, False, True)
    assert got["gap5"] == (False, False, False)
    assert got["contains"] == (True, True, False)
    assert got["diff_contig"] == (False, False, False)
    assert got["equal"] == (True, True, False)


def test_overlap_threshold_and_length(pairs):
    a, b = _ab()
    got = {
        r["label"]: (r["ov3"], r["ov6"], r["ilen"])
        for r in pairs.select(
            "label",
            R.overlaps(a, b, threshold=3).alias("ov3"),
            R.overlaps(a, b, threshold=6).alias("ov6"),
            R.intersection_length(a, b).alias("ilen"),
        ).collect()
    }
    assert got["overlap"] == (True, False, 5)
    assert got["contains"] == (True, False, 5)
    assert got["equal"] == (True, True, 10)
    assert got["diff_contig"][2] == 0


def test_distance_and_nearby(pairs):
    a, b = _ab()
    got = {
        r["label"]: (r["d"], r["near"])
        for r in pairs.select(
            "label",
            R.unstranded_distance(a, b).alias("d"),
            R.is_nearby(a, b, 5).alias("near"),
        ).collect()
    }
    assert got["overlap"] == (0, True)
    assert got["adjacent"] == (0, True)
    assert got["gap5"] == (5, True)
    assert got["diff_contig"][0] is None


def test_pad_hull_subtract(spark):
    df = spark.createDataFrame([(1,)], "x int")
    a = R.RegionCols(F.lit("c1"), F.lit(10).cast("long"), F.lit(20).cast("long"))
    b = R.RegionCols(F.lit("c1"), F.lit(14).cast("long"), F.lit(16).cast("long"))
    p = R.pad(a, 15)
    hs, he = R.hull(a, b)
    row = df.select(
        p.start.alias("ps"),
        p.end.alias("pe"),
        hs.alias("hs"),
        he.alias("he"),
        R.subtract(a, b).alias("sub"),
        R.subtract(b, a).alias("sub2"),
    ).collect()[0]
    assert (row["ps"], row["pe"]) == (0, 35)  # clamped at 0
    assert (row["hs"], row["he"]) == (10, 20)
    assert [(s["start"], s["end"]) for s in row["sub"]] == [(10, 14), (16, 20)]
    assert row["sub2"] == []  # b inside a → nothing remains


def test_stranded_match(spark):
    df = spark.createDataFrame(
        [("FORWARD", "FORWARD"), ("FORWARD", "REVERSE"), ("FORWARD", "INDEPENDENT")],
        "sa string, sb string",
    )
    a = R.RegionCols(F.lit("c"), F.lit(0).cast("long"), F.lit(5).cast("long"), F.col("sa"))
    b = R.RegionCols(F.lit("c"), F.lit(0).cast("long"), F.lit(5).cast("long"), F.col("sb"))
    got = [r["m"] for r in df.select(R._strands_match(a, b).alias("m")).collect()]
    assert got == [True, False, True]


def test_region_predicate_pushdown(spark, tmp_path):
    rows = [("c1", i * 10, i * 10 + 5) for i in range(100)] + [
        ("c2", i * 10, i * 10 + 5) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "referenceName string, start long, end long")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    scan = spark.read.parquet(p).where(
        R.region_predicate([("c1", 0, 100), ("c2", 500, 600)])
    )
    got = {(r["referenceName"], r["start"]) for r in scan.collect()}
    assert all(ref == "c1" and s < 100 or ref == "c2" and 500 <= s < 600 for ref, s in got)
    assert len(got) == 10 + 10
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_pad_uneven_reference_suite(spark):
    """ReferenceRegionSuite.scala:589-604: uneven pad, and negative
    coordinates clamp to 0 on the start side only."""
    df = spark.createDataFrame([(1,)], "x int")
    a = R.RegionCols(F.lit("c1"), F.lit(10).cast("long"), F.lit(20).cast("long"))
    p = R.pad(a, 3, 7)
    pneg = R.pad(a, 15, 2)
    row = df.select(
        p.start.alias("s1"), p.end.alias("e1"),
        pneg.start.alias("s2"), pneg.end.alias("e2"),
    ).collect()[0]
    assert (row["s1"], row["e1"]) == (7, 27)
    assert (row["s2"], row["e2"]) == (0, 22)
