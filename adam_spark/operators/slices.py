"""Slice operators: flanking, extraction, assembly.

Mirrors SliceDataset.flankAdjacent (ds/sequence/FlankSlices.scala:29 —
stitch adjacent slices with flanking context so per-slice pipelines see
overlap), SliceDataset.extract/extractRegions (SliceDataset.scala:
460-555 — random access substrings of the genome), and
SequenceDataset.extract semantics. All relational: window lag/lead for
flanks, filter + substring + ordered assembly for extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flank_adjacent_slices(slices: DataFrame, flank: int) -> DataFrame:
    """Extend each slice with the tail of its predecessor and the head
    of its successor (same parent ``name``), adjusting start/end.

    A slice pipeline (e.g. pipe() over FASTA) then sees ``flank`` bases
    of context across slice boundaries, exactly like the reference's
    FlankSlices prepass.
    """
    w = Window.partitionBy("name").orderBy("start")
    prev_seq = F.lag("sequence").over(w)
    prev_end = F.lag("end").over(w)
    next_seq = F.lead("sequence").over(w)
    next_start = F.lead("start").over(w)
    # only stitch when truly adjacent (prev.end == start)
    head = F.when(
        prev_seq.isNotNull() & (prev_end == F.col("start")),
        F.substring(prev_seq, -flank, flank),
    ).otherwise(F.lit(""))
    tail = F.when(
        next_seq.isNotNull() & (next_start == F.col("end")),
        F.substring(next_seq, 1, flank),
    ).otherwise(F.lit(""))
    return (
        slices.withColumn("__head", head)
        .withColumn("__tail", tail)
        .withColumn("sequence", F.concat(F.col("__head"), F.col("sequence"), F.col("__tail")))
        .withColumn("start", F.col("start") - F.length("__head"))
        .withColumn("end", F.col("end") + F.length("__tail"))
        .withColumn("length", F.col("end") - F.col("start"))
        .drop("__head", "__tail")
    )


def extract_region(
    slices: DataFrame, name: str, start: int, end: int
) -> DataFrame:
    """Assemble the substring [start, end) of parent ``name`` from its
    covering slices (SliceDataset.extract): one output row
    (name, start, end, sequence)."""
    parts = (
        slices.where(
            (F.col("name") == F.lit(name))
            & (F.col("start") < F.lit(end))
            & (F.col("end") > F.lit(start))
        )
        .select(
            "name",
            "start",
            F.substring(
                F.col("sequence"),
                (F.greatest(F.lit(start), F.col("start")) - F.col("start") + 1).cast("int"),
                (
                    F.least(F.lit(end), F.col("end"))
                    - F.greatest(F.lit(start), F.col("start"))
                ).cast("int"),
            ).alias("piece"),
        )
    )
    return (
        parts.groupBy("name")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("start", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("sequence")
        )
        .select(
            "name",
            F.lit(start).cast("long").alias("start"),
            F.lit(end).cast("long").alias("end"),
            "sequence",
        )
    )


def extract_regions(
    slices: DataFrame, regions: list[tuple[str, int, int]]
) -> DataFrame:
    """Batch extract: one row per requested region, assembled in a
    single pass (explode regions → overlap join → ordered assembly)."""
    spark = slices.sparkSession
    rdf = F.broadcast(
        spark.createDataFrame(regions, "rname string, rstart long, rend long")
    )
    hit = slices.join(
        rdf,
        (F.col("name") == F.col("rname"))
        & (F.col("start") < F.col("rend"))
        & (F.col("end") > F.col("rstart")),
        "inner",
    ).select(
        "rname",
        "rstart",
        "rend",
        "start",
        F.substring(
            F.col("sequence"),
            (F.greatest(F.col("rstart"), F.col("start")) - F.col("start") + 1).cast("int"),
            (F.least(F.col("rend"), F.col("end")) - F.greatest(F.col("rstart"), F.col("start"))).cast(
                "int"
            ),
        ).alias("piece"),
    )
    return (
        hit.groupBy("rname", "rstart", "rend")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("start", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("sequence")
        )
        .select(
            F.col("rname").alias("name"),
            F.col("rstart").alias("start"),
            F.col("rend").alias("end"),
            "sequence",
        )
    )
