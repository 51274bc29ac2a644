"""k-mer counting over sequence columns.

Reference: AlignmentDataset.countKmers (AlignmentDataset.scala:755-795),
SequenceDataset.scala:537-580, SliceDataset.scala:582-630 — sliding
k-windows → count per k-mer.

Spark mapping: generate window offsets with ``sequence()`` and slice
with ``substring`` via ``transform`` — pure Catalyst expressions (no
UDF), whole-stage-codegen friendly, partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_kmers(df: DataFrame, k: int, sequence_col: str = "sequence") -> DataFrame:
    """→ (kmer string, count long), over all rows' sequences.

    Scala's ``StringOps.sliding(k)`` emits ONE partial window — the
    whole string — when ``0 < length < k`` (pinned by the adam-cli
    byte-golden sorted.counts.txt: every read in sorted.sam is shorter
    than k=21 and each contributes its full sequence once), so a short
    sequence yields its own row rather than being dropped."""
    kmers = F.expr(
        f"transform(sequence(1, greatest(length({sequence_col}) - {k - 1}, 1)), "
        f"i -> substring({sequence_col}, i, {k}))"
    )
    return (
        df.where(F.length(F.col(sequence_col)) >= 1)
        .select(F.explode(kmers).alias("kmer"))
        .groupBy("kmer")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def count_slice_kmers(slices: DataFrame, k: int) -> DataFrame:
    """SliceDataset.countKmers (SliceDataset.scala:582-600): flank each
    slice with ``k`` bases of its adjacent neighbors, then count sliding
    windows — a slice whose (post-flank) start is nonzero drops its
    first ``k + 1`` characters, because every window touching those
    characters was already counted in the predecessor's extended tail
    (the predecessor gained the successor's first ``k`` bases, so its
    final window IS the successor's first window). Mirrors the
    reference's stated assumption that sorted slices are contiguous."""
    from adam_spark.operators.slices import flank_adjacent_slices

    flanked = flank_adjacent_slices(slices, k)
    seq = F.when(
        F.col("start") == 0, F.col("sequence")
    ).otherwise(F.expr(f"substring(sequence, {k + 2})"))
    return count_kmers(flanked.select(seq.alias("sequence")), k)
