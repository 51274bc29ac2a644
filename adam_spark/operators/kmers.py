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
    """→ (kmer string, count long), over all rows' sequences."""
    kmers = F.expr(
        f"transform(sequence(1, greatest(length({sequence_col}) - {k - 1}, 0)), "
        f"i -> substring({sequence_col}, i, {k}))"
    )
    return (
        df.where(F.length(F.col(sequence_col)) >= k)
        .select(F.explode(kmers).alias("kmer"))
        .groupBy("kmer")
        .agg(F.count(F.lit(1)).alias("count"))
    )
