"""flagstat — samtools-compatible QC counters in one aggregation pass.

Reference: ds/read/FlagStat.scala:89-130 (metrics algebra :23-87)
computes 13 counters × (QC-pass, QC-fail) with a single RDD aggregate.
Here: one ``groupBy(failedVendorQualityChecks)`` with 13 conditional
counts — a single map-side-combinable hash aggregation; no shuffle
wider than 2 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n(c: Column) -> Column:
    return F.count(F.when(c.eqNullSafe(F.lit(True)), 1))


def flagstat(alignments: DataFrame) -> DataFrame:
    """One row per QC bucket (pass/fail) with the samtools counters."""
    mapped = F.col("readMapped")
    paired = F.col("readPaired")
    df = alignments.withColumn(
        "__qcfail", F.coalesce(F.col("failedVendorQualityChecks"), F.lit(False))
    )
    dup = F.col("duplicateRead").eqNullSafe(F.lit(True))
    prim = dup & F.col("primaryAlignment").eqNullSafe(F.lit(True))
    sec = dup & F.col("primaryAlignment").eqNullSafe(F.lit(False))
    cross = ~F.col("referenceName").eqNullSafe(F.col("mateReferenceName"))
    return (
        df.groupBy(F.col("__qcfail").alias("qcFailed"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            _n(F.col("duplicateRead")).alias("duplicates"),
            # DuplicateMetrics (FlagStat.scala:29-51): primary/secondary
            # duplicate splits with bothMapped / onlyReadMapped /
            # crossChromosome sub-counters
            _n(prim).alias("duplicatesPrimary"),
            _n(prim & mapped & F.col("mateMapped")).alias("duplicatesPrimaryBothMapped"),
            _n(prim & mapped & ~F.col("mateMapped").eqNullSafe(F.lit(True))).alias(
                "duplicatesPrimaryOnlyReadMapped"
            ),
            _n(prim & cross).alias("duplicatesPrimaryCrossChromosome"),
            _n(sec).alias("duplicatesSecondary"),
            _n(sec & mapped & F.col("mateMapped")).alias("duplicatesSecondaryBothMapped"),
            _n(sec & mapped & ~F.col("mateMapped").eqNullSafe(F.lit(True))).alias(
                "duplicatesSecondaryOnlyReadMapped"
            ),
            _n(sec & cross).alias("duplicatesSecondaryCrossChromosome"),
            _n(mapped).alias("mapped"),
            _n(paired).alias("paired"),
            _n(paired & (F.col("readInFragment") == 0)).alias("read1"),
            _n(paired & (F.col("readInFragment") == 1)).alias("read2"),
            _n(F.col("properPair")).alias("properlyPaired"),
            _n(mapped & F.col("mateMapped")).alias("withSelfAndMateMapped"),
            _n(mapped & ~F.col("mateMapped").eqNullSafe(F.lit(True)) & paired).alias("singleton"),
            _n(
                mapped
                & F.col("mateMapped")
                & ~F.col("referenceName").eqNullSafe(F.col("mateReferenceName"))
            ).alias("withMateMappedToDiffChromosome"),
            _n(
                mapped
                & F.col("mateMapped")
                & ~F.col("referenceName").eqNullSafe(F.col("mateReferenceName"))
                & (F.col("mappingQuality") >= 5)
            ).alias("withMateMappedToDiffChromosomeMapQ5"),
            _n(F.col("primaryAlignment") & mapped).alias("primaryMapped"),
            _n(F.col("secondaryAlignment")).alias("secondaryAlignments"),
            _n(F.col("supplementaryAlignment")).alias("supplementaryAlignments"),
        )
        .orderBy("qcFailed")
    )
