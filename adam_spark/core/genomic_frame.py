"""GenomicFrame — the engine's core abstraction.

A thin wrapper pairing a Spark ``DataFrame`` with driver-side
:class:`GenomicMetadata`. This replaces the reference's triple-bound
GenomicDataset (RDD + Dataset + metadata, GenomicDataset.scala:130):
in a DataFrame-first engine there is exactly ONE binding — a Catalyst
logical plan — so the ParquetUnbound/DatasetBound/RDDBound machinery
collapses away and every operator is a pure ``DataFrame → DataFrame``
function with metadata propagation rules.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adam_spark.core.metadata import GenomicMetadata, ProcessingStep

#: kinds whose rows carry (referenceName, start, end) locus columns directly
LOCATABLE_KINDS = {
    "alignment",
    "feature",
    "coverage",
    "variant",
    "genotype",
    "variant_context",
    "slice",
}


def overlap_condition(
    l_ref: Column,
    l_start: Column,
    l_end: Column,
    r_ref: Column,
    r_start: Column,
    r_end: Column,
    flank: int = 0,
) -> Column:
    """Strand-blind interval-overlap predicate on half-open regions.

    Matches the reference's ``ReferenceRegion.overlaps`` semantics
    (models/ReferenceRegion.scala:671-681): same contig and
    ``l.start < r.end && r.start < l.end``, with optional ``flank``
    padding of the left region (GenomicDataset.scala:1821-1850).
    """
    return (
        l_ref.eqNullSafe(r_ref)
        & l_ref.isNotNull()
        & ((l_start - F.lit(flank)) < r_end)
        & (r_start < (l_end + F.lit(flank)))
    )


class GenomicFrame:
    """A DataFrame of genomic records + metadata."""

    def __init__(self, df: DataFrame, meta: GenomicMetadata | None = None, kind: str | None = None):
        self.df = df
        self.meta = meta if meta is not None else GenomicMetadata()
        if kind is not None:
            self.meta.kind = kind

    # --- basic plumbing ---------------------------------------------------
    @property
    def kind(self) -> str | None:
        return self.meta.kind

    @property
    def spark(self):
        return self.df.sparkSession

    def to_df(self) -> DataFrame:
        """Escape hatch to plain Spark SQL (GenomicDataset.scala:147-149)."""
        return self.df

    def transform_df(self, fn: Callable[[DataFrame], DataFrame]) -> GenomicFrame:
        """Apply an arbitrary DataFrame function, keeping metadata
        (reference: transformDataFrame, GenomicDataset.scala:509-530)."""
        return GenomicFrame(fn(self.df), self.meta.copy())

    def with_processing_step(self, step: ProcessingStep) -> GenomicFrame:
        return GenomicFrame(self.df, self.meta.with_processing_step(step))

    def cache(self) -> GenomicFrame:
        self.df = self.df.cache()
        return self

    def count(self) -> int:
        return self.df.count()

    # --- region extraction ------------------------------------------------
    def region_columns(self) -> tuple[str, str, str]:
        """Names of the (referenceName, start, end) locus columns.

        The analogue of ``getReferenceRegions`` (GenomicDataset.scala:1018):
        instead of a per-record Scala function, locatable kinds expose
        their locus as three columns so predicates stay in Catalyst.
        """
        cols = set(self.df.columns)
        if {"referenceName", "start", "end"} <= cols:
            return ("referenceName", "start", "end")
        raise ValueError(
            f"kind {self.kind!r} has no (referenceName, start, end) columns; "
            "convert first (e.g. fragments → alignments)"
        )

    # --- filters ----------------------------------------------------------
    def filter_by_overlapping_region(self, region: tuple[str, int, int]) -> GenomicFrame:
        return self.filter_by_overlapping_regions([region])

    def filter_by_overlapping_regions(
        self, regions: Sequence[tuple[str, int, int]]
    ) -> GenomicFrame:
        """Keep records overlapping any query region
        (reference: GenomicDataset.scala:1034-1081). The OR-of-ANDs
        predicate is pushed by Catalyst into the Parquet scan, matching
        the reference's hand-built FilterPredicate
        (ReferenceRegion.scala:392-398, 768-775)."""
        ref, start, end = self.region_columns()
        pred = None
        for name, rstart, rend in regions:
            p = (
                (F.col(ref) == F.lit(name))
                & (F.col(start) < F.lit(rend))
                & (F.col(end) > F.lit(rstart))
            )
            pred = p if pred is None else (pred | p)
        if pred is None:
            pred = F.lit(False)
        return self.transform_df(lambda df: df.where(pred))

    # --- set ops ----------------------------------------------------------
    def union(self, *others: GenomicFrame) -> GenomicFrame:
        """Row union with metadata union-merge
        (reference: AlignmentDataset.scala:459-471)."""
        df = self.df
        meta = self.meta.copy()
        for o in others:
            df = df.unionByName(o.df, allowMissingColumns=True)
            meta = meta.merge(o.meta)
        return GenomicFrame(df, meta)
