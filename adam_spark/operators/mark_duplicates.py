"""Picard-compatible duplicate marking, DataFrame-native.

Reference algorithm (ds/read/MarkDuplicates.scala:27-171,
ReferencePositionPair.scala:32-114, AlignmentDataset.scala:1075-1077):

1. bucket reads by fragment (readName + read group),
2. key each fragment by its oriented 5' position pair — the 5' end is
   the alignment start adjusted for clipping on the forward strand, or
   the clipped end on the reverse strand,
3. group fragments by (library, left 5' position), subgroup by right
   position, keep the fragment with the highest sum of base qualities
   ≥ 15 (the Picard score), mark every other fragment's reads as
   duplicates; fragments with only unmapped reads are never marked;
   secondary/supplementary alignments inherit their fragment's flag.

Spark mapping: clipped-5'-position arithmetic as Catalyst expressions
over the CIGAR string (regexp parsing of leading/trailing soft/hard
clips — no UDF), fragment scores via groupBy, then ONE window
``row_number`` per (library, posL, posR) ordered by (score desc,
readName) — fully shuffle-parallel on the position key, matching the
reference's groupBy-then-argmax but with Picard's deterministic
tiebreak and no per-group materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _clip(cigar_edge_re: str) -> Column:
    """Total clipped bases matched by a regex on the CIGAR."""
    return F.coalesce(
        F.regexp_extract(F.col("cigar"), cigar_edge_re, 1).cast("long"), F.lit(0)
    )


def five_prime_position(
    start: Column, end: Column, cigar: Column, negative: Column
) -> Column:
    """Unclipped 5' position of an aligned read.

    Forward strand: start − leading soft/hard clips.
    Reverse strand: end + trailing soft/hard clips.
    (reference: ReferencePositionPair.scala:32-114 via
    RichAlignment.fivePrimePosition)
    """
    lead = F.coalesce(F.regexp_extract(cigar, r"^(\d+)[SH]", 1).cast("long"), F.lit(0))
    lead = F.when(F.regexp_extract(cigar, r"^(\d+)[SH]", 1) == "", F.lit(0)).otherwise(lead)
    trail = F.when(F.regexp_extract(cigar, r"(\d+)[SH]$", 1) == "", F.lit(0)).otherwise(
        F.coalesce(F.regexp_extract(cigar, r"(\d+)[SH]$", 1).cast("long"), F.lit(0))
    )
    return F.when(negative.eqNullSafe(F.lit(True)), end + trail).otherwise(start - lead)


def _phred_score(quals: Column, min_q: int = 15) -> Column:
    """Sum of phred qualities ≥ 15 (Picard duplicate score;
    reference: MarkDuplicates score via SingleReadBucket)."""
    return F.aggregate(
        F.transform(F.split(quals, ""), lambda ch: F.ascii(ch) - 33),
        F.lit(0),
        lambda acc, q: acc + F.when(q >= min_q, q).otherwise(0),
    )


def mark_duplicates(alignments: DataFrame, library_by_rg: dict[str, str] | None = None) -> DataFrame:
    """Return the input with ``duplicateRead`` set.

    ``library_by_rg`` maps readGroupId → library (from the read-group
    dictionary); same-library fragments compete with each other.
    """
    lib = F.lit(None).cast("string")
    if library_by_rg:
        for rg, lb in library_by_rg.items():
            lib = F.when(F.col("readGroupId") == F.lit(rg), F.lit(lb)).otherwise(lib)
    df = alignments.withColumn("__lib", lib)

    primary = F.col("primaryAlignment").eqNullSafe(F.lit(True)) | (
        ~F.col("secondaryAlignment").eqNullSafe(F.lit(True))
        & ~F.col("supplementaryAlignment").eqNullSafe(F.lit(True))
    )
    mapped = F.col("readMapped").eqNullSafe(F.lit(True))
    fp = five_prime_position(
        F.col("start"), F.col("end"), F.col("cigar"), F.col("readNegativeStrand")
    )

    # per-read contribution to its fragment key/score
    reads = df.withColumn("__mappedPrimary", (primary & mapped).cast("boolean")).withColumn(
        "__fp", F.when(primary & mapped, fp)
    ).withColumn(
        "__strand",
        F.when(
            primary & mapped,
            F.when(F.col("readNegativeStrand").eqNullSafe(F.lit(True)), F.lit("R")).otherwise(
                F.lit("F")
            ),
        ),
    ).withColumn(
        "__score", F.when(primary, _phred_score(F.col("qualityScores"))).otherwise(F.lit(0))
    )

    # fragment roll-up: oriented 5' position pair + total score
    # (join key null-proofed: readGroupId may be null, and null keys
    # don't match in an equi-join)
    reads = reads.withColumn("__rg", F.coalesce(F.col("readGroupId"), F.lit("")))
    frag = (
        reads.where(primary)
        .groupBy("readName", "__rg", "__lib")
        .agg(
            F.sum("__score").alias("fragScore"),
            # position structs sorted so (left, right) is orientation-stable
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__mappedPrimary"),
                        F.struct(
                            F.col("referenceName").alias("ref"),
                            F.col("__fp").alias("pos"),
                            F.col("__strand").alias("strand"),
                        ),
                    )
                )
            ).alias("positions"),
        )
        .withColumn("posL", F.col("positions").getItem(0))
        .withColumn("posR", F.element_at(F.col("positions"), -1))
        .withColumn("nMapped", F.size("positions"))
    )

    # fragments with no mapped primary read are never duplicates
    # (reference: MarkDuplicates.scala:95-100)
    w = Window.partitionBy(
        "__lib",
        F.col("posL.ref"),
        F.col("posL.pos"),
        F.col("posL.strand"),
        F.col("posR.ref"),
        F.col("posR.pos"),
        F.col("posR.strand"),
        # fragments whose pair is incomplete (single-end / mate unmapped)
        # only compete with other incomplete fragments when a full pair
        # exists at the site iff pair-completeness matches
        (F.col("nMapped") > 1).cast("int"),
    ).orderBy(F.col("fragScore").desc(), F.col("readName"))
    marked_frags = frag.withColumn(
        "__isDup", (F.row_number().over(w) > 1) & (F.col("nMapped") > 0)
    ).select("readName", "__rg", F.col("__isDup"))

    df = df.withColumn("__rg", F.coalesce(F.col("readGroupId"), F.lit("")))
    out = df.join(marked_frags, ["readName", "__rg"], "left").withColumn(
        "duplicateRead",
        F.when(mapped | F.col("readPaired").eqNullSafe(F.lit(True)), F.coalesce("__isDup", F.lit(False))).otherwise(
            F.lit(False)
        ),
    )
    return out.drop("__isDup", "__lib", "__rg", "__mappedPrimary", "__fp", "__strand", "__score")


def mark_duplicate_fragments(
    fragments: DataFrame, library_by_rg: dict[str, str] | None = None
) -> DataFrame:
    """Duplicate marking for Fragment datasets
    (reference: FragmentDataset.markDuplicates :369): explode the
    nested alignments, mark, regroup. When the input is already
    fragment-grouped this trades the reference's saved first shuffle
    for one regroup — same asymptotics, one operator."""
    from adam_spark.operators.conversions import (
        alignments_to_fragments,
        fragments_to_alignments,
    )

    aln = fragments_to_alignments(fragments)
    marked = mark_duplicates(aln, library_by_rg)
    return alignments_to_fragments(marked.select(*aln.columns))
