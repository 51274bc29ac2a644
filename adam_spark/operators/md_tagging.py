"""MD-tag computation against a reference genome.

Mirrors AlignmentDataset.computeMismatchingPositions
(ds/read/MDTagging.scala:27-106, models/MdTag.scala:46-611): recompute
``mismatchingPositions`` (the SAM MD tag) by comparing each mapped
read's bases to the reference slice it spans.

Spark mapping: the reference genome (loaded from FASTA) is collected to
a {contig: sequence} dict and broadcast; reads are rewritten in an
Arrow-batched pandas UDF (per-read cigar walk, md_from_reference).
For genomes too large to broadcast whole, pass ``region_join=True`` to
instead join reads against broadcast contig SLICES on overlap and
compare against the matched slice — same output, bounded memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from adam_spark.functions.cigar import cigar_reference_length, md_from_reference


def compute_mismatching_positions(
    reads: DataFrame, reference: DataFrame | dict[str, str], overwrite: bool = True
) -> DataFrame:
    """Set mismatchingPositions from the reference.

    ``reference``: a SEQUENCE-schema DataFrame (from load_fasta_sequences)
    or a plain {contig: sequence} dict.
    """
    if isinstance(reference, dict):
        contigs = reference
    else:
        contigs = {
            r["name"]: r["sequence"]
            for r in reference.select("name", "sequence").collect()
        }
    bref = reads.sparkSession.sparkContext.broadcast(contigs)

    @F.pandas_udf(StringType())
    def _md(
        ref_name: pd.Series, start: pd.Series, cigar: pd.Series, seq: pd.Series
    ) -> pd.Series:
        genome = bref.value
        out = []
        for rn, st, c, s in zip(ref_name, start, cigar, seq):
            contig = genome.get(rn)
            if contig is None or not isinstance(c, str) or not isinstance(s, str):
                out.append(None)
                continue
            st = int(st)
            ref_slice = contig[st : st + cigar_reference_length(c)]
            md, _ = md_from_reference(c, s, ref_slice)
            out.append(md)
        return pd.Series(out)

    cond = (
        F.col("readMapped")
        & F.col("cigar").isNotNull()
        & F.col("sequence").isNotNull()
    )
    if not overwrite:
        cond = cond & F.col("mismatchingPositions").isNull()
    return reads.withColumn(
        "mismatchingPositions",
        F.when(
            cond,
            _md(F.col("referenceName"), F.col("start"), F.col("cigar"), F.col("sequence")),
        ).otherwise(F.col("mismatchingPositions")),
    )


def tag_reads_with_md(
    reads: DataFrame, reference_slices: DataFrame, slice_pad: int = 0
) -> DataFrame:
    """Scale path: region-join reads to broadcast reference SLICES and
    compute MD against the covering slice. Slices must each fully cover
    the reads they match (use slice length >> max read length and
    ``slice_pad`` >= max read length on generation)."""
    sl = reference_slices.select(
        F.col("name").alias("__sl_name"),
        F.col("start").alias("__sl_start"),
        F.col("end").alias("__sl_end"),
        F.col("sequence").alias("__sl_seq"),
    )
    joined = reads.join(
        F.broadcast(sl),
        (F.col("referenceName") == F.col("__sl_name"))
        & (F.col("start") >= F.col("__sl_start"))
        & (F.col("end") <= F.col("__sl_end")),
        "left",
    )

    @F.pandas_udf(StringType())
    def _md_slice(
        start: pd.Series,
        cigar: pd.Series,
        seq: pd.Series,
        sl_start: pd.Series,
        sl_seq: pd.Series,
    ) -> pd.Series:
        out = []
        for st, c, s, ss, sq in zip(start, cigar, seq, sl_start, sl_seq):
            if not isinstance(sq, str) or not isinstance(c, str) or not isinstance(s, str):
                out.append(None)
                continue
            off = int(st) - int(ss)
            ref_slice = sq[off : off + cigar_reference_length(c)]
            md, _ = md_from_reference(c, s, ref_slice)
            out.append(md)
        return pd.Series(out)

    cond = F.col("readMapped") & F.col("cigar").isNotNull() & F.col("__sl_seq").isNotNull()
    return (
        joined.withColumn(
            "mismatchingPositions",
            F.when(
                cond,
                _md_slice(
                    F.col("start"),
                    F.col("cigar"),
                    F.col("sequence"),
                    F.col("__sl_start"),
                    F.col("__sl_seq"),
                ),
            ).otherwise(F.col("mismatchingPositions")),
        )
        .drop("__sl_name", "__sl_start", "__sl_end", "__sl_seq")
    )
