"""MD-tag computation against a reference genome.

Mirrors AlignmentDataset.computeMismatchingPositions
(ds/read/MDTagging.scala:27-106, models/MdTag.scala:46-611): recompute
``mismatchingPositions`` (the SAM MD tag) by comparing each mapped
read's bases to the reference slice it spans.

Spark mapping: the reference genome broadcasts in its COMPACT form —
a :class:`TwoBitFile` (or .2bit path) ships the raw 2bit payload
(~0.8 GB for a human genome vs ~3 GB of contig strings) and executors
extract only the slice each read spans; a {contig: sequence} dict or
SEQUENCE DataFrame still works for small references. Reads are
rewritten in an Arrow-batched pandas UDF (per-read cigar walk,
md_from_reference). For genomes too large to broadcast even as 2bit,
:func:`tag_reads_with_md` joins reads against broadcast contig SLICES
on overlap — same output, bounded memory.
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

    ``reference``: a :class:`TwoBitFile`, a path to a ``.2bit`` file
    (broadcast as the compact 2bit payload — the scale path), a
    SEQUENCE-schema DataFrame (from load_fasta_sequences), or a plain
    {contig: sequence} dict.
    """
    from adam_spark.sources.reference_file import TwoBitFile

    if isinstance(reference, str):
        reference = TwoBitFile(reference)
    if isinstance(reference, TwoBitFile):
        bref = reads.sparkSession.sparkContext.broadcast(("2bit", reference._data))
    elif isinstance(reference, dict):
        bref = reads.sparkSession.sparkContext.broadcast(("dict", reference))
    else:
        contigs = {
            r["name"]: r["sequence"]
            for r in reference.select("name", "sequence").collect()
        }
        bref = reads.sparkSession.sparkContext.broadcast(("dict", contigs))

    # per-python-worker parse cache: the 2bit payload is parsed (index
    # only, no sequence inflation) once per worker, not per batch
    parsed: dict[str, object] = {}

    def _slice(genome_kind, genome_val, rn, st, ln):
        if genome_kind == "2bit":
            tb = parsed.get("tb")
            if tb is None:
                tb = TwoBitFile.from_bytes(genome_val)
                parsed["tb"] = tb
            if rn not in tb._index:
                return None
            return tb.extract(rn, st, st + ln)
        contig = genome_val.get(rn)
        return None if contig is None else contig[st : st + ln]

    @F.pandas_udf(StringType())
    def _md(
        ref_name: pd.Series, start: pd.Series, cigar: pd.Series, seq: pd.Series
    ) -> pd.Series:
        kind, val = bref.value
        out = []
        for rn, st, c, s in zip(ref_name, start, cigar, seq):
            if not isinstance(c, str) or not isinstance(s, str):
                out.append(None)
                continue
            st = int(st)
            ref_slice = _slice(kind, val, rn, st, cigar_reference_length(c))
            if ref_slice is None:
                out.append(None)
                continue
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
