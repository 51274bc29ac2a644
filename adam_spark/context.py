"""ADAMContext-equivalent entry points: extension-sniffing loaders and
polymorphic saves.

Mirrors the reference's dispatchers (ADAMContext.loadAlignments:3643,
loadFeatures:3432, loadVariants:3589, loadGenotypes:3555,
loadSequences:3991, loadVariantContexts:2870, loadCoverage:3118,
loadSequenceDictionary:3519) and the per-type ``save`` dispatch
(AlignmentDataset.save:635, FeatureDataset.save:505). Extension rules
follow the reference; everything else is treated as (partitioned)
Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from adam_spark.core.genomic_frame import GenomicFrame
from adam_spark.core.metadata import GenomicMetadata, Reference, SequenceDictionary
from adam_spark.sources import fasta as _fasta
from adam_spark.sources import fastq as _fastq
from adam_spark.sources import features_io as _feat
from adam_spark.sources import parquet as _parquet
from adam_spark.sources import sam as _sam
from adam_spark.sources import vcf as _vcf


def _has_ext(path: str, *exts: str) -> bool:
    """Extension dispatch (util/FileExtensions.scala): strips a trailing
    compression suffix, and for the alignment container formats also a
    trailing numeric shard suffix (isBamExt's SRA-s3 workaround,
    FileExtensions.scala:37-44 — 'file.bam.1' is a BAM)."""
    import re

    base = path.rstrip("/").lower()
    if any(e in (".sam", ".bam", ".cram") for e in exts):
        base = re.sub(r"\.[0-9]+$", "", base)
    if base.endswith((".gz", ".bz2", ".bgz")):
        base = base.rsplit(".", 1)[0]
    return base.endswith(tuple(e.lower() for e in exts))


def _load_parquet(spark: SparkSession, path: str, kind: str) -> GenomicFrame:
    if _parquet.is_partitioned(path):
        return _parquet.load_partitioned_parquet(spark, path, kind=kind)
    return _parquet.load_parquet(spark, path, kind=kind)


def load_alignments(
    spark: SparkSession, path: str, path2: str | None = None, reference=None,
    stringency: str = "SILENT",
) -> GenomicFrame:
    """SAM/BAM / FASTQ / Parquet → alignments (ADAMContext.loadAlignments).
    ``reference`` is forwarded to the CRAM codec for RR=true files;
    ``stringency`` governs malformed SAM headers."""
    if _has_ext(path, ".sam"):
        return _sam.load_sam(spark, path, stringency=stringency)
    if _has_ext(path, ".bam"):
        from adam_spark.sources.bam import load_bam

        return load_bam(spark, path, stringency=stringency)
    if _has_ext(path, ".cram"):
        from adam_spark.sources.cram import load_cram

        return load_cram(spark, path, reference=reference,
                         stringency=stringency)
    if _has_ext(path, ".fq", ".fastq", ".ifq"):
        return _fastq.load_fastq_alignments(spark, path, path2)
    return _load_parquet(spark, path, "alignment")


def load_features(spark: SparkSession, path: str) -> GenomicFrame:
    if _has_ext(path, ".bed"):
        return _feat.load_bed(spark, path)
    if _has_ext(path, ".gtf", ".gff"):
        return _feat.load_gtf(spark, path)
    if _has_ext(path, ".gff3"):
        return _feat.load_gff3(spark, path)
    if _has_ext(path, ".narrowpeak", ".broadpeak"):
        return _feat.load_narrowpeak(spark, path)
    if _has_ext(path, ".interval_list"):
        return _feat.load_interval_list(spark, path)
    return _load_parquet(spark, path, "feature")


def load_coverage(spark: SparkSession, path: str) -> GenomicFrame:
    """Any feature source viewed as coverage (ADAMContext.loadCoverage:
    score → count)."""
    gf = load_features(spark, path)
    if gf.kind == "coverage":
        return gf
    df = gf.df.select(
        "referenceName",
        "start",
        "end",
        F.coalesce(F.col("score"), F.lit(1.0)).cast("double").alias("count"),
        F.col("sampleId").alias("optSampleId")
        if "sampleId" in gf.df.columns
        else F.lit(None).cast("string").alias("optSampleId"),
    )
    meta = gf.meta.copy()
    meta.kind = "coverage"
    return GenomicFrame(df, meta)


def _load_bcf(spark: SparkSession, path: str) -> GenomicFrame:
    from adam_spark.sources.bcf import load_bcf

    return load_bcf(spark, path)


def load_variants(spark: SparkSession, path: str) -> GenomicFrame:
    if _has_ext(path, ".vcf"):
        return _vcf.load_vcf_variants(spark, path)
    if _has_ext(path, ".bcf"):
        return _vcf.contexts_to_variants_frame(_load_bcf(spark, path))
    return _load_parquet(spark, path, "variant")


def load_genotypes(spark: SparkSession, path: str) -> GenomicFrame:
    if _has_ext(path, ".vcf"):
        return _vcf.load_vcf_genotypes(spark, path)
    if _has_ext(path, ".bcf"):
        return _vcf.contexts_to_genotypes_frame(_load_bcf(spark, path))
    return _load_parquet(spark, path, "genotype")


def load_variant_contexts(spark: SparkSession, path: str) -> GenomicFrame:
    if _has_ext(path, ".vcf"):
        return _vcf.load_vcf(spark, path)
    if _has_ext(path, ".bcf"):
        # BCFv2.2 — a surface the reference ships fixtures and
        # (ignored) tests for but cannot itself read (htsjdk #507)
        return _load_bcf(spark, path)
    return _load_parquet(spark, path, "variant_context")


def load_sequences(spark: SparkSession, path: str, alphabet: str = "DNA") -> GenomicFrame:
    if _has_ext(path, ".fa", ".fasta"):
        return _fasta.load_fasta_sequences(spark, path, alphabet)
    return _load_parquet(spark, path, "sequence")


def load_slices(
    spark: SparkSession, path: str, maximum_length: int = 10_000
) -> GenomicFrame:
    if _has_ext(path, ".fa", ".fasta"):
        return _fasta.load_fasta_slices(spark, path, maximum_length)
    return _load_parquet(spark, path, "slice")


def load_fragments(spark: SparkSession, path: str) -> GenomicFrame:
    """Fragment Parquet, or any alignment source regrouped by read name
    (ADAMContext.loadFragments:3702)."""
    if _has_ext(path, ".sam", ".bam"):
        from adam_spark.operators.conversions import alignments_to_fragments

        gf = load_alignments(spark, path)
        meta = gf.meta.copy()
        meta.kind = "fragment"
        return GenomicFrame(alignments_to_fragments(gf.df), meta)
    return _load_parquet(spark, path, "fragment")


def load_reads(spark: SparkSession, path: str) -> GenomicFrame:
    if _has_ext(path, ".fq", ".fastq"):
        return _fastq.load_unpaired_fastq(spark, path)
    return _load_parquet(spark, path, "read")


def load_reference_file(path: str):
    """Random-access reference genome — .2bit or (indexed) FASTA
    (ADAMContext.loadReferenceFile:3492)."""
    from adam_spark.sources.reference_file import load_reference_file as _lrf

    return _lrf(path)


def load_sequence_dictionary(path: str) -> SequenceDictionary:
    """.dict (SAM header), .genome/.txt (name<TAB>length) dictionaries
    (ADAMContext.loadSequenceDictionary:3519) — driver-side read."""
    refs: list[Reference] = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("@HD"):
                continue
            if line.startswith("@SQ"):
                fields = dict(
                    kv.split(":", 1) for kv in line.split("\t")[1:] if ":" in kv
                )
                if "SN" in fields:
                    refs.append(
                        Reference(
                            name=fields["SN"],
                            length=int(fields["LN"]) if "LN" in fields else None,
                            md5=fields.get("M5"),
                        )
                    )
            elif "\t" in line and not line.startswith("@"):
                name, length = line.split("\t")[:2]
                refs.append(Reference(name=name, length=int(length)))
    return SequenceDictionary(refs)


def save(gf: GenomicFrame, path: str, single_file: bool = True, **kwargs) -> None:
    """Polymorphic save by extension (reference ``save`` dispatch)."""
    pg_line = kwargs.pop("pg_line", None)  # SAM/BAM-only kwarg
    is_sorted = kwargs.pop("is_sorted", False)  # SAM-only: @HD SO:coordinate
    sort_order = kwargs.pop("sort_order", None)  # SAM-only: explicit @HD SO
    if _has_ext(path, ".sam"):
        _sam.save_sam(
            gf, path, single_file=single_file, pg_line=pg_line,
            is_sorted=is_sorted, sort_order=sort_order,
        )
    elif _has_ext(path, ".bam"):
        from adam_spark.sources.bam import save_bam

        save_bam(gf, path, pg_line=pg_line)
    elif _has_ext(path, ".cram"):
        from adam_spark.sources.cram import save_cram

        save_cram(gf, path, **{k: v for k, v in kwargs.items()
                               if k in ("codec", "reference")})
    elif _has_ext(path, ".fq", ".fastq"):
        _fastq.save_fastq(gf, path, single_file=single_file, **kwargs)
    elif _has_ext(path, ".bed"):
        _feat.save_bed(gf, path, single_file=single_file)
    elif _has_ext(path, ".gtf"):
        _feat.save_gtf(gf, path, single_file=single_file)
    elif _has_ext(path, ".gff3"):
        _feat.save_gff3(gf, path, single_file=single_file)
    elif _has_ext(path, ".narrowpeak"):
        _feat.save_narrowpeak(gf, path, single_file=single_file)
    elif _has_ext(path, ".interval_list"):
        _feat.save_interval_list(gf, path, single_file=single_file)
    elif (path.lower().endswith((".vcf.gz", ".vcf.bgz"))
          or _has_ext(path, ".bcf", ".vcf")):
        if gf.meta.kind == "variant":
            # sites-only save (VariantDataset.toVariantContexts :349 →
            # saveAsVcf): wrap VARIANT rows into contexts with no
            # genotypes; the frame's metadata already lost its FORMAT
            # lines and samples at toVariants time. Applies uniformly
            # to .vcf / .vcf.gz / .vcf.bgz / .bcf saves.
            from adam_spark.core.genomic_frame import GenomicFrame
            from adam_spark.operators.conversions import (
                variants_to_variant_contexts,
            )

            gf = GenomicFrame(variants_to_variant_contexts(gf.df), gf.meta)
        if path.lower().endswith((".vcf.gz", ".vcf.bgz")):
            _vcf.save_vcf_bgzf(gf, path)  # bgzip + tabix index
        elif _has_ext(path, ".bcf"):
            from adam_spark.sources.bcf import save_bcf

            save_bcf(gf, path)
        else:
            _vcf.save_vcf(gf, path, single_file=single_file)
    elif _has_ext(path, ".fa", ".fasta"):
        _fasta.save_fasta(gf, path, single_file=single_file, **kwargs)
    else:
        partition_size = kwargs.get("partition_size")
        if partition_size:
            _parquet.save_partitioned_parquet(gf, path, partition_size=partition_size)
        else:
            _parquet.save_parquet(gf, path, mode=kwargs.get("mode", "error"))
