"""Command-line layer mirroring adam-cli (ADAMMain.scala:28-67).

Commands compose the library exactly like the reference's CLI composes
adam-core: ``transform_alignments`` is the pipeline driver
(TransformAlignments.scala:45-653 flag set, core subset). All 15
reference commands are mirrored: count_kmers, count_slice_kmers,
transform_{alignments,features,genotypes,sequences,slices,variants,
fragments}, merge_shards, coverage, adam2fastq, print, flagstat, view.
Run via ``python -m adam_spark <command> ...``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _spark(args):
    from adam_spark import get_spark

    return get_spark(f"adam_spark {args.command}")


def _parse_regions(spec: str) -> list[tuple[str, int, int]]:
    """'chr1:0-1000,chr2:50-100' → [(name, start, end), ...]
    (reference -region_predicate syntax, TransformAlignments.scala:68)."""
    regions = []
    for part in spec.split(","):
        name, span = part.rsplit(":", 1)
        beg, end = span.split("-", 1)
        regions.append((name, int(beg), int(end)))
    return regions


_STRINGENCIES = ("SILENT", "LENIENT", "STRICT")


def _cmd_transform_alignments(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.operators import filters as flt
    from adam_spark.operators.mark_duplicates import mark_duplicates
    from adam_spark.operators import sorts
    from adam_spark.operators.quality import bin_quality_scores, left_normalize_indels

    if args.stringency not in _STRINGENCIES:
        print(f"-stringency must be one of {_STRINGENCIES}", file=sys.stderr)
        return 2
    if args.region_predicate and args.aligned_read_predicate:
        print("-region_predicate and -aligned_read_predicate are exclusive",
              file=sys.stderr)
        return 2

    n_force = sum(
        1 for f in (args.force_load_bam, args.force_load_fastq,
                    args.force_load_ifastq, args.force_load_parquet) if f
    )
    if n_force > 1:
        print("at most one -force_load_* flag may be given", file=sys.stderr)
        return 2

    spark = _spark(args)
    # -force_load_* bypasses extension dispatch (TransformAlignments
    # .scala:140-149); -paired_fastq supplies the r2 path (.scala:161)
    if args.force_load_bam:
        # BAM vs text SAM by content, not name: BAM is BGZF (gzip magic)
        from adam_spark.sources import sam as _sam_mod
        from adam_spark.sources.bam import load_bam

        with open(args.input, "rb") as fh:
            magic = fh.read(2)
        gf = (load_bam(spark, args.input) if magic == b"\x1f\x8b"
              else _sam_mod.load_sam(spark, args.input))
    elif args.force_load_fastq or args.paired_fastq:
        from adam_spark.sources.fastq import load_fastq_alignments

        gf = load_fastq_alignments(spark, args.input, args.paired_fastq)
    elif args.force_load_ifastq:
        from adam_spark.sources.fastq import load_fastq_alignments

        gf = load_fastq_alignments(spark, args.input, interleaved=True)
    elif args.force_load_parquet:
        gf = ctx._load_parquet(spark, args.input, "alignment")
    else:
        gf = ctx.load_alignments(spark, args.input)
    is_fastq_input = (
        args.force_load_fastq or args.force_load_ifastq or args.paired_fastq
        or args.input.lower().endswith((".fq", ".fastq", ".ifq"))
    )
    if args.read_group is not None and is_fastq_input:
        # set converted FASTQs' read group; empty string → input
        # basename minus extension (TransformAlignments.scala:164)
        import os as _os

        from adam_spark.core.metadata import ReadGroup

        rg_id = args.read_group or _os.path.splitext(
            _os.path.basename(args.input)
        )[0]
        meta = gf.meta.copy()
        meta.read_groups = [ReadGroup(id=rg_id)]
        gf = GenomicFrame(gf.df.withColumn("readGroupId", F.lit(rg_id)), meta)
    if args.max_read_length and args.max_read_length > 0 and is_fastq_input:
        # FastqRecordReader.setMaxReadLength analog (.scala:445-446):
        # over-long reads are an error under STRICT, dropped (with a
        # count to stderr) otherwise
        too_long = gf.df.where(F.length("sequence") > args.max_read_length)
        if args.stringency == "STRICT":
            n_bad = too_long.count()
            if n_bad:
                print(f"{n_bad} reads exceed -max_read_length "
                      f"{args.max_read_length}", file=sys.stderr)
                return 1
        gf = GenomicFrame(
            gf.df.where(F.length("sequence") <= args.max_read_length), gf.meta
        )
    if args.concat:
        other = ctx.load_alignments(spark, args.concat)
        gf = GenomicFrame(gf.df.unionByName(other.df, allowMissingColumns=True),
                          gf.meta)
    # load-side predicates/projection (pushed into the parquet scan by
    # Catalyst when the source is parquet — filter + select reach the
    # reader as PushedFilters/ReadSchema; TransformAlignments.scala:62-69)
    if args.region_predicate:
        gf = gf.filter_by_overlapping_regions(_parse_regions(args.region_predicate))
    df = gf.df
    if args.aligned_read_predicate:
        df = df.where(F.col("readMapped").eqNullSafe(F.lit(True)))
    if args.limit_projection:
        keep = [
            "readName", "referenceName", "start", "end", "cigar", "sequence",
            "qualityScores", "mappingQuality", "readMapped", "readPaired",
            "properPair", "readNegativeStrand", "readInFragment", "readGroupId",
            "duplicateRead", "primaryAlignment", "secondaryAlignment",
            "supplementaryAlignment", "mateReferenceName", "mateAlignmentStart",
            "mateMapped", "mateNegativeStrand", "insertSize",
            "mismatchingPositions", "failedVendorQualityChecks",
            "originalQualityScores",
        ]
        df = df.select([c for c in keep if c in df.columns])
    if args.repartition:
        df = df.repartition(args.repartition)
    if args.min_mapping_quality is not None:
        df = flt.filter_by_mapping_quality(df, args.min_mapping_quality)
    if args.filter_duplicates:
        df = flt.filter_duplicate_reads(df)
    if args.mark_duplicate_reads:
        df = mark_duplicates(df, {g.id: (g.library or g.id) for g in gf.meta.read_groups})
    if args.recalibrate_base_qualities:
        from adam_spark.operators.bqsr import recalibrate_base_qualities

        known = None
        if args.known_snps:
            known = ctx.load_variants(spark, args.known_snps).df
        df = recalibrate_base_qualities(
            df, known, min_acceptable_quality=args.min_acceptable_quality,
            sampling_fraction=args.sampling_fraction,
            # seed 0 means "unset" in the reference (.scala:92-93)
            sampling_seed=args.sampling_seed or None,
        )
    if args.realign_indels:
        from adam_spark.operators.realignment import realign_indels

        known = None
        if args.known_indels:
            known = ctx.load_variants(spark, args.known_indels).df
        df = realign_indels(
            df,
            known_indels=known,
            lod_threshold=args.log_odds_threshold,
            max_consensus_number=args.max_consensus_number,
            max_indel_size=args.max_indel_size,
            max_target_size=args.max_target_size,
            max_reads_per_target=args.max_reads_per_target,
            unclip_reads=args.unclip_reads,
        )
        if args.reference:
            # -reference (TransformAlignments.scala:125, :280-283):
            # realigned reads get fresh MD tags against the reference
            # (the reference engine threads optReferenceFile into
            # realignIndels for exactly this)
            from adam_spark.operators.md_tagging import compute_mismatching_positions

            ref = args.reference
            if not ref.lower().endswith(".2bit"):
                from adam_spark.sources.fasta import load_fasta_sequences

                ref = load_fasta_sequences(spark, ref).df
            df = compute_mismatching_positions(df, ref, overwrite=True)
    if args.left_normalize_indels:
        df = left_normalize_indels(df)
    if args.add_md_tags:
        from adam_spark.operators.md_tagging import compute_mismatching_positions

        ref = args.add_md_tags
        if ref.lower().endswith(".2bit"):
            df = compute_mismatching_positions(df, ref, overwrite=args.md_tag_overwrite)
        elif args.md_tag_fragment_size:
            # -md_tag_fragment_size (.scala:173-174, :282): bound per-
            # fragment reference memory by tagging against OVERLAPPING
            # slices of that length (pad covers boundary-spanning reads)
            from adam_spark.operators.md_tagging import tag_reads_with_md
            from adam_spark.sources.fasta import load_fasta_sequences

            fs = int(args.md_tag_fragment_size)
            pad = 10_000  # >= max read reference span
            seqs = load_fasta_sequences(spark, ref).df
            slices = seqs.select(
                "name",
                F.posexplode(
                    F.sequence(
                        F.lit(0),
                        F.floor((F.length("sequence") - F.lit(1)) / F.lit(fs)).cast("long"),
                    )
                ).alias("__i", "__step"),
                F.col("sequence").alias("__full"),
            ).select(
                "name",
                (F.col("__i") * fs).cast("long").alias("start"),
                F.least(
                    F.length("__full").cast("long"),
                    (F.col("__i") * fs + fs + pad).cast("long"),
                ).alias("end"),
                F.col("__full").substr(
                    (F.col("__i") * fs + 1).cast("int"), F.lit(fs + pad)
                ).alias("sequence"),
            )
            df = tag_reads_with_md(df, slices)
        else:
            # FASTA: load to the SEQUENCE schema; the kernel collects
            # contigs into its broadcast dict (2bit stays the scale path)
            from adam_spark.sources.fasta import load_fasta_sequences

            df = compute_mismatching_positions(
                df, load_fasta_sequences(spark, ref).df,
                overwrite=args.md_tag_overwrite,
            )
    if args.bin_quality_scores:
        df = bin_quality_scores(df, args.bin_quality_scores.split(";"))
    if args.sort_by_read_name:
        df = sorts.sort_by_read_name(df)
    elif args.sort_by_reference_position:
        df = sorts.sort_by_reference_position(df)
    elif args.sort_by_reference_position_and_index:
        df = sorts.sort_by_reference_position_and_index(df, gf.meta.references)
    if args.cache:
        # -storage_level names a pyspark StorageLevel constant
        # (StorageLevel.fromString analog, TransformAlignments.scala:441)
        from pyspark import StorageLevel

        level = getattr(StorageLevel, args.storage_level, None)
        if level is None:
            print(f"unknown -storage_level {args.storage_level}", file=sys.stderr)
            return 2
        df = df.persist(level)
    if args.coalesce:
        # -force_shuffle_coalesce: a plain coalesce() can collapse
        # upstream parallelism into the narrow ancestor; the shuffle
        # variant repartitions instead (TransformAlignments.scala:134)
        df = df.repartition(args.coalesce) if args.force_shuffle_coalesce else df.coalesce(args.coalesce)
    out = gf.__class__(df, gf.meta)
    # a fresh @PG program record goes into SAM/BAM headers unless
    # -disable_pg (TransformAlignments.scala:188)
    pg_line = (
        None
        if args.disable_pg
        else "@PG\tID:adam_spark\tPN:adam_spark\tCL:transform_alignments"
    )
    single_file = (args.single or not args.sharded) and not args.defer_merging
    is_fastq_out = args.output.lower().endswith((".fq", ".fastq"))
    save_kwargs = {}
    if is_fastq_out and args.sort_fastq_output:
        save_kwargs["sort_by_name"] = True  # .scala:137-138
    if args.partition_by_start_pos:
        from adam_spark.sources.parquet import save_partitioned_parquet

        save_partitioned_parquet(out, args.output, partition_size=args.partition_bin_size)
    elif args.partition_size:
        ctx.save(out, args.output, partition_size=args.partition_size)
    elif single_file and args.disable_fast_concat and args.output.lower().endswith(
        (".sam", ".fq", ".fastq", ".bed", ".gtf", ".gff3", ".vcf")
    ):
        # -disable_fast_concat (.scala:158): the default single-file
        # path is a one-pass coalesce(1) write ("fast concat" — upstream
        # stays parallel, one writer task); this variant writes shards
        # at full parallelism and serially concatenates them driver-side
        # (util/FileMerger.scala:35's non-parallel branch)
        import os as _os
        import shutil as _shutil

        from adam_spark.sources.merge import merge_shards

        # keep the extension so the sharded save dispatches by format
        _base, _ext = _os.path.splitext(args.output)
        shard_dir = _base + ".shards" + _ext
        ctx.save(out, shard_dir, single_file=False, pg_line=pg_line, **save_kwargs)
        merge_shards(shard_dir, args.output)
        _shutil.rmtree(shard_dir)
    else:
        ctx.save(out, args.output, single_file=single_file, pg_line=pg_line,
                 **save_kwargs)
    return 0


def _cmd_flagstat(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.operators.flagstat import flagstat

    spark = _spark(args)
    gf = ctx.load_alignments(spark, args.input)
    for row in flagstat(gf.df).collect():
        for k, v in row.asDict().items():
            print(f"{k}\t{v}")
    return 0


def _cmd_coverage(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.operators.coverage import collapse_coverage, to_coverage

    spark = _spark(args)
    gf = ctx.load_alignments(spark, args.input)
    cov = to_coverage(gf.df)
    if args.collapse:
        cov = collapse_coverage(cov)
    meta = gf.meta.copy()
    meta.kind = "coverage"
    ctx.save(GenomicFrame(cov, meta), args.output, mode="overwrite")
    return 0


def _cmd_count_kmers(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.operators.kmers import count_kmers

    spark = _spark(args)
    gf = ctx.load_alignments(spark, args.input)
    counts = count_kmers(gf.df, args.kmer_length)
    counts.select(
        F.concat_ws("\t", F.col("kmer"), F.col("count"))
    ).write.mode("overwrite").text(args.output)
    return 0


def _cmd_view(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.operators.filters import view_filter

    spark = _spark(args)
    gf = ctx.load_alignments(spark, args.input)
    df = view_filter(
        gf.df,
        match_all_bits=args.f,
        mismatch_all_bits=args.F,
        match_some_bits=args.g,
        mismatch_some_bits=args.G,
    )
    if args.count:
        print(df.count())
    elif args.output:
        ctx.save(gf.__class__(df, gf.meta), args.output)
    else:
        for line in df.limit(args.limit).collect():
            print(line)
    return 0


def _cmd_transform_features(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_features(spark, args.input)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_transform_variants(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_variant_contexts(spark, args.input)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_count_slice_kmers(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.operators.kmers import count_kmers

    spark = _spark(args)
    gf = ctx.load_slices(spark, args.input)
    counts = count_kmers(gf.df, args.kmer_length)
    counts.select(
        F.concat_ws("\t", F.col("kmer"), F.col("count"))
    ).write.mode("overwrite").text(args.output)
    return 0


def _cmd_transform_genotypes(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_genotypes(spark, args.input)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_transform_sequences(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_sequences(spark, args.input)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_transform_slices(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_slices(spark, args.input, maximum_length=args.maximum_length)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_transform_fragments(args) -> int:
    from adam_spark import context as ctx

    spark = _spark(args)
    gf = ctx.load_fragments(spark, args.input)
    if args.load_as_alignments:
        from adam_spark.core.genomic_frame import GenomicFrame
        from adam_spark.operators.conversions import fragments_to_alignments

        meta = gf.meta.copy()
        meta.kind = "alignment"
        gf = GenomicFrame(fragments_to_alignments(gf.df), meta)
    ctx.save(gf, args.output, single_file=not args.sharded)
    return 0


def _cmd_adam2fastq(args) -> int:
    from adam_spark import context as ctx
    from adam_spark.sources.fastq import save_fastq, save_paired_fastq

    spark = _spark(args)
    gf = ctx.load_alignments(spark, args.input)
    if args.output2:
        save_paired_fastq(gf, args.output, args.output2)
    else:
        save_fastq(
            gf,
            args.output,
            sort_by_name=args.sort_by_name,
            write_suffixes=args.write_suffixes,
            single_file=True,
        )
    return 0


def _cmd_print(args) -> int:
    """PrintADAM parity: show the first rows of any dataset."""
    from adam_spark.sources.parquet import load_parquet

    spark = _spark(args)
    gf = load_parquet(spark, args.input)
    gf.df.show(args.limit, truncate=not args.full)
    return 0


def _cmd_merge_shards(args) -> int:
    from adam_spark.sources.merge import merge_shards

    n = merge_shards(args.input, args.output, header_path=args.header)
    print(f"merged {n} shards into {args.output}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="adam_spark", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    ta = sub.add_parser("transform_alignments", help="alignment pipeline driver")
    ta.add_argument("input")
    ta.add_argument("output")
    ta.add_argument("-mark_duplicate_reads", dest="mark_duplicate_reads", action="store_true")
    ta.add_argument("-recalibrate_base_qualities", dest="recalibrate_base_qualities", action="store_true")
    ta.add_argument("-known_snps", dest="known_snps", default=None)
    ta.add_argument("-realign_indels", dest="realign_indels", action="store_true")
    ta.add_argument("-known_indels", dest="known_indels", default=None)
    ta.add_argument("-left_normalize_indels", dest="left_normalize_indels", action="store_true")
    ta.add_argument("-bin_quality_scores", dest="bin_quality_scores", default=None,
                    help="semicolon-separated low,high,value bins")
    ta.add_argument("-min_mapping_quality", dest="min_mapping_quality", type=int, default=None)
    ta.add_argument("-filter_duplicates", dest="filter_duplicates", action="store_true")
    ta.add_argument("-sort_by_read_name", dest="sort_by_read_name", action="store_true")
    ta.add_argument("-sort_by_reference_position", dest="sort_by_reference_position", action="store_true")
    ta.add_argument("-sort_by_reference_position_and_index",
                    dest="sort_by_reference_position_and_index", action="store_true")
    ta.add_argument("-limit_projection", dest="limit_projection", action="store_true",
                    help="project only core alignment fields (parquet column pruning)")
    ta.add_argument("-aligned_read_predicate", dest="aligned_read_predicate",
                    action="store_true", help="load only aligned reads")
    ta.add_argument("-region_predicate", dest="region_predicate", default=None,
                    help="load only regions, e.g. 'chr1:0-1000,chr2:50-100'")
    ta.add_argument("-concat", dest="concat", default=None,
                    help="concatenate this input with INPUT before transforming")
    ta.add_argument("-repartition", dest="repartition", type=int, default=None,
                    help="repartition input to this many partitions")
    ta.add_argument("-coalesce", dest="coalesce", type=int, default=None,
                    help="coalesce output to this many partitions")
    ta.add_argument("-force_shuffle_coalesce", dest="force_shuffle_coalesce",
                    action="store_true")
    ta.add_argument("-cache", dest="cache", action="store_true",
                    help="persist between pipeline stages")
    ta.add_argument("-stringency", dest="stringency", default="LENIENT",
                    help="SILENT, LENIENT, or STRICT")
    ta.add_argument("-min_acceptable_quality", dest="min_acceptable_quality",
                    type=int, default=5)
    ta.add_argument("-max_indel_size", dest="max_indel_size", type=int, default=500)
    ta.add_argument("-max_consensus_number", dest="max_consensus_number",
                    type=int, default=30)
    ta.add_argument("-log_odds_threshold", dest="log_odds_threshold",
                    type=float, default=5.0)
    ta.add_argument("-max_target_size", dest="max_target_size", type=int, default=3000)
    ta.add_argument("-max_reads_per_target", dest="max_reads_per_target",
                    type=int, default=20_000)
    ta.add_argument("-unclip_reads", dest="unclip_reads", action="store_true")
    ta.add_argument("-add_md_tags", dest="add_md_tags", default=None,
                    help="reference file (.2bit/FASTA) for MD tagging")
    ta.add_argument("-md_tag_overwrite", dest="md_tag_overwrite", action="store_true")
    ta.add_argument("-partition_by_start_pos", dest="partition_by_start_pos",
                    action="store_true",
                    help="save Hive-partitioned by genomic position bin")
    ta.add_argument("-partition_bin_size", dest="partition_bin_size",
                    type=int, default=1_000_000)
    ta.add_argument("-partition_size", dest="partition_size", type=int, default=None,
                    help="write partitioned parquet with this bin size")
    ta.add_argument("-sharded", dest="sharded", action="store_true")
    ta.add_argument("-single", dest="single", action="store_true",
                    help="save OUTPUT as a single file")
    ta.add_argument("-defer_merging", dest="defer_merging", action="store_true",
                    help="write single-file output as unmerged shards (merge later with merge_shards)")
    ta.add_argument("-disable_fast_concat", dest="disable_fast_concat",
                    action="store_true",
                    help="serial driver-side shard concat instead of the one-pass coalesce write")
    ta.add_argument("-disable_pg", dest="disable_pg", action="store_true",
                    help="do not write a new @PG header line")
    ta.add_argument("-paired_fastq", dest="paired_fastq", default=None,
                    help="r2 path when converting paired FASTQ")
    ta.add_argument("-sort_fastq_output", dest="sort_fastq_output",
                    action="store_true")
    ta.add_argument("-force_load_bam", dest="force_load_bam", action="store_true")
    ta.add_argument("-force_load_fastq", dest="force_load_fastq", action="store_true")
    ta.add_argument("-force_load_ifastq", dest="force_load_ifastq", action="store_true")
    ta.add_argument("-force_load_parquet", dest="force_load_parquet", action="store_true")
    ta.add_argument("-read_group", dest="read_group", default=None,
                    help="read-group id for converted FASTQs ('' = input basename)")
    ta.add_argument("-sampling_fraction", dest="sampling_fraction", type=float,
                    default=None, help="observe BQSR covariates on a sample of reads")
    ta.add_argument("-sampling_seed", dest="sampling_seed", type=int, default=0)
    ta.add_argument("-storage_level", dest="storage_level", default="MEMORY_ONLY",
                    help="StorageLevel name used by -cache")
    ta.add_argument("-max_read_length", dest="max_read_length", type=int, default=0)
    ta.add_argument("-md_tag_fragment_size", dest="md_tag_fragment_size", type=int,
                    default=None)
    ta.add_argument("-reference", dest="reference", default=None,
                    help="reference file (.2bit/FASTA): refresh MD tags after -realign_indels")
    ta.set_defaults(fn=_cmd_transform_alignments)

    fs = sub.add_parser("flagstat", help="samtools-flagstat counters")
    fs.add_argument("input")
    fs.set_defaults(fn=_cmd_flagstat)

    cv = sub.add_parser("coverage", help="alignments -> per-base coverage")
    cv.add_argument("input")
    cv.add_argument("output")
    cv.add_argument("-collapse", dest="collapse", action="store_true")
    cv.set_defaults(fn=_cmd_coverage)

    km = sub.add_parser("count_kmers", help="k-mer counts to text")
    km.add_argument("input")
    km.add_argument("output")
    km.add_argument("kmer_length", type=int)
    km.set_defaults(fn=_cmd_count_kmers)

    vw = sub.add_parser("view", help="samtools-view flag filters")
    vw.add_argument("input")
    vw.add_argument("-f", type=int, default=None, help="match all flag bits")
    vw.add_argument("-F", type=int, default=None, help="mismatch all flag bits")
    vw.add_argument("-g", type=int, default=None, help="match some flag bits")
    vw.add_argument("-G", type=int, default=None, help="mismatch some flag bits")
    vw.add_argument("-c", dest="count", action="store_true", help="print count only")
    vw.add_argument("-o", dest="output", default=None)
    vw.add_argument("-limit", dest="limit", type=int, default=20)
    vw.set_defaults(fn=_cmd_view)

    tf = sub.add_parser("transform_features", help="feature format conversion")
    tf.add_argument("input")
    tf.add_argument("output")
    tf.add_argument("-sharded", dest="sharded", action="store_true")
    tf.set_defaults(fn=_cmd_transform_features)

    ck = sub.add_parser("count_slice_kmers", help="k-mer counts over slices")
    ck.add_argument("input")
    ck.add_argument("output")
    ck.add_argument("kmer_length", type=int)
    ck.set_defaults(fn=_cmd_count_slice_kmers)

    tg = sub.add_parser("transform_genotypes", help="genotype format conversion")
    tg.add_argument("input")
    tg.add_argument("output")
    tg.add_argument("-sharded", dest="sharded", action="store_true")
    tg.set_defaults(fn=_cmd_transform_genotypes)

    ts = sub.add_parser("transform_sequences", help="sequence format conversion")
    ts.add_argument("input")
    ts.add_argument("output")
    ts.add_argument("-sharded", dest="sharded", action="store_true")
    ts.set_defaults(fn=_cmd_transform_sequences)

    tl = sub.add_parser("transform_slices", help="slice format conversion")
    tl.add_argument("input")
    tl.add_argument("output")
    tl.add_argument("-maximum_length", dest="maximum_length", type=int, default=10_000)
    tl.add_argument("-sharded", dest="sharded", action="store_true")
    tl.set_defaults(fn=_cmd_transform_slices)

    tfr = sub.add_parser("transform_fragments", help="fragment format conversion")
    tfr.add_argument("input")
    tfr.add_argument("output")
    tfr.add_argument("-load_as_alignments", dest="load_as_alignments", action="store_true")
    tfr.add_argument("-sharded", dest="sharded", action="store_true")
    tfr.set_defaults(fn=_cmd_transform_fragments)

    a2f = sub.add_parser("adam2fastq", help="alignments -> FASTQ")
    a2f.add_argument("input")
    a2f.add_argument("output")
    a2f.add_argument("output2", nargs="?", default=None, help="r2 path for paired output")
    a2f.add_argument("-sort_by_name", dest="sort_by_name", action="store_true")
    a2f.add_argument("-write_suffixes", dest="write_suffixes", action="store_true")
    a2f.set_defaults(fn=_cmd_adam2fastq)

    pr = sub.add_parser("print", help="show the first rows of a dataset")
    pr.add_argument("input")
    pr.add_argument("-limit", dest="limit", type=int, default=20)
    pr.add_argument("-full", dest="full", action="store_true", help="untruncated columns")
    pr.set_defaults(fn=_cmd_print)

    ms = sub.add_parser("merge_shards", help="concatenate sharded text output")
    ms.add_argument("input", help="shard directory (part-* files)")
    ms.add_argument("output", help="merged single file")
    ms.add_argument("-header", dest="header", default=None, help="header file to prepend")
    ms.set_defaults(fn=_cmd_merge_shards)

    tv = sub.add_parser("transform_variants", help="variant format conversion")
    tv.add_argument("input")
    tv.add_argument("output")
    tv.add_argument("-sharded", dest="sharded", action="store_true")
    tv.set_defaults(fn=_cmd_transform_variants)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
