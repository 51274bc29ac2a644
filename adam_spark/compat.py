"""Drop-in camelCase API mirroring the reference's Python surface.

The reference ships a py4j wrapper (adam-python/bdgenomics/adam/
adamContext.py:48-310, ds.py — ADAMContext plus one camelCase dataset
class per record type). Users of that API can switch engines by
changing ONE import::

    from adam_spark.compat import ADAMContext
    ac = ADAMContext(spark)
    reads = ac.loadAlignments("sample.bam")
    reads.markDuplicates().realignIndels().saveAsSam("out.sam")

Every method here is a thin delegation to the snake_case engine API
(`GenomicFrame`, `adam_spark.context`, operator modules) — no logic
lives in this module, so the compat surface can never drift from the
engine. Methods returning datasets re-wrap in the matching compat
class; terminal methods (save*, flagStat, toDF) return plain values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from adam_spark import context as _ctx
from adam_spark.core.genomic_frame import GenomicFrame


def _wrap(gf: GenomicFrame):
    """GenomicFrame → the compat class matching its kind."""
    cls = _KIND_TO_CLASS.get(gf.kind, GenomicDataset)
    return cls(gf)


class GenomicDataset:
    """Base wrapper (reference: ds.py GenomicDataset)."""

    def __init__(self, gf: GenomicFrame):
        self._gf = gf

    # --- plumbing ---------------------------------------------------------
    def toDF(self) -> DataFrame:
        return self._gf.to_df()

    def cache(self):
        self._gf.cache()
        return self

    def persist(self, sl=None):
        self._gf.df.persist(*([] if sl is None else [sl]))
        return self

    def unpersist(self):
        self._gf.df.unpersist()
        return self

    def transform(self, fn):
        return _wrap(self._gf.transform_df(lambda df: fn(df)))

    def transmute(self, fn, convFn=None):
        out = self._gf.transform_df(lambda df: fn(df))
        return _wrap(out) if convFn is None else convFn(out)

    def pipe(self, cmd, **kw):
        return _wrap(self._gf.pipe(cmd, **kw))

    def save(self, filePath, **kw):
        self._gf.save(filePath, **kw)

    # --- region algebra ---------------------------------------------------
    def sort(self):
        return _wrap(self._gf.sort())

    def sortLexicographically(self):
        return _wrap(self._gf.sort_lexicographically())

    def filterByOverlappingRegion(self, query):
        return _wrap(self._gf.filter_by_overlapping_region(query))

    def filterByOverlappingRegions(self, querys):
        return _wrap(self._gf.filter_by_overlapping_regions(list(querys)))

    def union(self, *datasets):
        return _wrap(self._gf.union(*[d._gf for d in datasets]))

    # --- the 11 join variants (ds.py:164-460) -----------------------------
    def broadcastRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, broadcast="left", flank=flankSize))

    def rightOuterBroadcastRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(
            self._gf.region_join(
                genomicDataset._gf, how="right_outer", broadcast="left", flank=flankSize
            )
        )

    def broadcastRegionJoinAndGroupByRight(self, genomicDataset, flankSize=0):
        return _wrap(
            self._gf.region_join(
                genomicDataset._gf, group="right", broadcast="left", flank=flankSize
            )
        )

    def rightOuterBroadcastRegionJoinAndGroupByRight(self, genomicDataset, flankSize=0):
        return _wrap(
            self._gf.region_join(
                genomicDataset._gf, how="right_outer", group="right",
                broadcast="left", flank=flankSize,
            )
        )

    def shuffleRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, flank=flankSize))

    def rightOuterShuffleRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, how="right_outer", flank=flankSize))

    def leftOuterShuffleRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, how="left_outer", flank=flankSize))

    def fullOuterShuffleRegionJoin(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, how="full_outer", flank=flankSize))

    def shuffleRegionJoinAndGroupByLeft(self, genomicDataset, flankSize=0):
        return _wrap(self._gf.region_join(genomicDataset._gf, group="left", flank=flankSize))

    def leftOuterShuffleRegionJoinAndGroupByLeft(self, genomicDataset, flankSize=0):
        return _wrap(
            self._gf.region_join(
                genomicDataset._gf, how="left_outer", group="left", flank=flankSize
            )
        )

    def rightOuterShuffleRegionJoinAndGroupByLeft(self, genomicDataset, flankSize=0):
        return _wrap(
            self._gf.region_join(
                genomicDataset._gf, how="right_outer", group="left", flank=flankSize
            )
        )

    # --- reusable-broadcast join family (GenomicDataset.scala:1087-1655):
    # broadcast() materializes once; each *Against call probes it with the
    # broadcast side as the LEFT of the result, exactly like the
    # non-Against call on the broadcast frame -----------------------------
    def broadcast(self):
        return self._gf.broadcast()

    def broadcastRegionJoinAgainst(self, broadcast):
        return _wrap(self._gf.broadcast_region_join_against(broadcast))

    def rightOuterBroadcastRegionJoinAgainst(self, broadcast):
        return _wrap(
            self._gf.broadcast_region_join_against(broadcast, how="right_outer")
        )

    def broadcastRegionJoinAgainstAndGroupByRight(self, broadcast):
        return _wrap(self._gf.broadcast_region_join_against(broadcast, group="right"))

    def rightOuterBroadcastRegionJoinAgainstAndGroupByRight(self, broadcast):
        return _wrap(
            self._gf.broadcast_region_join_against(
                broadcast, how="right_outer", group="right"
            )
        )

    # --- metadata mutators (GenomicDataset addX/replaceX families) -------
    def addReference(self, reference):
        return _wrap(self._gf.add_references([reference]))

    def addReferences(self, references):
        return _wrap(self._gf.add_references(references))

    def replaceReferences(self, references):
        return _wrap(self._gf.replace_references(references))

    def addReadGroup(self, readGroup):
        return _wrap(self._gf.add_read_groups([readGroup]))

    def addReadGroups(self, readGroups):
        return _wrap(self._gf.add_read_groups(readGroups))

    def replaceReadGroups(self, readGroups):
        return _wrap(self._gf.replace_read_groups(readGroups))

    def addSample(self, sample):
        return _wrap(self._gf.add_samples([sample]))

    def addSamples(self, samples):
        return _wrap(self._gf.add_samples(samples))

    def replaceSamples(self, samples):
        return _wrap(self._gf.replace_samples(samples))

    def addHeaderLine(self, headerLine):
        return _wrap(self._gf.add_header_lines([headerLine]))

    def addHeaderLines(self, headerLines):
        return _wrap(self._gf.add_header_lines(headerLines))

    def replaceHeaderLines(self, headerLines):
        return _wrap(self._gf.replace_header_lines(headerLines))

    def addProcessingStep(self, step):
        return _wrap(self._gf.with_processing_step(step))

    def replaceProcessingSteps(self, steps):
        return _wrap(self._gf.replace_processing_steps(steps))

    # Scala-typed Dataset aliases — one binding in a DataFrame engine
    def transformDataset(self, fn):
        return self.transform(fn)

    def transmuteDataset(self, fn, convFn=None):
        return self.transmute(fn, convFn=convFn)


class AlignmentDataset(GenomicDataset):
    # --- domain filters (AlignmentDataset.scala filterX family) ----------
    def filterByMappingQuality(self, minimumMappingQuality):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(
            lambda df: _flt.filter_by_mapping_quality(df, minimumMappingQuality)))

    def filterUnalignedReads(self):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(_flt.filter_unaligned_reads))

    def filterUnpairedReads(self):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(_flt.filter_unpaired_reads))

    def filterDuplicateReads(self):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(_flt.filter_duplicate_reads))

    def filterToPrimaryAlignments(self):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(_flt.filter_to_primary_alignments))

    def filterToReadGroup(self, readGroupId):
        return self.filterToReadGroups([readGroupId])

    def filterToReadGroups(self, readGroupIds):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(
            lambda df: _flt.filter_to_read_groups(df, list(readGroupIds))))

    def filterToSample(self, sampleId):
        return self.filterToSamples([sampleId])

    def filterToSamples(self, sampleIds):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(
            lambda df: _flt.filter_to_samples(df, list(sampleIds))))

    def filterToReferenceName(self, referenceName):
        from adam_spark.operators import filters as _flt

        return _wrap(self._gf.transform_df(
            lambda df: _flt.filter_to_reference_name(df, referenceName)))

    def toFragments(self):
        from adam_spark.operators.conversions import alignments_to_fragments

        out = GenomicFrame(alignments_to_fragments(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "fragment"
        return FragmentDataset(out)

    def toCoverage(self, collapse=False):
        return CoverageDataset(self._gf.to_coverage())

    def saveAsSam(self, filePath, asType=None, isSorted=False, asSingleFile=False):
        self._gf.save(filePath, is_sorted=isSorted)

    def saveAsSamString(self):
        """The dataset as one SAM-spec string on the driver
        (ds.py:940-952). Driver-sized outputs only — the reference has
        the same caveat (it builds the whole file driver-side)."""
        from adam_spark.sources.sam import sam_body_lines, sam_header_lines

        body = [r[0] for r in sam_body_lines(self._gf.df).collect()]
        return "\n".join(sam_header_lines(self._gf.meta) + body) + "\n"

    def saveAsFastq(self, fileName, **kw):
        from adam_spark.sources.fastq import save_fastq

        save_fastq(self._gf, fileName)

    def saveAsPairedFastq(self, fileName1, fileName2, persistLevel=None, **kw):
        from adam_spark.sources.fastq import save_paired_fastq

        save_paired_fastq(self._gf, fileName1, fileName2)

    def countKmers(self, kmerLength):
        return self._gf.count_kmers(kmerLength)

    # Scala-typed Dataset alias — one binding in a DataFrame engine
    def countKmersAsDataset(self, kmerLength):
        return self.countKmers(kmerLength)

    def sortByReadName(self):
        from adam_spark.operators.sorts import sort_by_read_name

        return _wrap(self._gf.transform_df(sort_by_read_name))

    def sortByReferencePosition(self):
        from dataclasses import replace as _replace

        from adam_spark.core.metadata import SequenceDictionary
        from adam_spark.operators.sorts import sort_by_reference_position

        out = self._gf.transform_df(sort_by_reference_position)
        # the reference replaces the dictionary with stripIndices.sorted
        # (AlignmentDataset.scala:1023-1029): lexicographic name order,
        # indices reassigned — so a subsequent isSorted save writes the
        # @SQ lines in the file's record order (pinned vs ordered.sam)
        out.meta = out.meta.copy()
        out.meta.references = SequenceDictionary(
            [
                _replace(r, index=None)
                for r in sorted(out.meta.references.references, key=lambda r: r.name)
            ]
        )
        return _wrap(out)

    def sortByReferencePositionAndIndex(self):
        from adam_spark.operators.sorts import sort_by_reference_position_and_index

        return _wrap(
            self._gf.transform_df(
                lambda df: sort_by_reference_position_and_index(df, self._gf.meta.references)
            )
        )

    def markDuplicates(self):
        return _wrap(self._gf.mark_duplicates())

    def recalibrateBaseQualities(self, knownSnps=None, validationStringency=None):
        snps = knownSnps._gf if knownSnps is not None else None
        return _wrap(self._gf.recalibrate_base_qualities(snps))

    def realignIndels(self, **kw):
        return _wrap(self._gf.realign_indels(**kw))

    def realignIndelsFromKnownIndels(self, knownIndels, **kw):
        # knownIndels: a VariantDataset wrapper or a DataFrame of variants
        kdf = knownIndels._gf.df if hasattr(knownIndels, "_gf") else knownIndels
        return _wrap(self._gf.realign_indels(known_indels=kdf, **kw))

    def reassembleReadPairs(self, rdd=None, validationStringency=None):
        from adam_spark.operators.conversions import reassemble_read_pairs

        return _wrap(self._gf.transform_df(lambda df: reassemble_read_pairs(df)))

    def flagStat(self):
        return self._gf.flagstat()


class CoverageDataset(GenomicDataset):
    def collapse(self):
        from adam_spark.operators.coverage import collapse_coverage

        return CoverageDataset(self._gf.transform_df(collapse_coverage))

    def toFeatures(self):
        from adam_spark.operators.conversions import coverage_to_features

        out = GenomicFrame(coverage_to_features(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "feature"
        return FeatureDataset(out)

    def coverage(self, bpPerBin=1):
        from adam_spark.operators.coverage import downsample_coverage

        return CoverageDataset(
            self._gf.transform_df(lambda df: downsample_coverage(df, bpPerBin))
        )

    def aggregatedCoverage(self, bpPerBin=1):
        from adam_spark.operators.coverage import aggregated_coverage

        return CoverageDataset(
            self._gf.transform_df(lambda df: aggregated_coverage(df, bpPerBin))
        )

    def flatten(self):
        from adam_spark.operators.coverage import flatten_coverage

        return CoverageDataset(self._gf.transform_df(flatten_coverage))


class FeatureDataset(GenomicDataset):
    # --- domain filters (FeatureDataset.scala filterX family) ------------
    def _filter(self, fn, *args):
        return _wrap(self._gf.transform_df(lambda df: fn(df, *args)))

    def filterToFeatureType(self, featureType):
        return self.filterToFeatureTypes([featureType])

    def filterToFeatureTypes(self, featureTypes):
        from adam_spark.operators.filters import filter_to_feature_types

        return self._filter(filter_to_feature_types, list(featureTypes))

    def filterToGene(self, geneId):
        return self.filterToGenes([geneId])

    def filterToGenes(self, geneIds):
        from adam_spark.operators.filters import filter_to_genes

        return self._filter(filter_to_genes, list(geneIds))

    def filterToTranscript(self, transcriptId):
        return self.filterToTranscripts([transcriptId])

    def filterToTranscripts(self, transcriptIds):
        from adam_spark.operators.filters import filter_to_transcripts

        return self._filter(filter_to_transcripts, list(transcriptIds))

    def filterToExon(self, exonId):
        return self.filterToExons([exonId])

    def filterToExons(self, exonIds):
        from adam_spark.operators.filters import filter_to_exons

        return self._filter(filter_to_exons, list(exonIds))

    def filterToProtein(self, proteinId):
        return self.filterToProteins([proteinId])

    def filterToProteins(self, proteinIds):
        from adam_spark.operators.filters import filter_to_proteins

        return self._filter(filter_to_proteins, list(proteinIds))

    def filterToParent(self, parentId):
        return self.filterToParents([parentId])

    def filterToParents(self, parentIds):
        from adam_spark.operators.filters import filter_to_parent

        return self._filter(filter_to_parent, list(parentIds))

    def filterByScore(self, minimumScore):
        from adam_spark.operators.filters import filter_by_score

        return self._filter(filter_by_score, minimumScore)

    def filterByAttribute(self, key, value):
        from adam_spark.operators.filters import filter_by_attribute

        return self._filter(filter_by_attribute, key, value)

    def filterToReferenceName(self, referenceName):
        from adam_spark.operators.filters import filter_to_reference_name

        return self._filter(filter_to_reference_name, referenceName)

    def sortByReference(self, ascending=True, numPartitions=None):
        from adam_spark.operators.sorts import sort_features_by_reference

        return _wrap(self._gf.transform_df(
            lambda df: sort_features_by_reference(
                df, ascending=ascending, num_partitions=numPartitions
            )))

    def toCoverage(self):
        from adam_spark.operators.conversions import features_to_coverage

        out = GenomicFrame(features_to_coverage(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "coverage"
        return CoverageDataset(out)

    def saveAsUcscBed(
        self, filePath, asSingleFile=False, minimumScore=0.0,
        maximumScore=1000.0, missingValue=0,
    ):
        """FeatureDataset.saveAsUcscBed (:251-270)."""
        from adam_spark.sources.features_io import save_ucsc_bed

        save_ucsc_bed(
            self._gf, filePath,
            minimum_score=minimumScore, maximum_score=maximumScore,
            missing_value=missingValue, single_file=asSingleFile,
        )


class FragmentDataset(GenomicDataset):
    def toAlignments(self):
        from adam_spark.operators.conversions import fragments_to_alignments

        out = GenomicFrame(fragments_to_alignments(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "alignment"
        return AlignmentDataset(out)

    def markDuplicates(self):
        from adam_spark.operators.mark_duplicates import mark_duplicate_fragments

        lib = {g.id: (g.library or g.id) for g in self._gf.meta.read_groups}
        return FragmentDataset(
            self._gf.transform_df(lambda df: mark_duplicate_fragments(df, lib))
        )


def _rekind(gf: GenomicFrame, df: DataFrame, kind: str) -> GenomicFrame:
    out = GenomicFrame(df, gf.meta.copy())
    out.meta.kind = kind
    return out


class ReadDataset(GenomicDataset):
    """Reference ds/read/ReadDataset.scala — unaligned READ-schema
    records with conversions into the other sequence-shaped sets."""

    def toAlignments(self):
        from adam_spark.operators.conversions import reads_to_alignments

        return AlignmentDataset(
            _rekind(self._gf, reads_to_alignments(self._gf.df), "alignment")
        )

    def toSequences(self):
        from adam_spark.operators.conversions import reads_to_sequences

        return SequenceDataset(
            _rekind(self._gf, reads_to_sequences(self._gf.df), "sequence")
        )

    def toSlices(self):
        from adam_spark.operators.conversions import reads_to_slices

        return SliceDataset(_rekind(self._gf, reads_to_slices(self._gf.df), "slice"))

    def saveAsFastq(self, filePath, asSingleFile=False, disableFastConcat=False):
        from adam_spark.sources.fastq import save_reads_fastq

        save_reads_fastq(self._gf, filePath, single_file=asSingleFile)

    def save(self, filePath, asSingleFile=False, **kw):
        # .fq/.fastq → FASTQ, else Parquet (ReadDataset.save:365-376)
        if filePath.endswith(".fq") or filePath.endswith(".fastq"):
            self.saveAsFastq(filePath, asSingleFile=asSingleFile)
        else:
            self._gf.save(filePath, **kw)


class SequenceDataset(GenomicDataset):
    def toReads(self):
        from adam_spark.operators.conversions import sequences_to_reads

        return ReadDataset(_rekind(self._gf, sequences_to_reads(self._gf.df), "read"))

    def toSlices(self):
        from adam_spark.operators.conversions import sequences_to_slices

        return SliceDataset(
            _rekind(self._gf, sequences_to_slices(self._gf.df), "slice")
        )

    def slice(self, arg):
        """slice(maximumLength) chunks every sequence; slice(region) /
        slice([regions]) clips to overlapping query regions
        (SequenceDataset.scala:306-408 overloads)."""
        from adam_spark.operators.conversions import (
            slice_sequences,
            slice_sequences_by_regions,
        )

        if isinstance(arg, int):
            out = slice_sequences(self._gf.df, arg)
        else:
            regions = [arg] if isinstance(arg, tuple) else list(arg)
            out = slice_sequences_by_regions(self._gf.df, regions)
        return SliceDataset(_rekind(self._gf, out, "slice"))

    def saveAsFasta(self, filePath, lineWidth=60, asSingleFile=False,
                    disableFastConcat=False):
        from adam_spark.sources.fasta import save_fasta

        save_fasta(self._gf, filePath, line_width=lineWidth, single_file=asSingleFile)


class SliceDataset(GenomicDataset):
    def flankAdjacentFragments(self, flankLength):
        from adam_spark.operators.slices import flank_adjacent_slices

        return SliceDataset(
            self._gf.transform_df(lambda df: flank_adjacent_slices(df, flankLength))
        )

    def countKmers(self, kmerLength):
        return self._gf.count_kmers(kmerLength)

    def countKmersAsDataset(self, kmerLength):
        return self.countKmers(kmerLength)

    def toReads(self):
        from adam_spark.operators.conversions import slices_to_reads

        return ReadDataset(_rekind(self._gf, slices_to_reads(self._gf.df), "read"))

    def toSequences(self):
        from adam_spark.operators.conversions import slices_to_sequences

        return SequenceDataset(
            _rekind(self._gf, slices_to_sequences(self._gf.df), "sequence")
        )

    def merge(self):
        from adam_spark.operators.conversions import merge_slices

        return SliceDataset(
            self._gf.transform_df(lambda df: merge_slices(df))
        )


def _vcf_line_type(lineType) -> str:
    """Python primitive → VCF header Type token (ds.py:600-626)."""
    if lineType is str:
        return "String"
    if lineType is int:
        return "Integer"
    if lineType is float:
        return "Float"
    if lineType is chr:
        return "Character"
    raise ValueError(f"Invalid VCF header line type {lineType!r}")


class _VCFSupportingMixin:
    """camelCase VCF header-line surface (VCFSupportingGenomicDataset,
    GenomicDataset.scala:3497-3757; Python mirror ds.py:628-848):
    metadata-only mutations, no data movement."""

    def _with_meta(self, meta):
        out = type(self)(GenomicFrame(self._gf.df, meta))
        return out

    def addFilterHeaderLine(self, name, description):
        return self._with_meta(self._gf.meta.add_filter_header_line(name, description))

    def addScalarFormatHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_scalar_format_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addFixedArrayFormatHeaderLine(self, name, count, description, lineType):
        return self._with_meta(
            self._gf.meta.add_fixed_array_format_header_line(
                name, count, description, _vcf_line_type(lineType)
            )
        )

    def addGenotypeArrayFormatHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_genotype_array_format_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addAlternateAlleleArrayFormatHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_alternate_allele_array_format_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addAllAlleleArrayFormatHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_all_alleles_array_format_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addScalarInfoHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_scalar_info_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addFixedArrayInfoHeaderLine(self, name, count, description, lineType):
        return self._with_meta(
            self._gf.meta.add_fixed_array_info_header_line(
                name, count, description, _vcf_line_type(lineType)
            )
        )

    def addAlternateAlleleArrayInfoHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_alternate_allele_array_info_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )

    def addAllAlleleArrayInfoHeaderLine(self, name, description, lineType):
        return self._with_meta(
            self._gf.meta.add_all_alleles_array_info_header_line(
                name, description, _vcf_line_type(lineType)
            )
        )


class VariantDataset(_VCFSupportingMixin, GenomicDataset):
    # --- domain filters (VariantDataset.scala filterX family) ------------
    def _filter(self, fn, *args):
        return _wrap(self._gf.transform_df(lambda df: fn(df, *args)))

    def filterToFiltersPassed(self):
        from adam_spark.operators.filters import filter_to_filters_passed

        return self._filter(filter_to_filters_passed)

    def filterByQuality(self, minimumQuality):
        from adam_spark.operators.filters import filter_by_quality

        return self._filter(filter_by_quality, minimumQuality)

    def filterByReadDepth(self, minimumReadDepth):
        from adam_spark.operators.filters import filter_by_read_depth

        return self._filter(filter_by_read_depth, minimumReadDepth)

    def filterByReferenceReadDepth(self, minimumReferenceReadDepth):
        from adam_spark.operators.filters import filter_by_reference_read_depth

        return self._filter(filter_by_reference_read_depth, minimumReferenceReadDepth)

    def filterSingleNucleotideVariants(self):
        from adam_spark.operators.filters import filter_single_nucleotide_variants

        return self._filter(filter_single_nucleotide_variants)

    def filterToSingleNucleotideVariants(self):
        from adam_spark.operators.filters import filter_to_single_nucleotide_variants

        return self._filter(filter_to_single_nucleotide_variants)

    def filterMultipleNucleotideVariants(self):
        from adam_spark.operators.filters import filter_multiple_nucleotide_variants

        return self._filter(filter_multiple_nucleotide_variants)

    def filterToMultipleNucleotideVariants(self):
        from adam_spark.operators.filters import filter_to_multiple_nucleotide_variants

        return self._filter(filter_to_multiple_nucleotide_variants)

    def filterIndels(self):
        from adam_spark.operators.filters import filter_indels

        return self._filter(filter_indels)

    def filterToIndels(self):
        from adam_spark.operators.filters import filter_to_indels

        return self._filter(filter_to_indels)

    def filterToReferenceName(self, referenceName):
        from adam_spark.operators.filters import filter_to_reference_name

        return self._filter(filter_to_reference_name, referenceName)

    def saveVcfHeaders(self, filePath):
        from adam_spark.sources.vcf import save_vcf_headers

        save_vcf_headers(self._gf, filePath)

    def toVariantContexts(self):
        from adam_spark.operators.conversions import variants_to_variant_contexts

        out = GenomicFrame(variants_to_variant_contexts(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "variant_context"
        return VariantContextDataset(out)

    def saveAsParquet(self, filePath):
        self._gf.save(filePath)


class GenotypeDataset(_VCFSupportingMixin, GenomicDataset):
    # --- domain filters (GenotypeDataset.scala filterX family) -----------
    def _filter(self, fn, *args):
        return _wrap(self._gf.transform_df(lambda df: fn(df, *args)))

    def filterToFiltersPassed(self):
        # genotype rows gate on variantCallingAnnotations.filtersPassed
        # (GenotypeDataset.scala:266-268)
        return _wrap(self._gf.transform_df(
            lambda df: df.where(df["variantCallingAnnotations.filtersPassed"])))

    def filterByQuality(self, minimumQuality):
        from adam_spark.operators.filters import filter_by_genotype_quality

        return self._filter(filter_by_genotype_quality, minimumQuality)

    def filterByReadDepth(self, minimumReadDepth):
        from adam_spark.operators.filters import filter_by_read_depth

        return self._filter(filter_by_read_depth, minimumReadDepth)

    def filterByAlternateReadDepth(self, minimumAlternateReadDepth):
        from adam_spark.operators.filters import filter_by_alternate_read_depth

        return self._filter(filter_by_alternate_read_depth, minimumAlternateReadDepth)

    def filterByReferenceReadDepth(self, minimumReferenceReadDepth):
        from adam_spark.operators.filters import filter_by_reference_read_depth

        return self._filter(filter_by_reference_read_depth, minimumReferenceReadDepth)

    def filterNoCalls(self):
        from adam_spark.operators.filters import filter_no_calls

        return self._filter(filter_no_calls)

    def filterToSample(self, sampleId):
        return self.filterToSamples([sampleId])

    def filterToSamples(self, sampleIds):
        from adam_spark.operators.filters import filter_to_samples

        return _wrap(self._gf.transform_df(
            lambda df: filter_to_samples(df, list(sampleIds), col="sampleId")))

    def filterToReferenceName(self, referenceName):
        from adam_spark.operators.filters import filter_to_reference_name

        return self._filter(filter_to_reference_name, referenceName)

    def copyVariantEndToAttribute(self):
        from adam_spark.operators.conversions import copy_variant_end_to_attribute

        return _wrap(self._gf.transform_df(copy_variant_end_to_attribute))

    def saveVcfHeaders(self, filePath):
        from adam_spark.sources.vcf import save_vcf_headers

        save_vcf_headers(self._gf, filePath)

    def toVariants(self, dedupe=False):
        from adam_spark.operators.conversions import genotypes_to_variants

        out = GenomicFrame(
            genotypes_to_variants(self._gf.df, dedupe=dedupe), self._gf.meta.copy()
        )
        out.meta.kind = "variant"
        return VariantDataset(out)

    def toVariantContexts(self):
        from adam_spark.operators.conversions import genotypes_to_variant_contexts

        out = GenomicFrame(genotypes_to_variant_contexts(self._gf.df), self._gf.meta.copy())
        out.meta.kind = "variant_context"
        return VariantContextDataset(out)

    def saveAsParquet(self, filePath):
        self._gf.save(filePath)


class VariantContextDataset(_VCFSupportingMixin, GenomicDataset):
    def saveAsVcf(self, filePath, asSingleFile=True, stringency=None):
        from adam_spark.sources.vcf import save_vcf

        save_vcf(self._gf, filePath, single_file=asSingleFile)

    def saveVcfHeaders(self, filePath):
        from adam_spark.sources.vcf import save_vcf_headers

        save_vcf_headers(self._gf, filePath)


_KIND_TO_CLASS = {
    "read": ReadDataset,
    "alignment": AlignmentDataset,
    "coverage": CoverageDataset,
    "feature": FeatureDataset,
    "fragment": FragmentDataset,
    "sequence": SequenceDataset,
    "slice": SliceDataset,
    "variant": VariantDataset,
    "genotype": GenotypeDataset,
    "variant_context": VariantContextDataset,
}


class ADAMContext:
    """Reference adamContext.py:48 — load* entry points, camelCase."""

    def __init__(self, ss: SparkSession):
        self._spark = ss

    def loadAlignments(self, filePath, stringency=None):
        return AlignmentDataset(_ctx.load_alignments(self._spark, filePath))

    def loadIndexedBam(self, filePath, viewRegions, stringency=None):
        from adam_spark.sources.bam import load_indexed_bam

        return AlignmentDataset(load_indexed_bam(self._spark, filePath, list(viewRegions)))

    def loadIndexedVcf(self, filePath, viewRegions, stringency=None):
        # Scala-API surface (ADAMContext.scala:2760-2776); the reference
        # python wrapper never exposed it — provided here because the
        # tabix path exists natively (sources/vcf.load_indexed_vcf)
        from adam_spark.sources.vcf import load_indexed_vcf

        return VariantContextDataset(
            load_indexed_vcf(self._spark, filePath, list(viewRegions))
        )

    def loadIndexedBcf(self, filePath, viewRegions, stringency=None):
        # beyond-reference extension: .csi-indexed BCF (the reference
        # has no working BCF path at all, htsjdk #507)
        from adam_spark.sources.bcf import load_indexed_bcf

        return VariantContextDataset(
            load_indexed_bcf(self._spark, filePath, list(viewRegions))
        )

    def loadCoverage(self, filePath, stringency=None):
        return CoverageDataset(_ctx.load_coverage(self._spark, filePath))

    def loadFragments(self, filePath, stringency=None):
        return FragmentDataset(_ctx.load_fragments(self._spark, filePath))

    def loadFeatures(self, filePath, stringency=None):
        return FeatureDataset(_ctx.load_features(self._spark, filePath))

    def loadGenotypes(self, filePath, stringency=None):
        return GenotypeDataset(_ctx.load_genotypes(self._spark, filePath))

    def loadVariants(self, filePath, stringency=None):
        return VariantDataset(_ctx.load_variants(self._spark, filePath))

    def loadReads(self, filePath):
        return ReadDataset(_ctx.load_reads(self._spark, filePath))

    def loadDnaSequences(self, filePath):
        return SequenceDataset(_ctx.load_sequences(self._spark, filePath, alphabet="DNA"))

    def loadProteinSequences(self, filePath):
        return SequenceDataset(_ctx.load_sequences(self._spark, filePath, alphabet="PROTEIN"))

    def loadRnaSequences(self, filePath):
        return SequenceDataset(_ctx.load_sequences(self._spark, filePath, alphabet="RNA"))

    def loadSlices(self, filePath, maximumLength):
        return SliceDataset(_ctx.load_slices(self._spark, filePath, maximum_length=maximumLength))

    def loadReferenceFile(self, filePath):
        return _ctx.load_reference_file(filePath)
