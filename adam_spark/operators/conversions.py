"""Type-conversion operators between dataset kinds.

Complete inventory per SURVEY.md §2.5 "Type-conversion operators"
(reference file:line cited per function). All are select / explode /
groupBy+collect_list reshapes — pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adam_spark import schemas


# --- alignments ↔ fragments ----------------------------------------------
def alignments_to_fragments(alignments: DataFrame) -> DataFrame:
    """groupBy(readName) → nested Fragment
    (reference: AlignmentDataset.toFragments :473, SingleReadBucket.scala:64-193)."""
    aln_struct = F.struct(*[F.col(f.name) for f in schemas.ALIGNMENT.fields])
    return (
        alignments.groupBy(F.col("readName").alias("name"))
        .agg(
            # insert size comes from the PRIMARY MAPPED reads only
            # (SingleReadBucket.toFragment:148-153 reads it off
            # primaryMapped; the chimeric-supplement suite vector pins
            # that secondary/supplementary insert sizes are ignored) —
            # max() over them replaces the reference's order-dependent
            # .head with a deterministic pick
            F.max(
                F.when(
                    F.coalesce(F.col("readMapped"), F.lit(False))
                    & F.coalesce(F.col("primaryAlignment"), F.lit(False)),
                    F.col("insertSize"),
                )
            ).alias("insertSize"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("readInFragment").alias("_k"), aln_struct.alias("a"))
                ),
                # comparator on the key only: the alignment struct holds a
                # map column, which Spark cannot order natively
                lambda x, y: F.when(x["_k"] < y["_k"], -1)
                .when(x["_k"] > y["_k"], 1)
                .otherwise(0),
            ).alias("__sorted"),
        )
        .select(
            "name",
            "insertSize",
            F.transform(F.col("__sorted"), lambda s: s["a"]).alias("alignments"),
        )
    )


def fragments_to_alignments(fragments: DataFrame) -> DataFrame:
    """explode(alignments)
    (reference: FragmentDataset.toAlignments :351-366)."""
    return fragments.select(F.explode("alignments").alias("a")).select("a.*")


# --- alignments → reads ---------------------------------------------------
def alignments_to_reads(alignments: DataFrame) -> DataFrame:
    """Project the unaligned-read fields
    (reference: AlignmentDataset.toReads :485)."""
    return alignments.select(
        F.col("readName").alias("name"),
        F.lit(None).cast("string").alias("description"),
        F.lit("DNA").alias("alphabet"),
        "sequence",
        F.length("sequence").cast("long").alias("length"),
        "qualityScores",
        F.lit(None).cast("string").alias("qualityScoreVariant"),
        F.col("readGroupSampleId").alias("sampleId"),
        "attributes",
    )


# --- reads ↔ sequences / slices / alignments ------------------------------
def reads_to_sequences(reads: DataFrame) -> DataFrame:
    """(reference: ReadDataset.toSequences :315)."""
    return reads.select(
        "name", "description", "alphabet", "sequence", "length", "sampleId", "attributes"
    )


def reads_to_alignments(reads: DataFrame) -> DataFrame:
    """Unaligned-read projection into the alignment schema — only
    name/sequence/qualityScores carry over
    (reference: ReadDataset.toAlignments :296-308)."""
    from adam_spark import schemas

    return schemas.conform(
        reads.select(
            F.col("name").alias("readName"),
            "sequence",
            "qualityScores",
        ),
        schemas.ALIGNMENT,
    )


def reads_to_slices(reads: DataFrame) -> DataFrame:
    """Whole-read slices spanning [0, length), INDEPENDENT strand
    (reference: ReadDataset.toSlices :336-354)."""
    return reads.select(
        "name",
        "description",
        "alphabet",
        "sequence",
        F.lit(0).cast("long").alias("start"),
        F.col("length").alias("end"),
        F.lit("INDEPENDENT").alias("strand"),
        "length",
        F.col("length").alias("totalLength"),
        F.lit(0).alias("index"),
        F.lit(1).alias("slices"),
        "sampleId",
        "attributes",
    )


def sequences_to_reads(sequences: DataFrame) -> DataFrame:
    """(reference: SequenceDataset.toReads :410)."""
    return sequences.select(
        "name",
        "description",
        "alphabet",
        "sequence",
        "length",
        F.lit(None).cast("string").alias("qualityScores"),
        F.lit(None).cast("string").alias("qualityScoreVariant"),
        "sampleId",
        "attributes",
    )


def sequences_to_slices(sequences: DataFrame) -> DataFrame:
    """Whole-sequence slices (index 0 of 1)
    (reference: SequenceDataset.toSlices :433)."""
    return sequences.select(
        "name",
        "description",
        "alphabet",
        "sequence",
        F.lit(0).cast("long").alias("start"),
        F.col("length").alias("end"),
        F.lit("INDEPENDENT").alias("strand"),
        "length",
        F.col("length").alias("totalLength"),
        F.lit(0).alias("index"),
        F.lit(1).alias("slices"),
        "sampleId",
        "attributes",
    )


def slice_sequences_by_regions(
    sequences: DataFrame, regions: list[tuple[str, int, int]]
) -> DataFrame:
    """Clip each sequence to the query regions that overlap it
    (reference: SequenceDataset.slice(region[s]) :347-408): a region
    matches a sequence by NAME, end clamps to the sequence length
    (regions may be open-ended), and non-overlapping pairs drop. The
    region list is a driver-side literal array — one narrow
    explode+filter, no join."""
    regs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rn"),
                F.lit(int(s)).cast("long").alias("rs"),
                F.lit(int(e)).cast("long").alias("re"),
            )
            for n, s, e in regions
        ]
    )
    ex = sequences.select("*", F.explode(regs).alias("__r")).where(
        (F.col("__r.rn") == F.col("name"))
        & (F.col("__r.rs") < F.col("length"))
        & (F.col("__r.re") > 0)
    )
    s = F.col("__r.rs")
    e = F.least(F.col("length"), F.col("__r.re"))
    return ex.select(
        "name",
        "description",
        "alphabet",
        F.col("sequence").substr(s + 1, e - s).alias("sequence"),
        s.alias("start"),
        e.alias("end"),
        F.lit("INDEPENDENT").alias("strand"),
        (e - s).alias("length"),
        F.col("length").alias("totalLength"),
        F.lit(None).cast("int").alias("index"),
        F.lit(None).cast("int").alias("slices"),
        "sampleId",
        "attributes",
    )


def slices_to_sequences(slices: DataFrame) -> DataFrame:
    """Each slice becomes its own SEQUENCE record
    (reference: SliceDataset.toSequences)."""
    return slices.select(
        "name", "description", "alphabet", "sequence",
        F.col("length"), "sampleId", "attributes",
    )


def slices_to_reads(slices: DataFrame) -> DataFrame:
    """(reference: SliceDataset.toReads)."""
    return slices.select(
        "name",
        "description",
        "alphabet",
        "sequence",
        "length",
        F.lit(None).cast("string").alias("qualityScores"),
        F.lit(None).cast("string").alias("qualityScoreVariant"),
        "sampleId",
        "attributes",
    )


def slice_sequences(sequences: DataFrame, maximum_length: int) -> DataFrame:
    """Window sequences into fixed-size slices
    (reference: SequenceDataset.slice :306-407). posexplode over window
    starts + substring — no UDF."""
    step = maximum_length
    base = sequences.select(
        "name",
        "description",
        "alphabet",
        "sampleId",
        "attributes",
        F.col("length").alias("totalLength"),
        F.col("sequence").alias("__seq"),
    )
    slices = base.select(
        "name",
        "description",
        "alphabet",
        "sampleId",
        "attributes",
        "totalLength",
        "__seq",
        F.posexplode(
            F.expr(f"transform(sequence(0, cast(greatest(ceil(length(__seq) / {step}) - 1, 0) as int)), i -> i * {step})")
        ).alias("index", "start"),
    )
    return slices.select(
        "name",
        "description",
        "alphabet",
        F.expr(f"substring(__seq, start + 1, {step})").alias("sequence"),
        F.col("start").cast("long"),
        F.least(F.col("start") + step, F.col("totalLength")).cast("long").alias("end"),
        F.lit("INDEPENDENT").alias("strand"),
        (F.least(F.col("start") + step, F.col("totalLength")) - F.col("start"))
        .cast("long")
        .alias("length"),
        "totalLength",
        F.col("index").cast("int"),
        F.expr(f"cast(ceil(totalLength / {step}) as int)").alias("slices"),
        "sampleId",
        "attributes",
    )


def merge_slices(slices: DataFrame) -> DataFrame:
    """Stitch adjacent slices back into sequences
    (reference: SliceDataset.merge :291). groupBy(name) +
    order-preserving concat via sort_array over (start, sequence)."""
    return (
        slices.groupBy("name")
        .agg(
            F.first("description", ignorenulls=True).alias("description"),
            F.first("alphabet", ignorenulls=True).alias("alphabet"),
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("start"), F.col("sequence").alias("s")))
                    ),
                    lambda x: x["s"],
                ),
            ).alias("sequence"),
            F.max("totalLength").alias("length"),
            F.first("sampleId", ignorenulls=True).alias("sampleId"),
            F.first("attributes", ignorenulls=True).alias("attributes"),
        )
        .select(
            "name", "description", "alphabet", "sequence", "length", "sampleId", "attributes"
        )
    )


def slices_to_contig_reads(slices: DataFrame) -> DataFrame:
    """Stitch CONTIGUOUS same-name slices into aligned read spans
    (reference converters/FragmentConverter.scala convertRdd +
    FragmentCollector.merge): runs where one slice's end equals the
    next slice's start concatenate into a single read carrying
    (referenceName, start, end, sequence); gaps break the run. Distinct
    from :func:`merge_slices`, which concatenates unconditionally into
    SEQUENCES (SliceDataset.merge).

    Scale shape: one window pass keyed by name to number the contiguous
    runs, then a (name, run) groupBy whose shuffle reuses the window's
    hash partitioning on name."""
    from pyspark.sql import Window

    w = Window.partitionBy("name").orderBy("start", "end")
    brk = F.when(F.col("start") == F.lag("end").over(w), 0).otherwise(1)
    runs = slices.select(
        "name", "start", "end", "sequence", F.sum(brk).over(w).alias("__run")
    )
    return (
        runs.groupBy("name", "__run")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("start"), F.col("sequence").alias("s"))
                        )
                    ),
                    lambda x: x["s"],
                ),
            ).alias("sequence"),
        )
        .select(
            F.col("name").alias("referenceName"), "start", "end", "sequence"
        )
    )


# --- features ↔ coverage --------------------------------------------------
def features_to_coverage(features: DataFrame) -> DataFrame:
    """(reference: FeatureDataset.toCoverage :302/:351-358 — score →
    count). Invalid rows fail with the reference's requirement messages
    (models/Coverage.scala:48-53; CoverageSuite error vectors)."""

    def _raise(msg):
        return F.raise_error(F.lit("requirement failed: " + msg)).cast("double")

    count = (
        F.when(
            F.col("referenceName").isNull() | (F.length("referenceName") == 0),
            _raise("Features must have reference name to convert to Coverage"),
        )
        .when(
            F.col("start").isNull() | F.col("end").isNull(),
            _raise("Features must have valid position data to convert to Coverage"),
        )
        .when(
            F.col("score").isNull(),
            _raise("Features must have valid score to convert to Coverage"),
        )
        .otherwise(F.col("score").cast("double"))
    )
    return features.select(
        "referenceName",
        "start",
        "end",
        count.alias("count"),
        F.col("sampleId").alias("optSampleId")
        if "sampleId" in features.columns
        else F.lit(None).cast("string").alias("optSampleId"),
    )


def coverage_to_features(coverage: DataFrame) -> DataFrame:
    """(reference: CoverageDataset.toFeatures :355)."""
    out = coverage.select(
        F.lit(None).cast("string").alias("featureId"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("featureType"),
        "referenceName",
        "start",
        "end",
        F.lit(None).cast("string").alias("strand"),
        F.lit(None).cast("int").alias("phase"),
        F.lit(None).cast("int").alias("frame"),
        F.col("count").cast("double").alias("score"),
        F.lit(None).cast("string").alias("geneId"),
        F.lit(None).cast("string").alias("transcriptId"),
        F.lit(None).cast("string").alias("exonId"),
        F.lit(None).cast("string").alias("proteinId"),
        F.lit(None).cast("array<string>").alias("parentIds"),
        F.lit(None).cast("array<string>").alias("dbxrefs"),
        F.lit(None).cast("array<string>").alias("ontologyTerms"),
        F.lit(None).cast("boolean").alias("circular"),
        F.lit(None).cast("map<string,string>").alias("attributes"),
    )
    return out


# --- genotypes → variants → variant contexts ------------------------------
_SITE_COLS = ["referenceName", "start", "end", "referenceAllele", "alternateAllele"]


def genotypes_to_variants(genotypes: DataFrame, dedupe: bool = True) -> DataFrame:
    """Project the nested variant; optionally dropDuplicates on the five
    site columns (reference: GenotypeDataset.toVariants :408-442)."""
    v = genotypes.select("variant.*")
    if dedupe:
        v = v.dropDuplicates(_SITE_COLS)
    return v


def genotypes_to_variant_contexts(genotypes: DataFrame) -> DataFrame:
    """Square off per-sample rows into site rows
    (reference: GenotypeDataset.toVariantContexts :386-398)."""
    g = F.struct(*[F.col(f.name) for f in schemas.GENOTYPE.fields])
    return (
        genotypes.groupBy(
            "referenceName", "start", "end", F.col("variant").alias("variant")
        )
        .agg(F.collect_list(g).alias("genotypes"))
        .select("referenceName", "start", "end", "variant", "genotypes")
    )


def variants_to_variant_contexts(variants: DataFrame) -> DataFrame:
    """(reference: VariantDataset.toVariantContexts :349)."""
    v = F.struct(*[F.col(f.name) for f in schemas.VARIANT.fields])
    return variants.select(
        "referenceName",
        "start",
        "end",
        v.alias("variant"),
        F.lit(None).cast(schemas.VARIANT_CONTEXT["genotypes"].dataType).alias("genotypes"),
    )


def copy_variant_end_to_attribute(genotypes: DataFrame) -> DataFrame:
    """Copy the genotype's END into ``variant.annotation.attributes``
    as the VCF INFO field "END" (GenotypeDataset.copyVariantEndToAttribute,
    GenotypeDataset.scala:449-463) — the step before a gVCF save so
    reference blocks re-emit their span. Mirrors the reference's
    getOrElse(new ...) semantics: a null variant/annotation is replaced
    by an empty struct so the attribute always lands. Pure narrow map."""
    v_t = genotypes.schema["variant"].dataType
    a_t = v_t["annotation"].dataType

    def _empty(struct_t) -> Column:
        return F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in struct_t.fields]
        )

    anno = F.coalesce(F.col("variant.annotation"), _empty(a_t))
    attrs = F.coalesce(
        anno["attributes"], F.expr("cast(map() as map<string,string>)")
    )
    new_attrs = F.map_concat(
        F.map_filter(attrs, lambda k, _: k != "END"),
        F.create_map(F.lit("END"), F.col("end").cast("string")),
    )
    new_variant = F.coalesce(F.col("variant"), _empty(v_t)).withField(
        "annotation", anno.withField("attributes", new_attrs)
    )
    return genotypes.withColumn("variant", new_variant)


def variant_contexts_to_genotypes(vcs: DataFrame) -> DataFrame:
    """(reference: VariantContextDataset.toGenotypes :325)."""
    return vcs.select(F.explode("genotypes").alias("g")).select("g.*")


def variant_contexts_to_variants(vcs: DataFrame) -> DataFrame:
    """(reference: VariantContextDataset.toVariants :336)."""
    return vcs.select("variant.*")


def reassemble_read_pairs(
    first_of_pair: DataFrame, second_of_pair: DataFrame
) -> DataFrame:
    """Re-pair two unpaired read sets by readName
    (reference: AlignmentDataset.reassembleReadPairs:1668-1750, used to
    re-join r1/r2 after a pipe() stage split them). Inner join on name;
    readInFragment forced to 0/1 and readPaired set on both sides."""
    from pyspark.sql import functions as F

    def _side(df: DataFrame, rif: int) -> DataFrame:
        return df.withColumn("readInFragment", F.lit(rif)).withColumn(
            "readPaired", F.lit(True)
        )

    r1 = _side(first_of_pair, 0)
    r2 = _side(second_of_pair, 1)
    names = r1.select("readName").intersect(r2.select("readName"))
    return (
        r1.join(names, "readName", "inner")
        .unionByName(r2.join(names, "readName", "inner"))
    )
