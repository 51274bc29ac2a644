"""camelCase compat surface = the reference's Python API
(adam-python/bdgenomics/adam/adamContext.py, ds.py): user code written
against the reference runs unchanged modulo the import line."""

import pytest

from adam_spark.compat import (
    ADAMContext,
    AlignmentDataset,
    CoverageDataset,
    FragmentDataset,
)

SAM = """@HD\tVN:1.6\tSO:coordinate
@SQ\tSN:chr1\tLN:100000
@RG\tID:rg1\tSM:s1\tLB:lib1
a\t0\tchr1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1
b\t0\tchr1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tBBBBBBBBBB\tRG:Z:rg1
c\t0\tchr1\t500\t60\t10M\t*\t0\t0\tTTTTGGGGCC\tIIIIIIIIII\tRG:Z:rg1
"""


@pytest.fixture()
def ac(spark):
    return ADAMContext(spark)


@pytest.fixture()
def sam_path(tmp_path):
    p = tmp_path / "c.sam"
    p.write_text(SAM)
    return str(p)


def test_alignment_pipeline_camel_case(ac, sam_path, tmp_path):
    reads = ac.loadAlignments(sam_path)
    assert isinstance(reads, AlignmentDataset)
    marked = reads.markDuplicates().sortByReferencePosition()
    rows = {r["readName"]: r["duplicateRead"] for r in marked.toDF().collect()}
    assert rows == {"a": False, "b": True, "c": False}
    out = str(tmp_path / "out.sam")
    marked.saveAsSam(out)
    assert ac.loadAlignments(out).toDF().count() == 3
    # terminal ops
    fs = reads.flagStat()
    assert fs.collect()[0]["total"] == 3
    km = reads.countKmers(4)
    assert km.count() > 0


def test_fragments_and_coverage(ac, sam_path):
    frags = ac.loadAlignments(sam_path).toFragments()
    assert isinstance(frags, FragmentDataset)
    assert frags.toDF().count() == 3
    back = frags.toAlignments()
    assert back.toDF().count() == 3
    cov = ac.loadAlignments(sam_path).toCoverage()
    assert isinstance(cov, CoverageDataset)
    collapsed = cov.collapse()
    assert collapsed.toDF().count() > 0
    binned = cov.aggregatedCoverage(bpPerBin=250)
    assert binned.toDF().count() > 0


def test_join_variants_camel_case(ac, sam_path, tmp_path):
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t90\t200\tregionA\nchr1\t400\t600\tregionB\n")
    reads = ac.loadAlignments(sam_path)
    feats = ac.loadFeatures(str(bed))
    j = reads.shuffleRegionJoin(feats)
    assert j.toDF().count() == 3  # every read overlaps one region
    g = reads.shuffleRegionJoinAndGroupByLeft(feats)
    assert g.toDF().count() == 3
    lo = reads.leftOuterShuffleRegionJoin(feats)
    assert lo.toDF().count() == 3
    bj = reads.broadcastRegionJoin(feats, flankSize=5)
    assert bj.toDF().count() == 3
    # region filter
    assert reads.filterByOverlappingRegion(("chr1", 0, 200)).toDF().count() == 2


def test_vcf_compat(ac, spark, tmp_path):
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "chr1\t10\t.\tA\tG\t50\tPASS\tDP=3\tGT\t0/1\n"
        "chr1\t20\t.\tC\tT\t50\tPASS\tDP=4\tGT\t1/1\n"
    )
    gts = ac.loadGenotypes(str(vcf))
    assert gts.toDF().count() == 2
    vars_ = gts.toVariants(dedupe=True)
    assert vars_.toDF().count() == 2
    vcs = gts.toVariantContexts()
    out = str(tmp_path / "o.vcf")
    vcs.saveAsVcf(out)
    assert ac.loadGenotypes(out).toDF().count() == 2


def test_vcf_header_line_surface(ac, spark, tmp_path):
    """camelCase add*HeaderLine family (ds.py:628-848): metadata-only
    mutations that show up in the saved VCF header."""
    vcf = tmp_path / "h.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "chr1\t10\t.\tA\tG\t50\tPASS\tDP=3\tGT\t0/1\n"
    )
    gts = ac.loadGenotypes(str(vcf))
    gts2 = (
        gts.addFilterHeaderLine("LOWQ", "low quality")
        .addScalarFormatHeaderLine("XF", "a float fmt", float)
        .addFixedArrayFormatHeaderLine("XA", 2, "two ints", int)
        .addGenotypeArrayFormatHeaderLine("XG", "per genotype", float)
        .addAlternateAlleleArrayFormatHeaderLine("XAA", "per alt", str)
        .addAllAlleleArrayFormatHeaderLine("XR", "per allele", float)
        .addScalarInfoHeaderLine("YI", "an int info", int)
        .addFixedArrayInfoHeaderLine("YA", 3, "three strs", str)
        .addAlternateAlleleArrayInfoHeaderLine("YAA", "alt info", float)
        .addAllAlleleArrayInfoHeaderLine("YR", "allele info", chr)
    )
    # original untouched (immutable metadata mutation)
    assert len(gts2._gf.meta.header_lines) == len(gts._gf.meta.header_lines) + 10
    vcs = gts2.toVariantContexts()
    out = str(tmp_path / "withhdr.vcf")
    vcs.saveAsVcf(out)
    import glob

    part = glob.glob(out + "/part-*")[0]  # Spark text sink: directory
    hdr = [l for l in open(part) if l.startswith("##")]
    txt = "".join(hdr)
    assert '##FILTER=<ID=LOWQ,Description="low quality">' in txt
    assert "##FORMAT=<ID=XA,Number=2,Type=Integer" in txt
    assert "##FORMAT=<ID=XG,Number=G,Type=Float" in txt
    assert "##FORMAT=<ID=XR,Number=R,Type=Float" in txt
    assert "##INFO=<ID=YA,Number=3,Type=String" in txt
    assert "##INFO=<ID=YR,Number=R,Type=Character" in txt
    import pytest

    with pytest.raises(ValueError):
        gts.addScalarInfoHeaderLine("bad", "boom", dict)


def test_save_as_sam_string(ac, sam_path):
    reads = ac.loadAlignments(sam_path)
    txt = reads.saveAsSamString()
    lines = txt.rstrip("\n").split("\n")
    header = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    assert any(l.startswith("@SQ") for l in header)
    assert len(body) == reads.toDF().count()
    assert all(len(l.split("\t")) >= 11 for l in body)


# --- ReadDatasetSuite / SequenceDatasetSuite conversions --------------------
def _read_ds(spark):
    from adam_spark import schemas
    from adam_spark.compat import ReadDataset
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.core.metadata import GenomicMetadata

    rows = [
        ("name1", "description", "DNA", "actg", 4, "9999", None, "sampleId", None),
        ("name2", "description", "DNA", "actg", 4, "9999", None, "sampleId", None),
    ]
    sch = (
        "name string, description string, alphabet string, sequence string, "
        "length long, qualityScores string, qualityScoreVariant string, "
        "sampleId string, attributes map<string,string>"
    )
    df = schemas.conform(spark.createDataFrame(rows, sch), schemas.READ)
    return ReadDataset(GenomicFrame(df, GenomicMetadata(kind="read")))


def test_reads_to_alignments_vector(spark):
    """ReadDatasetSuite 'convert reads to alignments' (:156-170): only
    name/sequence/qualityScores carry over."""
    out = _read_ds(spark).toAlignments().toDF().orderBy("readName").collect()
    assert [(r["readName"], r["sequence"], r["qualityScores"]) for r in out] == [
        ("name1", "actg", "9999"),
        ("name2", "actg", "9999"),
    ]
    assert out[0]["readMapped"] is None and out[0]["start"] is None


def test_reads_to_sequences_vector(spark):
    """ReadDatasetSuite 'convert reads to sequences' (:172-192)."""
    out = _read_ds(spark).toSequences().toDF().orderBy("name").collect()
    for r in out:
        assert (r["description"], r["alphabet"], r["length"], r["sequence"]) == (
            "description", "DNA", 4, "actg",
        )
        assert r["sampleId"] == "sampleId"


def test_reads_to_slices_vector(spark):
    """ReadDatasetSuite 'convert reads to slices' (:194-221): slices
    span [0, length) on INDEPENDENT strand with totalLength = length."""
    out = _read_ds(spark).toSlices().toDF().orderBy("name").collect()
    for r in out:
        assert (r["start"], r["end"], r["strand"]) == (0, 4, "INDEPENDENT")
        assert (r["length"], r["totalLength"], r["sampleId"]) == (4, 4, "sampleId")


def test_read_save_fastq_dispatch(spark, tmp_path):
    """ReadDataset.save dispatches .fq to FASTQ with the description on
    the name line (ReadDataset.scala:365-407)."""
    import os

    out = str(tmp_path / "reads.fq")
    _read_ds(spark).save(out, asSingleFile=True)
    part = [f for f in sorted(os.listdir(out)) if f.startswith("part-")][0]
    lines = open(os.path.join(out, part)).read().splitlines()
    assert lines[0] == "@name1 description"
    assert lines[1:4] == ["actg", "+", "9999"]


def test_sequence_slice_read_cycle(spark):
    """SequenceDataset.toReads / toSlices / slice(maximumLength) +
    SliceDataset.toReads/toSequences compose and round-trip names."""
    seqs = _read_ds(spark).toSequences()
    assert {r["name"] for r in seqs.toReads().toDF().collect()} == {"name1", "name2"}
    sl = seqs.slice(2).toDF().orderBy("name", "start").collect()
    # 4-base sequences at maximumLength=2 → two slices each
    assert [(r["name"], r["start"], r["end"]) for r in sl if r["name"] == "name1"] == [
        ("name1", 0, 2), ("name1", 2, 4),
    ]
    back = seqs.toSlices().toSequences().toDF().orderBy("name").collect()
    assert [r["sequence"] for r in back] == ["actg", "actg"]


def test_sequence_slice_by_region_vectors(spark):
    """SequenceDatasetSuite 'slice sequences overlapping a
    smaller/larger region' + 'failing to overlap' (:309-350): region
    matches by name, end clamps to the sequence length, non-overlap
    drops."""
    seqs = _read_ds(spark).toSequences()
    sm = seqs.slice(("name1", 1, 3)).toDF().collect()
    assert len(sm) == 1
    r = sm[0]
    assert (r["sequence"], r["start"], r["end"]) == ("ct", 1, 3)
    assert (r["length"], r["totalLength"], r["strand"]) == (2, 4, "INDEPENDENT")
    lg = seqs.slice(("name1", 0, 99)).toDF().collect()
    assert len(lg) == 1 and lg[0]["sequence"] == "actg" and lg[0]["end"] == 4
    assert seqs.slice(("name1", 99, 101)).toDF().count() == 0
    # multiple regions: one per overlapping (sequence, region) pair
    multi = seqs.slice([("name1", 0, 2), ("name2", 2, 4)]).toDF().collect()
    assert sorted((r["name"], r["sequence"]) for r in multi) == [
        ("name1", "ac"), ("name2", "tg"),
    ]


def test_broadcast_against_family(ac, sam_path, tmp_path):
    """broadcast() + *RegionJoinAgainst ≡ the non-Against join called on
    the broadcast frame (GenomicDataset.scala:1228-1245: 'Against' only
    swaps which operand was collected)."""
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t90\t200\tregionA\nchr1\t400\t600\tregionB\n")
    reads = ac.loadAlignments(sam_path)
    feats = ac.loadFeatures(str(bed))
    bc = feats.broadcast()
    try:
        against = reads.broadcastRegionJoinAgainst(bc).toDF()
        direct = feats.broadcastRegionJoin(reads).toDF()
        assert sorted(against.columns) == sorted(direct.columns)
        key = [c for c in against.columns if not c.endswith("_r")]
        assert (
            sorted(map(tuple, against.select(*sorted(against.columns)).collect()))
            == sorted(map(tuple, direct.select(*sorted(against.columns)).collect()))
        )
        grouped = reads.broadcastRegionJoinAgainstAndGroupByRight(bc).toDF()
        assert grouped.count() == 3  # one row per read, hits grouped
        ro = reads.rightOuterBroadcastRegionJoinAgainst(bc).toDF()
        assert ro.count() == direct.count()  # every read overlaps a region
    finally:
        bc.unpersist()


def test_metadata_mutator_family(ac, sam_path, tmp_path):
    """addX/replaceX metadata families: id-deduped adds, wholesale
    replaces, and survival through a save round trip."""
    from adam_spark.core.metadata import ReadGroup, Reference, Sample

    reads = ac.loadAlignments(sam_path)
    # add a second contig + a duplicate of an existing one (deduped by name)
    r2 = reads.addReferences(
        [Reference(name="chr2", length=50000), Reference(name="chr1", length=1)]
    )
    names = [r.name for r in r2._gf.meta.references.references]
    assert names == ["chr1", "chr2"]
    assert r2._gf.meta.references["chr1"].length == 100000  # first wins
    # read groups: add dedupes on id, replace is wholesale
    g2 = reads.addReadGroup(ReadGroup(id="rg2", sampleId="s2"))
    assert [g.id for g in g2._gf.meta.read_groups] == ["rg1", "rg2"]
    g3 = g2.replaceReadGroups([ReadGroup(id="only", sampleId="s")])
    assert [g.id for g in g3._gf.meta.read_groups] == ["only"]
    # samples
    s2 = reads.addSample(Sample(id="sampleX"))
    assert any(s.id == "sampleX" for s in s2._gf.meta.samples)
    # header lines: add dedupes exact lines, replace is wholesale
    h = reads.addHeaderLines(["##x=1", "##x=1", "##y=2"])
    assert h._gf.meta.header_lines.count("##x=1") == 1
    h2 = h.replaceHeaderLines(["##z=3"])
    assert h2._gf.meta.header_lines == ["##z=3"]
    # added reference survives a SAM save (emitted as @SQ)
    out = str(tmp_path / "o.sam")
    r2.saveAsSam(out)
    reloaded = ac.loadAlignments(out)
    assert "chr2" in reloaded._gf.meta.references


def test_transform_dataset_aliases(ac, sam_path):
    reads = ac.loadAlignments(sam_path)
    t = reads.transformDataset(lambda df: df.where("start >= 0"))
    assert t.toDF().count() == 3


def test_domain_filter_bindings(ac, sam_path, tmp_path):
    """camelCase domain filters on the typed datasets delegate to
    operators/filters.py (Scala GenomicDataset filterX families)."""
    reads = ac.loadAlignments(sam_path)
    assert reads.filterByMappingQuality(1).toDF().count() == 3
    assert reads.filterUnalignedReads().toDF().count() == 3
    assert reads.filterToReadGroup("rg1").toDF().count() == 3
    assert reads.filterToReadGroups(["nope"]).toDF().count() == 0
    assert reads.filterToSample("s1").toDF().count() == 3
    assert reads.filterToReferenceName("chr1").toDF().count() == 3
    assert reads.filterToPrimaryAlignments().toDF().count() == 3

    gtf = tmp_path / "f.gtf"
    gtf.write_text(
        'chr1\tsrc\texon\t1\t100\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; '
        'exon_id "e1"; protein_id "p1";\n'
        'chr1\tsrc\tgene\t1\t200\t5\t+\t.\tgene_id "g2";\n'
    )
    feats = ac.loadFeatures(str(gtf))
    assert feats.filterToGene("g1").toDF().count() == 1
    assert feats.filterToGenes(["g1", "g2"]).toDF().count() == 2
    assert feats.filterToTranscript("t1").toDF().count() == 1
    assert feats.filterToExon("e1").toDF().count() == 1
    assert feats.filterToProtein("p1").toDF().count() == 1
    assert feats.filterToProteins(["nope"]).toDF().count() == 0
    assert feats.filterToFeatureType("exon").toDF().count() == 1
    assert feats.filterByScore(4.0).toDF().count() == 1


def test_variant_genotype_filter_bindings(ac, tmp_path):
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "chr1\t10\t.\tA\tG\t50\tPASS\tDP=3\tGT:DP:GQ\t0/1:7:40\n"
        "chr1\t20\t.\tC\tTA\t10\tlowq\tDP=4\tGT:DP:GQ\t1/1:2:10\n"
        "chr1\t30\t.\tAC\tGT\t90\tPASS\tDP=9\tGT:DP:GQ\t./.:9:50\n"
    )
    vars_ = ac.loadVariants(str(vcf))
    assert vars_.filterToFiltersPassed().toDF().count() == 2
    assert vars_.filterByQuality(40).toDF().count() == 2
    assert vars_.filterToSingleNucleotideVariants().toDF().count() == 1
    assert vars_.filterSingleNucleotideVariants().toDF().count() == 2
    assert vars_.filterToMultipleNucleotideVariants().toDF().count() == 1
    assert vars_.filterToIndels().toDF().count() == 1
    assert vars_.filterToReferenceName("chr1").toDF().count() == 3

    gts = ac.loadGenotypes(str(vcf))
    # genotype-level filters come from FT, not the variant FILTER column:
    # no FT → filters applied + passed (htsjdk#741 semantics), so all 3
    # genotype rows pass even though variant row 2 failed 'lowq'
    assert gts.filterToFiltersPassed().toDF().count() == 3
    assert gts.filterByQuality(20).toDF().count() == 2
    assert gts.filterByReadDepth(5).toDF().count() == 2
    assert gts.filterNoCalls().toDF().count() == 2
    assert gts.filterToSample("s1").toDF().count() == 3
    assert gts.filterToSamples(["other"]).toDF().count() == 0


def test_copy_variant_end_and_save_headers(ac, tmp_path):
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "chr1\t10\t.\tA\tG\t50\tPASS\tDP=3\tGT\t0/1\n"
    )
    gts = ac.loadGenotypes(str(vcf))
    g2 = gts.copyVariantEndToAttribute()
    row = g2.toDF().select("variant.annotation.attributes").collect()[0][0]
    assert row["END"] == "10"  # genotype end (half-open) → INFO END string
    # idempotent: END is replaced, not doubled
    g3 = g2.copyVariantEndToAttribute()
    assert g3.toDF().select("variant.annotation.attributes").collect()[0][0]["END"] == "10"

    out = str(tmp_path / "sink")
    gts.saveVcfHeaders(out)
    lines = open(out + "/_header").read().splitlines()
    # the writer pins htsjdk's version line (4.2) regardless of the
    # input's declared version — byte-pinned against sorted.vcf in
    # tests/test_reference_goldens.py
    assert lines[0] == "##fileformat=VCFv4.2"
    assert any(l.startswith("##contig=<ID=chr1") for l in lines)
    assert lines[-1].startswith("#CHROM") and lines[-1].endswith("s1")


def test_load_indexed_vcf_and_bcf_compat(spark, tmp_path):
    """ADAMContext.loadIndexedVcf (Scala surface, ADAMContext.scala:
    2760) and the beyond-reference loadIndexedBcf both return
    VariantContextDatasets restricted to the query regions."""
    from adam_spark.compat import ADAMContext
    from adam_spark.sources.bcf import save_bcf
    from adam_spark.sources.vcf import load_vcf, save_vcf_bgzf

    lines = [
        "##fileformat=VCFv4.3",
        "##contig=<ID=chr1,length=1000000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
    ]
    for i in range(200):
        lines.append(f"chr1\t{1 + i * 97}\t.\tA\tG\t50\tPASS\t.\tGT\t0/1")
    src = tmp_path / "x.vcf"
    src.write_text("\n".join(lines) + "\n")
    gf = load_vcf(spark, str(src))
    gz = str(tmp_path / "x.vcf.gz")
    save_vcf_bgzf(gf, gz)
    bcf = str(tmp_path / "x.bcf")
    save_bcf(gf, bcf)

    ac = ADAMContext(spark)
    regions = [("chr1", 1000, 3000)]
    want = sorted(
        r["start"]
        for r in gf.filter_by_overlapping_regions(regions).df.collect()
    )
    got_vcf = sorted(
        r["start"] for r in ac.loadIndexedVcf(gz, regions).toDF().collect()
    )
    got_bcf = sorted(
        r["start"] for r in ac.loadIndexedBcf(bcf, regions).toDF().collect()
    )
    assert got_vcf == want and got_bcf == want and len(want) > 0
