"""VariantContextConverterSuite vector core, ported onto the VCF text
converter (reference adam-core/src/test/.../converters/
VariantContextConverterSuite.scala, 193 tests; the ~30 highest-signal
fixtures below, cited per test). The htsjdk builder becomes a VCF FORMAT
cell; the adam->htsjdk direction is asserted on save_vcf's text output.
"""

import math

import pytest
from pyspark.sql import functions as F

from adam_spark.sources import vcf as vcf_io

HEADER = (
    "##fileformat=VCFv4.3\n"
    "##contig=<ID=chr1,length=1000000>\n"
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA12878\n"
)


def _gt(spark, tmp_path, fmt, cell, alt="G", site="chr1\t100\t.\tA\t{alt}\t50\tPASS\t."):
    """One-sample genotype row from a synthetic FORMAT/cell pair."""
    p = tmp_path / "v.vcf"
    p.write_text(HEADER + site.format(alt=alt) + f"\t{fmt}\t{cell}\n")
    rows = vcf_io.load_vcf_genotypes(spark, str(p)).df.collect()
    assert len(rows) >= 1
    return rows


def _save_text(gf, tmp_path, name="out.vcf"):
    import os

    out = str(tmp_path / name)
    vcf_io.save_vcf(gf, out, single_file=True)
    part = [f for f in sorted(os.listdir(out)) if f.startswith("part-")][0]
    return open(os.path.join(out, part)).read()


# --- allelic depth / read depth / GQ (suite :596-672) ----------------------
def test_allelic_depth_vectors(spark, tmp_path):
    """'no allelic depth' (:596) + 'set allelic depth' (:607)."""
    (r,) = _gt(spark, tmp_path, "GT:AD", "0/1:3,6")
    assert (r["referenceReadDepth"], r["alternateReadDepth"]) == (3, 6)
    (r,) = _gt(spark, tmp_path, "GT:AD", "0/1:.")
    assert (r["referenceReadDepth"], r["alternateReadDepth"]) == (None, None)


def test_read_depth_vectors(spark, tmp_path):
    """'no/extract gt read depth' (:618-636) + MIN_DP (:638-652) +
    GQ (:654-672)."""
    (r,) = _gt(spark, tmp_path, "GT:DP:MIN_DP:GQ", "0/1:20:18:50")
    assert (r["readDepth"], r["minReadDepth"], r["genotypeQuality"]) == (20, 18, 50)
    (r,) = _gt(spark, tmp_path, "GT", "0/1")
    assert (r["readDepth"], r["minReadDepth"], r["genotypeQuality"]) == (None, None, None)


# --- genotype likelihoods (suite :674-697) ---------------------------------
def test_phred_likelihood_vectors(spark, tmp_path):
    """'extract phred likelihoods' (:684-697): PL 10,30,60 through
    PhredUtils.phredToLogProbability = ln(1 - 10^(-p/10))."""
    (r,) = _gt(spark, tmp_path, "GT:PL", "0/1:10,30,60")
    gls = r["genotypeLikelihoods"]
    assert len(gls) == 3
    assert -1.1e-1 < gls[0] < -0.99e-1
    assert -1.1e-3 < gls[1] < -0.99e-3
    assert -1.1e-6 < gls[2] < -0.99e-6
    (r,) = _gt(spark, tmp_path, "GT", "0/1")
    assert r["genotypeLikelihoods"] in (None, [])


def test_gl_field_normalizes_like_htsjdk(spark, tmp_path):
    """A GL (log10) field folds into phred PLs normalized so the best
    genotype is 0 (htsjdk GenotypeLikelihoods.getPLs) before the
    phredToLogProbability conversion."""
    (r,) = _gt(spark, tmp_path, "GT:GL", "0/1:-1.0,0.0,-3.0")
    gls = r["genotypeLikelihoods"]
    # PLs = [10, 0, 30]
    assert -1.1e-1 < gls[0] < -0.99e-1
    assert math.isinf(gls[1]) and gls[1] < 0
    assert -1.1e-3 < gls[2] < -0.99e-3


# --- strand bias (suite :698-722, :949-973) --------------------------------
def test_strand_bias_vectors(spark, tmp_path):
    """'extract strand bias info' (:706): SB 10,12,14,16; malformed
    2-component SB is rejected (require(size==4), converter :1003-1008)."""
    (r,) = _gt(spark, tmp_path, "GT:SB", "0/1:10,12,14,16")
    assert r["strandBiasComponents"] == [10, 12, 14, 16]
    (r,) = _gt(spark, tmp_path, "GT:SB", "0/1:10,12")
    assert r["strandBiasComponents"] is None
    (r,) = _gt(spark, tmp_path, "GT", "0/1")
    assert r["strandBiasComponents"] is None


# --- genotype filters: always applied (suite :731-780) ---------------------
def test_genotype_filter_matrix(spark, tmp_path):
    """'no filters' (:731 'sigh'), 'filters passed' (:740), 'extract
    single filter' (:751), 'extract multiple filters' (:765): FT is
    ALWAYS applied; missing/'.'/PASS mean passed."""
    for fmt, cell in [("GT", "0/1"), ("GT:FT", "0/1:."), ("GT:FT", "0/1:PASS")]:
        (r,) = _gt(spark, tmp_path, fmt, cell)
        vca = r["variantCallingAnnotations"]
        assert vca["filtersApplied"] is True and vca["filtersPassed"] is True
        assert vca["filtersFailed"] is None
    (r,) = _gt(spark, tmp_path, "GT:FT", "0/1:FAILED_FILTER")
    vca = r["variantCallingAnnotations"]
    assert vca["filtersApplied"] is True and vca["filtersPassed"] is False
    assert vca["filtersFailed"] == ["FAILED_FILTER"]
    (r,) = _gt(spark, tmp_path, "GT:FT", "0/1:F1;F2;F3")
    assert r["variantCallingAnnotations"]["filtersFailed"] == ["F1", "F2", "F3"]


# --- FS / MQ / MQ0 (suite :781-830) -----------------------------------------
def test_genotype_annotation_vectors(spark, tmp_path):
    """'extract fisher strand bias' (:789), 'extract rms mapping
    quality' (:805), 'extract mq0' (:821) — FORMAT-level FS/MQ/MQ0 land
    on VariantCallingAnnotations and leave the attributes map."""
    (r,) = _gt(spark, tmp_path, "GT:FS:MQ:MQ0", "0/1:0.25:40.0:100")
    vca = r["variantCallingAnnotations"]
    assert vca["fisherStrandBiasPValue"] == pytest.approx(0.25)
    assert vca["rmsMapQ"] == pytest.approx(40.0)
    assert vca["mapq0Reads"] == 100
    assert dict(vca["attributes"]) == {}
    (r,) = _gt(spark, tmp_path, "GT", "0/1")
    vca = r["variantCallingAnnotations"]
    assert vca["fisherStrandBiasPValue"] is None
    assert vca["rmsMapQ"] is None and vca["mapq0Reads"] is None


# --- phasing (suite :562-595) ------------------------------------------------
def test_phase_vectors(spark, tmp_path):
    """'no phasing set' (:562), 'phased but no phase set info' (:573),
    'set phase set and extract' (:584 — PS=4, PQ=10); PS/PQ are only
    read off phased genotypes (formatPhaseInfo :1018-1045)."""
    (r,) = _gt(spark, tmp_path, "GT", "0/1")
    assert r["phased"] is False and r["phaseSetId"] is None and r["phaseQuality"] is None
    (r,) = _gt(spark, tmp_path, "GT", "0|1")
    assert r["phased"] is True and r["phaseSetId"] is None and r["phaseQuality"] is None
    (r,) = _gt(spark, tmp_path, "GT:PS:PQ", "0|1:4:10")
    assert r["phased"] is True and r["phaseSetId"] == 4 and r["phaseQuality"] == 10
    # unphased genotype: PS/PQ ignored
    (r,) = _gt(spark, tmp_path, "GT:PS:PQ", "0/1:4:10")
    assert r["phased"] is False and r["phaseSetId"] is None and r["phaseQuality"] is None


# --- gVCF reference model (suite :379-401) ----------------------------------
def test_gvcf_reference_record_vector(spark, tmp_path):
    """'Convert gVCF reference records to ADAM': PL 0,1,2 + DP 44 +
    MIN_DP 38 on a <NON_REF>-only site → null alternate, REF/REF
    alleles, empty genotypeLikelihoods, nonReferenceLikelihoods mapping
    back to phred [0, 1, 2]."""
    (r,) = _gt(
        spark,
        tmp_path,
        "GT:DP:MIN_DP:PL",
        "0/0:44:38:0,1,2",
        site="chr1\t100\t.\tA\t<NON_REF>\t50\tPASS\t.",
    )
    assert r["variant"]["alternateAllele"] is None
    assert r["alleles"] == ["REF", "REF"]
    assert r["minReadDepth"] == 38 and r["readDepth"] == 44
    assert r["genotypeLikelihoods"] == []
    nrl = r["nonReferenceLikelihoods"]
    assert [_log_prob_to_phred_py(x) for x in nrl] == [0, 1, 2]


def test_biallelic_plus_nonref_vector(spark, tmp_path):
    """alts = [real, <NON_REF>] (converter :390-401): NOT split, GLs from
    PL[0,1,2], nonReferenceLikelihoods from PL indices [0,3,5]."""
    (r,) = _gt(
        spark,
        tmp_path,
        "GT:PL",
        "0/1:10,0,20,30,40,50",
        site="chr1\t100\t.\tA\tG,<NON_REF>\t50\tPASS\t.",
    )
    assert r["variant"]["alternateAllele"] == "G"
    assert r["splitFromMultiAllelic"] is False
    assert r["variant"]["splitFromMultiAllelic"] is False
    assert [_log_prob_to_phred_py(x) for x in r["genotypeLikelihoods"]] == [10, 0, 20]
    assert [_log_prob_to_phred_py(x) for x in r["nonReferenceLikelihoods"]] == [10, 30, 50]


# --- multiallelic split (suite :327-377) -------------------------------------
def test_multiallelic_gl_subset_vector(spark, tmp_path):
    """'Convert htsjdk multi-allelic SNVs to ADAM and back to htsjdk':
    GT 1/2, AD 4,2,3, PL 59,0,181,1,66,102 → T row GL↦PL [59,0,181]
    with alleles [ALT, OTHER_ALT]; G row GL↦PL [59,1,102] with
    [OTHER_ALT, ALT]; both splitFromMultiAllelic."""
    p = tmp_path / "m.vcf"
    p.write_text(
        HEADER + "chr1\t100\t.\tA\tT,G\t50\tPASS\t.\tGT:AD:PL\t1/2:4,2,3:59,0,181,1,66,102\n"
    )
    rows = vcf_io.load_vcf_genotypes(spark, str(p)).df.collect()
    by = {r["variant"]["alternateAllele"]: r for r in rows}
    t, g = by["T"], by["G"]
    for r in (t, g):
        assert r["splitFromMultiAllelic"] is True
        assert r["variant"]["splitFromMultiAllelic"] is True
        assert r["referenceReadDepth"] == 4
    assert t["alleles"] == ["ALT", "OTHER_ALT"]
    assert t["alternateReadDepth"] == 2
    assert [_log_prob_to_phred_py(x) for x in t["genotypeLikelihoods"]] == [59, 0, 181]
    assert g["alleles"] == ["OTHER_ALT", "ALT"]
    assert g["alternateReadDepth"] == 3
    assert [_log_prob_to_phred_py(x) for x in g["genotypeLikelihoods"]] == [59, 1, 102]


def test_multiallelic_sites_only_vector(spark, tmp_path):
    """'Convert htsjdk multi-allelic sites-only SNVs to ADAM' (:315):
    one variant row per alternate, same reference allele."""
    p = tmp_path / "m.vcf"
    p.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tT,G\t50\tPASS\t.\n"
    )
    rows = vcf_io.load_vcf_variants(spark, str(p)).df.orderBy("alternateAllele").collect()
    assert [r["alternateAllele"] for r in rows] == ["G", "T"]
    assert all(r["referenceAllele"] == "A" for r in rows)


# --- variant names / quality / filters (suite :402-560, :1180-1275) ----------
def test_variant_name_vectors(spark, tmp_path):
    """'no IDs' (:402), 'one ID' (:413), 'multiple IDs' (:425)."""

    def names_of(idcol):
        p = tmp_path / "n.vcf"
        p.write_text(
            "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000000>\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            f"chr1\t100\t{idcol}\tA\tG\t50\tPASS\t.\n"
        )
        return vcf_io.load_vcf_variants(spark, str(p)).df.collect()[0]["names"]

    assert names_of(".") is None
    assert names_of("rs3131972") == ["rs3131972"]
    assert names_of("rs3131972;rs201888535") == ["rs3131972", "rs201888535"]


def test_variant_filter_matrix(spark, tmp_path):
    """htsjdk->adam variant filter states (:1226-1275): '.' → not
    applied; PASS → applied+passed; 'FILTER1;FILTER2' → failed list."""

    def filt(fstr):
        p = tmp_path / "f.vcf"
        p.write_text(
            "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000000>\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            f"chr1\t100\t.\tA\tG\t50\t{fstr}\t.\n"
        )
        r = vcf_io.load_vcf_variants(spark, str(p)).df.collect()[0]
        return (r["filtersApplied"], r["filtersPassed"], r["filtersFailed"])

    assert filt(".") == (False, False, None)
    assert filt("PASS") == (True, True, None)
    assert filt("FILTER1;FILTER2") == (True, False, ["FILTER1", "FILTER2"])


# --- adam -> htsjdk (save direction, suite :832-1175 extract fns) ------------
def test_save_direction_vectors(spark, tmp_path):
    """extractFilters (:1263-1281): passed genotypes emit no FT, failed
    emit the ;-joined list; extractFisherStrandBias/RmsMapQ/MapQ0
    (:1283-1300) re-emit FS/MQ/MQ0; extractGenotypeLikelihoods re-phreds
    GLs; PS/PQ written for phased genotypes; full text fixpoint."""
    p = tmp_path / "s.vcf"
    p.write_text(
        HEADER
        + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:AD:DP:GQ:PL:PS:PQ:FS:MQ:MQ0:XX\t"
        "0|1:3,6:20:50:10,0,30:4:10:0.25:40.0:100:custom\n"
        + "chr1\t200\t.\tC\tT\t50\tPASS\t.\tGT:FT\t0/1:F1;F2\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path)
    body = [l for l in text.splitlines() if not l.startswith("#")]
    l1 = [l for l in body if "\t100\t" in l][0]
    fmt, cell = l1.split("\t")[8], l1.split("\t")[9]
    fk = dict(zip(fmt.split(":"), cell.split(":")))
    assert fk["GT"] == "0|1" and fk["AD"] == "3,6"
    assert fk["PL"] == "10,0,30"
    assert fk["PS"] == "4" and fk["PQ"] == "10"
    assert fk["FS"] == "0.25" and fk["MQ"] == "40.0" and fk["MQ0"] == "100"
    assert fk["XX"] == "custom"
    assert "FT" not in fk  # passed filters re-emit as absent FT
    l2 = [l for l in body if "\t200\t" in l][0]
    fk2 = dict(zip(l2.split("\t")[8].split(":"), l2.split("\t")[9].split(":")))
    assert fk2["FT"] == "F1;F2"
    # reload equality + text fixpoint
    back = vcf_io.load_vcf(spark, str(tmp_path / "out.vcf"))
    assert sorted(map(repr, gf.df.collect())) == sorted(map(repr, back.df.collect()))
    assert _save_text(back, tmp_path, "out2.vcf") == text


def _log_prob_to_phred_py(lp: float) -> int:
    """PhredUtils.logProbabilityToPhred (PhredUtils.scala:110-115)."""
    if lp == 0.0:
        return 3233
    return round(-10.0 / math.log(10.0) * math.log(-math.expm1(lp)))


def test_multiallelic_with_trailing_nonref_vector(spark, tmp_path):
    """Multiallelic + trailing <NON_REF> (converter :402-433): the
    symbolic allele drops from the per-alt expansion but its allele
    index (3 here) still drives nonReferenceLikelihoods — PL positions
    [0,6,9] — while each real-alt row subsets its own diploid indices
    and keeps splitFromMultiAllelic."""
    p = tmp_path / "m.vcf"
    p.write_text(
        HEADER
        + "chr1\t100\t.\tA\tT,G,<NON_REF>\t50\tPASS\t.\tGT:PL\t1/2:0,1,2,3,4,5,6,7,8,9\n"
    )
    rows = vcf_io.load_vcf_genotypes(spark, str(p)).df.collect()
    by = {r["variant"]["alternateAllele"]: r for r in rows}
    assert set(by) == {"T", "G"}
    for r in by.values():
        assert r["splitFromMultiAllelic"] is True
        assert [_log_prob_to_phred_py(x) for x in r["nonReferenceLikelihoods"]] == [0, 6, 9]
    assert [_log_prob_to_phred_py(x) for x in by["T"]["genotypeLikelihoods"]] == [0, 1, 2]
    assert [_log_prob_to_phred_py(x) for x in by["G"]["genotypeLikelihoods"]] == [0, 3, 5]


def test_site_only_cnv_and_somatic_vectors(spark, tmp_path):
    """'Convert htsjdk site-only CNV to ADAM' (:121-137): symbolic <CN0>
    alternate survives and the span comes from INFO END (start 9,
    end 20); 'Convert somatic htsjdk site-only SNV' (:107-120): the
    SOMATIC flag lands on annotation.somatic."""
    p = tmp_path / "c.vcf"
    p.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=1,length=1000000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t10\t.\tA\t<CN0>\t.\t.\tEND=20\n"
        "1\t2\t.\tA\tT\t.\t.\tSOMATIC\n"
    )
    rows = {r["alternateAllele"]: r for r in vcf_io.load_vcf_variants(spark, str(p)).df.collect()}
    cnv = rows["<CN0>"]
    assert (cnv["start"], cnv["end"]) == (9, 20)
    assert rows["T"]["annotation"]["somatic"] is True
    assert (rows["T"]["start"], rows["T"]["end"]) == (1, 2)


def test_info_aa_cigar_round_trip(spark, tmp_path):
    """AA and CIGAR are typed annotation fields split out of the
    attributes map on load (VariantAnnotationConverter keys); the save
    side re-emits them so load->save->load is lossless."""
    p = tmp_path / "aa.vcf"
    p.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\tAA=C;CIGAR=1M;DP=30\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    r = gf.df.collect()[0]["variant"]
    assert r["annotation"]["ancestralAllele"] == "C"
    assert r["annotation"]["cigar"] == "1M"
    text = _save_text(gf, tmp_path, "aa_out.vcf")
    body = [l for l in text.splitlines() if not l.startswith("#")][0]
    info = body.split("\t")[7]
    assert "AA=C" in info and "CIGAR=1M" in info and "DP=30" in info
    back = vcf_io.load_vcf(spark, str(tmp_path / "aa_out.vcf"))
    assert sorted(map(repr, gf.df.collect())) == sorted(map(repr, back.df.collect()))


def test_variant_filters_save_direction(spark, tmp_path):
    """'Convert ADAM variant context with null/no/passing/failing
    filters applied to htsjdk' (:477-560): null/false filtersApplied →
    '.', passed → PASS, failed → ;-joined FILTER column."""
    p = tmp_path / "f.vcf"
    p.write_text(
        "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\t.\t.\n"
        "chr1\t200\t.\tC\tT\t50\tPASS\t.\n"
        "chr1\t300\t.\tG\tA\t50\tFILTER1;FILTER2\t.\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path, "f_out.vcf")
    filt = {
        int(l.split("\t")[1]): l.split("\t")[6]
        for l in text.splitlines()
        if not l.startswith("#")
    }
    assert filt == {100: ".", 200: "PASS", 300: "FILTER1;FILTER2"}


# --- variant annotation depth / membership vectors (suite :1401-1918) ------
ANNHDR = (
    "##fileformat=VCFv4.3\n"
    "##contig=<ID=chr1,length=1000000>\n"
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Combined depth">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
)


def _ann(spark, tmp_path, info, alt="G", name="a.vcf"):
    p = tmp_path / name
    p.write_text(ANNHDR + f"chr1\t100\t.\tA\t{alt}\t50\tPASS\t{info}\n")
    rows = vcf_io.load_vcf_variants(spark, str(p)).df.collect()
    return [r["annotation"] for r in rows]


def test_info_depth_pair_vectors(spark, tmp_path):
    """'no/single read depth going htsjdk->adam' (:1566-1581): INFO AD
    Number=R → (referenceReadDepth, readDepth); ADF/ADR fill the
    forward/reverse pairs (formatReadDepth/Forward/Reverse,
    VariantContextConverter.scala:680-725). INFO DP is NOT a typed
    field — it stays in attributes (DefaultHeaderLines has no DP INFO
    line)."""
    (a,) = _ann(spark, tmp_path, "AD=3,6;ADF=1,2;ADR=2,4;DP=9")
    assert (a["referenceReadDepth"], a["readDepth"]) == (3, 6)
    assert (a["referenceForwardReadDepth"], a["forwardReadDepth"]) == (1, 2)
    assert (a["referenceReverseReadDepth"], a["reverseReadDepth"]) == (2, 4)
    assert a["attributes"] == {"DP": "9"}
    (a,) = _ann(spark, tmp_path, "DP=9", name="nodepth.vcf")
    assert a["readDepth"] is None and a["referenceReadDepth"] is None


def test_info_depth_multiallelic_vectors(spark, tmp_path):
    """'multiple read depths going htsjdk->adam' (:1582-1591): on a
    multiallelic split, AD element 0 is the shared reference depth and
    element i+1 goes to the i-th alt's row."""
    anns = _ann(spark, tmp_path, "AD=4,10,20;ADF=2,3,5;ADR=2,7,15", alt="G,T")
    by_alt = sorted((a["readDepth"], a) for a in anns)
    assert [(a["referenceReadDepth"], a["readDepth"]) for _, a in by_alt] == [
        (4, 10), (4, 20)
    ]
    assert [(a["referenceForwardReadDepth"], a["forwardReadDepth"]) for _, a in by_alt] == [
        (2, 3), (2, 5)
    ]


def test_membership_flag_vectors(spark, tmp_path):
    """'no/[set] dbsnp|hapmap2|hapmap3|validated|1000G membership'
    (:1413-1472) + 'not somatic' (:1473-1484): absent flags leave the
    typed field NULL (the Option fold never calls the setter) except
    SOMATIC, which alone defaults false (formatSomatic:631-640)."""
    (a,) = _ann(spark, tmp_path, "DB;H3;1000G")
    assert (a["dbSnp"], a["hapMap2"], a["hapMap3"]) == (True, None, True)
    assert (a["validated"], a["thousandGenomes"], a["somatic"]) == (None, True, False)
    (a,) = _ann(spark, tmp_path, "VALIDATED;SOMATIC", name="b.vcf")
    assert (a["dbSnp"], a["validated"], a["somatic"]) == (None, True, True)
    # none of the membership keys leak into attributes
    assert a["attributes"] == {}


def test_membership_flag_save_direction(spark, tmp_path):
    """'dbsnp membership set adam->htsjdk' etc (:1647-1746): typed
    membership booleans re-emit as bare INFO flags (htsjdk writes a
    Flag key only when true), AD/ADF/ADR re-emit from the typed pairs
    (extractReadDepth:816-827)."""
    p = tmp_path / "rt.vcf"
    p.write_text(ANNHDR + "chr1\t100\t.\tA\tG\t50\tPASS\tAD=3,6;DB;VALIDATED;DP=9\n")
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path, "rt_out.vcf")
    (body,) = [l for l in text.splitlines() if not l.startswith("#")]
    info = body.split("\t")[7]
    # htsjdk VCFEncoder writes INFO keys in ASCII order (byte-pinned
    # against sorted.vcf in tests/test_reference_goldens.py)
    assert info == "AD=3,6;DB;DP=9;VALIDATED"
    # and the save→load fixpoint holds
    p2 = tmp_path / "rt2.vcf"
    p2.write_text(text)
    (a,) = [r["annotation"] for r in vcf_io.load_vcf_variants(spark, str(p2)).df.collect()]
    assert (a["referenceReadDepth"], a["readDepth"], a["dbSnp"], a["validated"]) == (
        3, 6, True, True
    )


def test_half_depth_pair_raises_on_save(spark, tmp_path):
    """'read depth without reference read depth' (:1832-1840, strict
    IAE): a half-set AD pair fails the save."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    p = tmp_path / "h.vcf"
    p.write_text(ANNHDR + "chr1\t100\t.\tA\tG\t50\tPASS\tAD=3,6\n")
    gf = vcf_io.load_vcf(spark, str(p))
    broken = gf.df.withColumn(
        "variant",
        F.col("variant").withField(
            "annotation",
            F.col("variant.annotation").withField("referenceReadDepth", F.lit(None).cast("int")),
        ),
    )
    gf2 = vcf_io.GenomicFrame(broken, gf.meta)
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        _save_text(gf2, tmp_path, "h_out.vcf")


# --- INFO/FORMAT header-typed attribute matrix (suite :1929-2592) ----------
def test_info_attribute_number_matrix(spark, tmp_path):
    """'VCF INFO attribute Number=1/4/A/R htsjdk->adam' (:2120-2235):
    non-reserved INFO keys land in attributes typed by their declared
    header Number — fixed counts keep the full value, Number=A takes
    this row's alt element, Number=R joins the reference element with
    this row's alt element."""
    hdr = (
        "##fileformat=VCFv4.3\n"
        "##contig=<ID=chr1,length=1000000>\n"
        '##INFO=<ID=ONE,Number=1,Type=Integer,Description="">\n'
        '##INFO=<ID=FOUR,Number=4,Type=Integer,Description="">\n'
        '##INFO=<ID=PERA,Number=A,Type=Integer,Description="">\n'
        '##INFO=<ID=PERR,Number=R,Type=String,Description="">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )
    p = tmp_path / "m.vcf"
    p.write_text(
        hdr + "chr1\t100\t.\tA\tG,T\t50\tPASS\tONE=5;FOUR=5,10,15,20;PERA=7,8;PERR=ref,g,t\n"
    )
    rows = vcf_io.load_vcf_variants(spark, str(p)).df.collect()
    attrs = {r["alternateAllele"]: r["annotation"]["attributes"] for r in rows}
    assert attrs["G"] == {"ONE": "5", "FOUR": "5,10,15,20", "PERA": "7", "PERR": "ref,g"}
    assert attrs["T"] == {"ONE": "5", "FOUR": "5,10,15,20", "PERA": "8", "PERR": "ref,t"}


def test_format_attribute_number_matrix(spark, tmp_path):
    """'VCF FORMAT attribute Number=1/4/A/R/G htsjdk->adam'
    (:2432-2592): same per-alt subsetting for non-reserved FORMAT keys;
    Number=G takes the diploid PL-index elements of this row's allele
    (makeGenotypeFormatFn indices, VariantContextConverter.scala:
    1846-1850)."""
    hdr = (
        "##fileformat=VCFv4.3\n"
        "##contig=<ID=chr1,length=1000000>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
        '##FORMAT=<ID=ONE,Number=1,Type=Integer,Description="">\n'
        '##FORMAT=<ID=PERA,Number=A,Type=Integer,Description="">\n'
        '##FORMAT=<ID=PERR,Number=R,Type=Integer,Description="">\n'
        '##FORMAT=<ID=PERG,Number=G,Type=Integer,Description="">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA12878\n"
    )
    p = tmp_path / "fm.vcf"
    p.write_text(
        hdr
        + "chr1\t100\t.\tA\tG,T\t50\tPASS\t.\tGT:ONE:PERA:PERR:PERG"
        + "\t1/2:5:7,8:2,4,6:0,10,20,30,40,50\n"
    )
    rows = vcf_io.load_vcf_genotypes(spark, str(p)).df.collect()
    attrs = {r["variant"]["alternateAllele"]: r["variantCallingAnnotations"]["attributes"] for r in rows}
    # alt G (allele idx 1): PL indices (0,1,2); alt T (idx 2): (0,3,5)
    assert attrs["G"] == {"ONE": "5", "PERA": "7", "PERR": "2,4", "PERG": "0,10,20"}
    assert attrs["T"] == {"ONE": "5", "PERA": "8", "PERR": "2,6", "PERG": "0,30,50"}


def test_bad_sb_lenient_skip_on_save(spark, tmp_path):
    """'Convert ADAM SNV w/ genotypes but bad SB to htsjdk with lenient
    validation' (:293-314): a 2-component strandBiasComponents array is
    skipped on save (the FORMAT cell carries no SB key)."""
    p = tmp_path / "sb.vcf"
    p.write_text(HEADER + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:SB\t0/1:1,2,3,4\n")
    gf = vcf_io.load_vcf(spark, str(p))
    broken = gf.df.withColumn(
        "genotypes",
        F.transform(
            F.col("genotypes"),
            lambda g: g.withField("strandBiasComponents", F.array(F.lit(0), F.lit(2))),
        ),
    )
    text = _save_text(vcf_io.GenomicFrame(broken, gf.meta), tmp_path, "sb_out.vcf")
    (body,) = [l for l in text.splitlines() if not l.startswith("#")]
    assert "SB" not in body.split("\t")[8].split(":")


def test_bad_sb_strict_raises_on_save(spark, tmp_path):
    """'Convert ADAM SNV w/ genotypes but bad SB to htsjdk with strict
    validation' (VariantContextConverterSuite.scala:274): the same
    2-component strandBiasComponents array RAISES under
    stringency=STRICT — and a well-formed 4-component one still saves."""
    p = tmp_path / "sb.vcf"
    p.write_text(HEADER + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:SB\t0/1:1,2,3,4\n")
    gf = vcf_io.load_vcf(spark, str(p))
    broken = gf.df.withColumn(
        "genotypes",
        F.transform(
            F.col("genotypes"),
            lambda g: g.withField("strandBiasComponents", F.array(F.lit(0), F.lit(2))),
        ),
    )
    with pytest.raises(Exception, match="Strand bias components must have 4"):
        vcf_io.save_vcf(
            vcf_io.GenomicFrame(broken, gf.meta),
            str(tmp_path / "strict_out.vcf"),
            single_file=True,
            stringency="STRICT",
        )
    # the good 4-component row passes STRICT and renders SB unchanged
    out = str(tmp_path / "good_out.vcf")
    vcf_io.save_vcf(gf, out, single_file=True, stringency="STRICT")
    import os

    part = [f for f in sorted(os.listdir(out)) if f.startswith("part-")][0]
    (body,) = [
        l
        for l in open(os.path.join(out, part)).read().splitlines()
        if not l.startswith("#")
    ]
    fmt, cell = body.split("\t")[8:10]
    assert fmt.split(":")[-1] == "SB" and cell.split(":")[-1] == "1,2,3,4"


def test_genotypes_to_variants_matches_variant_load(spark, tmp_path):
    """GenotypeDatasetSuite 'loading genotypes then converting to
    variants yields same output as loading variants' (:587-605)."""
    p = tmp_path / "gv.vcf"
    p.write_text(
        HEADER
        + "chr1\t100\trs1\tA\tG,T\t50\tPASS\tAD=3,6,9;DB\tGT:DP\t1/2:18\n"
        + "chr1\t200\t.\tC\tT\t9\tq10\tAF=0.5\tGT:DP\t0/1:7\n"
    )
    from_g = (
        vcf_io.load_vcf_genotypes(spark, str(p))
        .df.select("variant.*")
        .dropDuplicates(["referenceName", "start", "alternateAllele"])
    )
    direct = vcf_io.load_vcf_variants(spark, str(p)).df
    a = sorted(map(str, from_g.collect()))
    b = sorted(map(str, direct.collect()))
    assert a == b


def test_half_forward_reverse_depth_pairs_raise_on_save(spark, tmp_path):
    """'(reference) forward/reverse read depth without its pair'
    (:1861-1876, :1899-1915): every half-set ADF/ADR pair fails the
    save with the strict IAE, in BOTH halves, like the AD vector."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    cases = [
        ("ADF=3,6", "referenceForwardReadDepth"),
        ("ADF=3,6", "forwardReadDepth"),
        ("ADR=2,5", "referenceReverseReadDepth"),
        ("ADR=2,5", "reverseReadDepth"),
    ]
    for i, (info, null_field) in enumerate(cases):
        p = tmp_path / f"h{i}.vcf"
        p.write_text(ANNHDR + f"chr1\t100\t.\tA\tG\t50\tPASS\t{info}\n")
        gf = vcf_io.load_vcf(spark, str(p))
        broken = gf.df.withColumn(
            "variant",
            F.col("variant").withField(
                "annotation",
                F.col("variant.annotation").withField(
                    null_field, F.lit(None).cast("int")
                ),
            ),
        )
        gf2 = vcf_io.GenomicFrame(broken, gf.meta)
        with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
            _save_text(gf2, tmp_path, f"h{i}_out.vcf")


def test_full_depth_pairs_round_trip(spark, tmp_path):
    """'forward/reverse read depth set adam->htsjdk' (:1848-1858,
    :1886-1897): full ADF/ADR pairs load into the typed fields and
    re-emit as 'ref,alt' — plus AD alongside."""
    p = tmp_path / "full.vcf"
    p.write_text(
        ANNHDR + "chr1\t100\t.\tA\tG\t50\tPASS\tAD=1,2;ADF=5,10;ADR=3,7\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    ann = gf.df.select("variant.annotation.*").collect()[0]
    assert (ann["referenceForwardReadDepth"], ann["forwardReadDepth"]) == (5, 10)
    assert (ann["referenceReverseReadDepth"], ann["reverseReadDepth"]) == (3, 7)
    text = _save_text(gf, tmp_path, "full_out.vcf")
    body = [l for l in text.splitlines() if not l.startswith("#")][0]
    info = body.split("\t")[7]
    assert "AD=1,2" in info and "ADF=5,10" in info and "ADR=3,7" in info


def test_multiple_cigars_and_frequencies_round_trip(spark, tmp_path):
    """'multiple CIGARs going htsjdk->adam' (:1558-1565) + 'multiple
    allele frequencies' (:1536-1543): Number=A INFO fields subset to
    THIS row's alt on the multiallelic split, one value per row."""
    hdr = ANNHDR
    p = tmp_path / "ma.vcf"
    p.write_text(
        hdr + "chr1\t100\t.\tA\tG,T\t50\tPASS\tCIGAR=1X,1M;AF=0.1,0.3\n"
    )
    rows = vcf_io.load_vcf(spark, str(p)).df.orderBy("variant.alternateAllele").collect()
    assert len(rows) == 2
    by_alt = {
        r["variant"]["alternateAllele"]: r["variant"]["annotation"] for r in rows
    }
    assert by_alt["G"]["cigar"] == "1X" and by_alt["T"]["cigar"] == "1M"
    assert abs(by_alt["G"]["alleleFrequency"] - 0.1) < 1e-6
    assert abs(by_alt["T"]["alleleFrequency"] - 0.3) < 1e-6
