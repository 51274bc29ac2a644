"""VariantContextConverterSuite breadth pass (round 10): the
Character-typed attribute cells, the genotype phase save-direction
matrix, and the strict filter-contract IAEs in both the variant and
genotype save directions (reference adam-core/src/test/.../converters/
VariantContextConverterSuite.scala, cited per test)."""

import os

import pytest
from pyspark.sql import functions as F

from adam_spark.sources import vcf as vcf_io

CONTIG = "##fileformat=VCFv4.3\n##contig=<ID=chr1,length=1000000>\n"


def _save_text(gf, tmp_path, name="out.vcf"):
    out = str(tmp_path / name)
    vcf_io.save_vcf(gf, out, single_file=True)
    part = [f for f in sorted(os.listdir(out)) if f.startswith("part-")][0]
    return open(os.path.join(out, part)).read()


def _fmt_cell(text, pos, col=9):
    (line,) = [
        l for l in text.splitlines()
        if not l.startswith("#") and l.split("\t")[1] == str(pos)
    ]
    p = line.split("\t")
    return p[8], dict(zip(p[8].split(":"), p[col].split(":")))


def _filter_col(text, pos):
    (line,) = [
        l for l in text.splitlines()
        if not l.startswith("#") and l.split("\t")[1] == str(pos)
    ]
    return line.split("\t")[6]


# --- Character-typed attributes ---------------------------------------------
# The converter's extractor matrices carry a VCFHeaderLineType.Character
# arm in all four directions (lineToVariantContextExtractor:1491,
# lineToGenotypeExtractor:1592,1623; extractorFromInfoLine:1978,
# extractorFromFormatLine:2012 — toChar requires length==1, arrays per
# element). Valid single-char data is textually identical to String, so
# the load keeps the raw value and the per-alt Number slicing applies
# unchanged; these vectors pin that and the save round trip.


def test_info_character_attribute_matrix(spark, tmp_path):
    hdr = (
        CONTIG
        + '##INFO=<ID=CONE,Number=1,Type=Character,Description="">\n'
        + '##INFO=<ID=CTRI,Number=3,Type=Character,Description="">\n'
        + '##INFO=<ID=CA,Number=A,Type=Character,Description="">\n'
        + '##INFO=<ID=CR,Number=R,Type=Character,Description="">\n'
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )
    p = tmp_path / "c.vcf"
    p.write_text(hdr + "chr1\t100\t.\tA\tG,T\t50\tPASS\tCONE=x;CTRI=a,b,c;CA=g,t;CR=r,u,v\n")
    rows = vcf_io.load_vcf_variants(spark, str(p)).df.collect()
    attrs = {r["alternateAllele"]: r["annotation"]["attributes"] for r in rows}
    assert attrs["G"] == {"CONE": "x", "CTRI": "a,b,c", "CA": "g", "CR": "r,u"}
    assert attrs["T"] == {"CONE": "x", "CTRI": "a,b,c", "CA": "t", "CR": "r,v"}


def test_format_character_attribute_matrix(spark, tmp_path):
    hdr = (
        CONTIG
        + '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
        + '##FORMAT=<ID=CONE,Number=1,Type=Character,Description="">\n'
        + '##FORMAT=<ID=CA,Number=A,Type=Character,Description="">\n'
        + '##FORMAT=<ID=CR,Number=R,Type=Character,Description="">\n'
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    )
    p = tmp_path / "cf.vcf"
    p.write_text(
        hdr + "chr1\t100\t.\tA\tG,T\t50\tPASS\t.\tGT:CONE:CA:CR\t1/2:x:g,t:r,u,v\n"
    )
    rows = vcf_io.load_vcf_genotypes(spark, str(p)).df.collect()
    attrs = {
        r["variant"]["alternateAllele"]: r["variantCallingAnnotations"]["attributes"]
        for r in rows
    }
    assert attrs["G"] == {"CONE": "x", "CA": "g", "CR": "r,u"}
    assert attrs["T"] == {"CONE": "x", "CA": "t", "CR": "r,v"}


def test_character_attribute_save_round_trip(spark, tmp_path):
    """Biallelic Character attributes survive save→load unchanged
    (single-char values are their own htsjdk render)."""
    hdr = (
        CONTIG
        + '##INFO=<ID=CONE,Number=1,Type=Character,Description="">\n'
        + '##INFO=<ID=CTRI,Number=3,Type=Character,Description="">\n'
        + '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
        + '##FORMAT=<ID=CF,Number=1,Type=Character,Description="">\n'
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    )
    p = tmp_path / "crt.vcf"
    p.write_text(hdr + "chr1\t100\t.\tA\tG\t50\tPASS\tCONE=x;CTRI=a,b,c\tGT:CF\t0/1:z\n")
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path)
    back = vcf_io.load_vcf(
        spark, str(tmp_path / "out.vcf")
    ).df.first()
    assert back["variant"]["annotation"]["attributes"]["CONE"] == "x"
    assert back["variant"]["annotation"]["attributes"]["CTRI"] == "a,b,c"
    (g,) = back["genotypes"]
    assert g["variantCallingAnnotations"]["attributes"]["CF"] == "z"
    assert "CONE=x" in text and "CTRI=a,b,c" in text


# --- genotype phase save direction (suite :975-1043) ------------------------


PHASE_HDR = (
    CONTIG
    + '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
    + '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="">\n'
    + '##FORMAT=<ID=PQ,Number=1,Type=Integer,Description="">\n'
    + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
)


def _phase_gf(spark, tmp_path, phased, ps, pq):
    p = tmp_path / "ph_in.vcf"
    p.write_text(PHASE_HDR + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:PS:PQ\t0|1:4444:10\n")
    gf = vcf_io.load_vcf(spark, str(p))
    mut = gf.df.withColumn(
        "genotypes",
        F.transform(
            "genotypes",
            lambda g: g.withField("phased", F.lit(phased).cast("boolean"))
            .withField("phaseSetId", F.lit(ps).cast("int"))
            .withField("phaseQuality", F.lit(pq).cast("int")),
        ),
    )
    return vcf_io.GenomicFrame(mut, gf.meta)


@pytest.mark.parametrize(
    "phased,ps,pq,sep,want_ps,want_pq",
    [
        (None, None, None, "/", None, None),   # 'no phasing info' (:975)
        (False, None, None, "/", None, None),  # 'unphased' (:984)
        (True, None, None, "|", None, None),   # 'phased but no ps/pq' (:993)
        (True, 54321, None, "|", "54321", None),  # 'phased but no pq' (:1005)
        (True, None, 65, "|", None, "65"),     # 'phased but no ps' (:1018)
        (True, 4444, 10, "|", "4444", "10"),   # 'phased' (:1031)
    ],
)
def test_phase_save_direction_matrix(spark, tmp_path, phased, ps, pq, sep, want_ps, want_pq):
    """extractPhaseInfo (VariantContextConverter.scala:1161-1177):
    PS/PQ attach only when phased is TRUE; the GT separator follows the
    phased flag."""
    gf = _phase_gf(spark, tmp_path, phased, ps, pq)
    text = _save_text(gf, tmp_path)
    fmt, cell = _fmt_cell(text, 100)
    assert cell["GT"].startswith("0" + sep)
    if want_ps is None:
        assert "PS" not in fmt
    else:
        assert cell["PS"] == want_ps
    if want_pq is None:
        assert "PQ" not in fmt
    else:
        assert cell["PQ"] == want_pq


def test_unphased_ps_pq_dropped_on_save(spark, tmp_path):
    """A genotype carrying PS/PQ values while phased=false drops both
    on save (reference 'unphased going adam->htsjdk' shape: the
    extractor never looks at PS/PQ unless phased)."""
    gf = _phase_gf(spark, tmp_path, False, 777, 9)
    text = _save_text(gf, tmp_path)
    fmt, cell = _fmt_cell(text, 100)
    assert "PS" not in fmt and "PQ" not in fmt
    assert cell["GT"] == "0/1"


# --- genotype filter save direction (suite :1045-1109) ----------------------


FILT_HDR = (
    CONTIG
    + '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
    + '##FORMAT=<ID=FT,Number=1,Type=String,Description="">\n'
    + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
)


def _gt_filter_gf(spark, tmp_path, applied, passed, failed):
    p = tmp_path / "ft_in.vcf"
    p.write_text(FILT_HDR + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:FT\t0/1:lowmq\n")
    gf = vcf_io.load_vcf(spark, str(p))
    mut = gf.df.withColumn(
        "genotypes",
        F.transform(
            "genotypes",
            lambda g: g.withField(
                "variantCallingAnnotations",
                g["variantCallingAnnotations"]
                .withField("filtersApplied", F.lit(applied).cast("boolean"))
                .withField("filtersPassed", F.lit(passed).cast("boolean"))
                .withField(
                    "filtersFailed",
                    F.lit(failed).cast("array<string>")
                    if failed is None
                    else F.array(*[F.lit(x) for x in failed]),
                ),
            ),
        ),
    )
    return vcf_io.GenomicFrame(mut, gf.meta)


def test_genotype_filters_failed_save_direction(spark, tmp_path):
    """'single/multiple filter failed going adam->htsjdk' (:1085-1109):
    the failed list renders ;-joined in the FT cell."""
    gf = _gt_filter_gf(spark, tmp_path, True, False, ["lowmq"])
    _, cell = _fmt_cell(_save_text(gf, tmp_path, "s1.vcf"), 100)
    assert cell["FT"] == "lowmq"
    gf = _gt_filter_gf(spark, tmp_path, True, False, ["lowmq", "lowdp"])
    _, cell = _fmt_cell(_save_text(gf, tmp_path, "s2.vcf"), 100)
    assert cell["FT"] == "lowmq;lowdp"


def test_genotype_filters_passed_or_absent_save_direction(spark, tmp_path):
    """'no filter info' (:1045) + 'filters passed' (:1062): neither an
    unfiltered nor a passing genotype puts FT on the line (htsjdk
    includes the key only when some genotype FAILED)."""
    for name, (a, p_, f_) in {
        "n1.vcf": (None, None, None),
        "n2.vcf": (True, True, None),
    }.items():
        gf = _gt_filter_gf(spark, tmp_path, a, p_, f_)
        fmt, _ = _fmt_cell(_save_text(gf, tmp_path, name), 100)
        assert "FT" not in fmt


def test_genotype_filter_contract_raises_on_save(spark, tmp_path):
    """'if filters applied, must set passed/failed' (:1052) + 'if
    filters failed, must set filters failed' (:1074): both are strict
    require/IAE contracts in extractFilters
    (VariantContextConverter.scala:1261-1278)."""
    gf = _gt_filter_gf(spark, tmp_path, True, None, None)
    with pytest.raises(Exception, match="filters passed is null"):
        _save_text(gf, tmp_path, "e1.vcf")
    gf = _gt_filter_gf(spark, tmp_path, True, False, None)
    with pytest.raises(Exception, match="no failed filters"):
        _save_text(gf, tmp_path, "e2.vcf")
    gf = _gt_filter_gf(spark, tmp_path, True, False, [])
    with pytest.raises(Exception, match="no failed filters"):
        _save_text(gf, tmp_path, "e3.vcf")


# --- variant filter save direction (suite :498-530 + :1735-1800) ------------


def _var_filter_gf(spark, tmp_path, applied, passed, failed):
    p = tmp_path / "vf_in.vcf"
    p.write_text(
        CONTIG
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        + "chr1\t100\t.\tA\tG\t50\tPASS\t.\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    mut = gf.df.withColumn(
        "variant",
        F.col("variant")
        .withField("filtersApplied", F.lit(applied).cast("boolean"))
        .withField("filtersPassed", F.lit(passed).cast("boolean"))
        .withField(
            "filtersFailed",
            F.lit(failed).cast("array<string>")
            if failed is None
            else F.array(*[F.lit(x) for x in failed]),
        ),
    )
    return vcf_io.GenomicFrame(mut, gf.meta)


def test_variant_filter_save_matrix(spark, tmp_path):
    """'no filters applied' / 'null filters applied' / 'filters passed'
    / 'single/multiple filters failed' adam->htsjdk (:498-530 and the
    converter unit block): '.' for unapplied, PASS for passing, the
    ;-joined failed list otherwise."""
    cases = {
        "v1.vcf": ((None, None, None), "."),
        "v2.vcf": ((False, None, None), "."),
        "v3.vcf": ((True, True, None), "PASS"),
        "v4.vcf": ((True, False, ["FAIL1"]), "FAIL1"),
        "v5.vcf": ((True, False, ["FAIL1", "FAIL2"]), "FAIL1;FAIL2"),
    }
    for name, ((a, p_, f_), want) in cases.items():
        gf = _var_filter_gf(spark, tmp_path, a, p_, f_)
        assert _filter_col(_save_text(gf, tmp_path, name), 100) == want, name


def test_variant_filter_contract_raises_on_save(spark, tmp_path):
    """extractFilters variant direction (VariantContextConverter.
    scala:541-561): applied-with-null-passed and failed-without-list
    raise."""
    gf = _var_filter_gf(spark, tmp_path, True, None, None)
    with pytest.raises(Exception, match="filters passed is null"):
        _save_text(gf, tmp_path, "ve1.vcf")
    gf = _var_filter_gf(spark, tmp_path, True, False, [])
    with pytest.raises(Exception, match="no failed filters"):
        _save_text(gf, tmp_path, "ve2.vcf")


# --- variant quality save direction (suite :93-94 group) --------------------


def test_variant_quality_save_direction(spark, tmp_path):
    """'no qual set' / 'qual is set' adam->htsjdk: a null quality
    renders '.', a set quality renders htsjdk's %.2f with a trailing
    '.00' trimmed (VCFEncoder.formatQualValue)."""
    p = tmp_path / "q_in.vcf"
    p.write_text(
        CONTIG
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        + "chr1\t100\t.\tA\tG\t50\tPASS\t.\n"
        + "chr1\t200\t.\tC\tT\t.\tPASS\t.\n"
        + "chr1\t300\t.\tG\tA\t47.5\tPASS\t.\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path)
    quals = {
        l.split("\t")[1]: l.split("\t")[5]
        for l in text.splitlines()
        if not l.startswith("#")
    }
    assert quals == {"100": "50", "200": ".", "300": "47.50"}


def test_min_depth_quality_save_direction(spark, tmp_path):
    """'no/extract depth', 'no/extract min depth', 'no/extract quality'
    adam->htsjdk (suite :850-929): set fields re-emit as DP/MIN_DP/GQ
    cells; null fields leave the key OFF the FORMAT line entirely
    (htsjdk writes keys only when some genotype carries them)."""
    hdr = (
        CONTIG
        + '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
        + '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="">\n'
        + '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="">\n'
        + '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="">\n'
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    )
    p = tmp_path / "md.vcf"
    p.write_text(hdr + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:DP:MIN_DP:GQ\t0/1:20:18:50\n")
    gf = vcf_io.load_vcf(spark, str(p))
    fmt, cell = _fmt_cell(_save_text(gf, tmp_path, "set.vcf"), 100)
    assert cell["DP"] == "20" and cell["MIN_DP"] == "18" and cell["GQ"] == "50"

    # null the three fields -> keys absent on re-save
    mut = gf.df.withColumn(
        "genotypes",
        F.transform(
            "genotypes",
            lambda g: g.withField("readDepth", F.lit(None).cast("int"))
            .withField("minReadDepth", F.lit(None).cast("int"))
            .withField("genotypeQuality", F.lit(None).cast("int")),
        ),
    )
    fmt2, _ = _fmt_cell(
        _save_text(vcf_io.GenomicFrame(mut, gf.meta), tmp_path, "null.vcf"), 100
    )
    for key in ("DP", "MIN_DP", "GQ"):
        assert key not in fmt2.split(":")
