"""VariantContextConverterSuite residue pass (round 11): the
strand-bias save direction and the per-field ABSENCE battery of the
adam->htsjdk extractor matrix (reference adam-core/src/test/.../
converters/VariantContextConverterSuite.scala, cited per test).

With these, every named per-field extractor test in the suite's
:562-1176 genotype battery is mirrored in some repo vector (most by
the matrix tests in test_vcf_converter_vectors.py and the r9/r10
files; this file closes the last individually-unpinned arms). The two
deliberate deviations stay documented rather than mirrored:
'bad SB strict validation' (:274 — this repo's renderer is
lenient-only by design, the lenient arm is pinned in r9) and
'Number=4 Type=Flag strict' (:1948 — ``ignore``d in the reference
itself)."""

import os

from pyspark.sql import functions as F

from adam_spark.sources import vcf as vcf_io

HEADER = (
    "##fileformat=VCFv4.3\n"
    "##contig=<ID=chr1,length=1000000>\n"
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA12878\n"
)


def _save_text(gf, tmp_path, name="out.vcf"):
    out = str(tmp_path / name)
    vcf_io.save_vcf(gf, out, single_file=True)
    part = [f for f in sorted(os.listdir(out)) if f.startswith("part-")][0]
    return open(os.path.join(out, part)).read()


def test_empty_genotype_save_emits_bare_gt(spark, tmp_path):
    """The eleven 'no X going adam->htsjdk' tests in one vector
    (:832 AD, :867 DP, :884 MIN_DP, :903 GQ, :920 PL, :942 SB,
    :975 phase, :1045 FT, :1109 FS, :1127 MQ, :1145 MQ0): a genotype
    with every optional field null renders a FORMAT of exactly 'GT' —
    no extractor invents a key for an absent field."""
    p = tmp_path / "bare.vcf"
    p.write_text(HEADER + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT\t0/1\n")
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path)
    (line,) = [ln for ln in text.splitlines() if not ln.startswith("#")]
    cols = line.split("\t")
    assert cols[8] == "GT" and cols[9] == "0/1"


def test_strand_bias_save_direction(spark, tmp_path):
    """'extract strand bias going adam->htsjdk' (:959-973): a
    4-component strandBiasComponents vector re-emits as SB=0,10,5,3;
    'no strand bias' (:942) pinned by the bare-GT vector above and the
    null-field mutation here."""
    p = tmp_path / "sb.vcf"
    p.write_text(
        HEADER.replace(
            "#CHROM",
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="">\n'
            '##FORMAT=<ID=SB,Number=4,Type=Integer,Description="">\n#CHROM',
        )
        + "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:SB\t0/1:0,10,5,3\n"
    )
    gf = vcf_io.load_vcf(spark, str(p))
    text = _save_text(gf, tmp_path)
    (line,) = [ln for ln in text.splitlines() if not ln.startswith("#")]
    fk = dict(zip(line.split("\t")[8].split(":"), line.split("\t")[9].split(":")))
    assert fk["SB"] == "0,10,5,3"

    # null the field -> SB key disappears (the 'no strand bias' arm)
    mut = gf.df.withColumn(
        "genotypes",
        F.transform(
            "genotypes",
            lambda g: g.withField(
                "strandBiasComponents", F.lit(None).cast("array<int>")
            ),
        ),
    )
    text2 = _save_text(vcf_io.GenomicFrame(mut, gf.meta), tmp_path, "out2.vcf")
    (line2,) = [ln for ln in text2.splitlines() if not ln.startswith("#")]
    assert "SB" not in line2.split("\t")[8].split(":")


def test_extract_fields_survive_alone(spark, tmp_path):
    """The 'extract X going adam->htsjdk' arms one-field-at-a-time
    (:839 AD, :874 DP, :891 MIN_DP, :910 GQ, :1116 FS, :1134 MQ,
    :1152 MQ0): each field present ALONE emits exactly GT plus its own
    key — no extractor drags a sibling key in."""
    cases = [
        ("AD", "3,6", 'Number=R,Type=Integer'),
        ("DP", "100", 'Number=1,Type=Integer'),
        ("MIN_DP", "1234", 'Number=1,Type=Integer'),
        ("GQ", "10", 'Number=1,Type=Integer'),
        ("FS", "20.0", 'Number=1,Type=Float'),
        ("MQ", "40.0", 'Number=1,Type=Float'),
        ("MQ0", "5", 'Number=1,Type=Integer'),
    ]
    for key, val, decl in cases:
        p = tmp_path / f"one_{key}.vcf"
        p.write_text(
            HEADER.replace(
                "#CHROM",
                f'##FORMAT=<ID={key},{decl},Description="">\n#CHROM',
            )
            + f"chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:{key}\t0/1:{val}\n"
        )
        gf = vcf_io.load_vcf(spark, str(p))
        text = _save_text(gf, tmp_path, f"out_{key}.vcf")
        (line,) = [ln for ln in text.splitlines() if not ln.startswith("#")]
        fmt = line.split("\t")[8].split(":")
        cell = dict(zip(fmt, line.split("\t")[9].split(":")))
        assert fmt == ["GT", key], (key, fmt)
        assert cell[key] == val
