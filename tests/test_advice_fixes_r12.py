"""Round 12 advisor fixes: stale sidecar removal on re-save, stale
part-file cleanup in the single-file merger, htslib metadata pseudo-bin
handling in the splittable BCF scan, and file-order chunk slicing."""

import glob
import os

from adam_spark.sources import vcf as vcf_io
from adam_spark.sources.binned_index import split_chunks_contiguous


def _vcf_text(rows, contig_len=10_000_000):
    lines = [
        "##fileformat=VCFv4.3",
        f"##contig=<ID=chr1,length={contig_len}>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    lines += [f"chr1\t{pos}\t.\tA\tG\t50\tPASS\t." for pos in rows]
    return "\n".join(lines) + "\n"


def test_split_chunks_contiguous():
    chunks = [(i << 16, (i + 1) << 16) for i in range(10)]
    parts = split_chunks_contiguous(chunks, 4)
    assert [c for p in parts for c in p] == chunks  # order preserved
    assert 1 <= len(parts) <= 4
    assert split_chunks_contiguous([], 4) == []
    assert split_chunks_contiguous(chunks, 1) == [chunks]
    # byte-weighted: one giant chunk doesn't drag neighbours with it
    skew = [(0, 1000 << 16)] + [(2000 + i << 16, (2001 + i) << 16) for i in range(6)]
    parts = split_chunks_contiguous(skew, 4)
    assert parts[0][0] == skew[0] and len(parts[0]) <= 2


def test_resave_removes_stale_tbi_and_csi(spark, tmp_path):
    """save_vcf_bgzf flips between .tbi (short contigs) and .csi (past
    2^29); load_indexed_vcf PREFERS .tbi, so a stale sibling from a
    previous save at the same path would serve region queries for old
    data. Both flip directions must remove the other sidecar."""
    from adam_spark.sources.vcf import load_indexed_vcf, save_vcf_bgzf

    short_p = tmp_path / "short.vcf"
    short_p.write_text(_vcf_text([100, 5000, 90_000]))
    long_p = tmp_path / "long.vcf"
    long_pos = (1 << 29) + 12_345
    long_p.write_text(_vcf_text([100, long_pos], contig_len=(1 << 30)))

    gz = str(tmp_path / "x.vcf.gz")
    save_vcf_bgzf(vcf_io.load_vcf(spark, str(short_p)), gz)
    assert os.path.exists(gz + ".tbi") and not os.path.exists(gz + ".csi")

    save_vcf_bgzf(vcf_io.load_vcf(spark, str(long_p)), gz)
    assert os.path.exists(gz + ".csi") and not os.path.exists(gz + ".tbi")
    got = load_indexed_vcf(spark, gz, [("chr1", long_pos - 10, long_pos + 10)])
    assert got.df.count() == 1  # served from the NEW index

    save_vcf_bgzf(vcf_io.load_vcf(spark, str(short_p)), gz)
    assert os.path.exists(gz + ".tbi") and not os.path.exists(gz + ".csi")
    got = load_indexed_vcf(spark, gz, [("chr1", 0, 200)])
    assert got.df.count() == 1


def test_resave_removes_stale_bam_index(spark, tmp_path):
    """Same hazard for save_bam (.bai vs .csi), plus write_index=False
    must clear BOTH stale indexes — the data changed underneath them."""
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.sources.bam import save_bam
    from adam_spark.sources.sam import load_sam

    def _sam(positions, ln):
        lines = ["@HD\tVN:1.6", f"@SQ\tSN:chr1\tLN:{ln}"]
        for i, pos in enumerate(positions):
            lines.append(
                f"r{i}\t0\tchr1\t{pos}\t60\t10M\t*\t0\t0\t{'A' * 10}\t{'I' * 10}"
            )
        return "\n".join(lines) + "\n"

    short_p = tmp_path / "s.sam"
    short_p.write_text(_sam([10, 500, 9_000], 10_000_000))
    long_p = tmp_path / "l.sam"
    long_p.write_text(_sam([10, (1 << 29) + 99], 1 << 30))

    out = str(tmp_path / "x.bam")
    save_bam(load_sam(spark, str(short_p)), out)
    assert os.path.exists(out + ".bai") and not os.path.exists(out + ".csi")
    save_bam(load_sam(spark, str(long_p)), out)
    assert os.path.exists(out + ".csi") and not os.path.exists(out + ".bai")
    save_bam(load_sam(spark, str(short_p)), out)
    assert os.path.exists(out + ".bai") and not os.path.exists(out + ".csi")
    save_bam(load_sam(spark, str(short_p)), out, write_index=False)
    assert not os.path.exists(out + ".bai") and not os.path.exists(out + ".csi")


def test_single_file_save_clears_stale_parts(spark, tmp_path):
    """write_text_single_file over a directory that previously held
    multi-shard output must not leave part-00001+ behind — globbing
    readers would surface stale duplicate rows."""
    from adam_spark.sources.merge import write_text_single_file

    out = str(tmp_path / "out.txt")
    os.makedirs(out)
    for stale in ("part-00000", "part-00001", "part-00002", "_SUCCESS"):
        with open(os.path.join(out, stale), "w") as f:
            f.write("STALE\n")
    df = spark.createDataFrame([("a",), ("b",)], "value string").coalesce(1)
    write_text_single_file(df, out)
    parts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "part-*")))
    assert parts == ["part-00000"]
    assert open(os.path.join(out, "part-00000")).read() == "a\nb\n"


def test_load_bcf_skips_metadata_pseudo_bin(spark, tmp_path):
    """bcftools-style .csi files carry a metadata pseudo-bin (number >
    the scheme's max valid bin) whose two pseudo-chunks encode record
    COUNTS, not byte ranges. The splittable load_bcf path triggers on
    mere .csi existence, so it must skip pseudo-bins instead of
    decoding their values as file offsets."""
    from adam_spark.sources.bcf import load_bcf, save_bcf
    from adam_spark.sources.binned_index import read_csi, write_csi

    p = tmp_path / "v.vcf"
    p.write_text(_vcf_text(list(range(100, 50_000, 250))))
    gf = vcf_io.load_vcf(spark, str(p))
    out = str(tmp_path / "v.bcf")
    save_bcf(gf, out)
    n = gf.df.count()

    # graft an htslib-style pseudo-bin: bin 37450 for the (14,5) scheme,
    # chunks = [(n_mapped, n_unmapped), (garbage voffsets)]
    idx = read_csi(out + ".csi")
    assert (idx.min_shift, idx.depth) == (14, 5)
    idx.refs[0].bins[37450] = [(n, 0), ((1 << 40) | 7, (1 << 41) | 9)]
    write_csi(idx, out + ".csi")

    assert load_bcf(spark, out).df.count() == n


def test_load_bcf_splittable_preserves_file_order(spark, tmp_path):
    """The .csi-splittable load assigns chunk runs to tasks as
    contiguous SLICES: full-file row order is the file's record order
    (the unindexed path's order), not a round-robin interleave —
    order-sensitive downstream single-file saves must not reorder."""
    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.sources.bcf import load_bcf, save_bcf

    p = tmp_path / "v.vcf"
    positions = list(range(100, 400_000, 97))
    p.write_text(_vcf_text(positions))
    gf = vcf_io.load_vcf(spark, str(p))
    df4 = gf.df.repartitionByRange(4, "referenceName", "start").sortWithinPartitions(
        "referenceName", "start"
    )
    out = str(tmp_path / "v.bcf")
    stats = save_bcf(GenomicFrame(df4, gf.meta), out)
    assert stats["shards"] == 4

    loaded = load_bcf(spark, out)
    starts = [r["start"] for r in loaded.df.select("start").collect()]
    assert starts == sorted(starts) == [pos - 1 for pos in positions]
