"""CLI end-to-end tests (reference: adam-cli suites —
TransformAlignmentsSuite, FlagStatSuite, ViewSuite)."""

import os

import pytest

from adam_spark.cli import main

SAM = """@HD\tVN:1.6\tSO:coordinate
@SQ\tSN:chr1\tLN:10000
@RG\tID:rg1\tSM:s1\tLB:lib1
r1\t99\tchr1\t100\t60\t10M\t=\t200\t110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1
r1\t147\tchr1\t200\t60\t10M\t=\t100\t-110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1
r2\t99\tchr1\t100\t60\t10M\t=\t200\t110\tACGTACGTAC\tBBBBBBBBBB\tRG:Z:rg1
r2\t147\tchr1\t200\t60\t10M\t=\t100\t-110\tACGTACGTAC\tBBBBBBBBBB\tRG:Z:rg1
r3\t0\tchr1\t500\t30\t10M\t*\t0\t0\tTTTTGGGGCC\tIIIIIIIIII
r4\t4\t*\t0\t0\t*\t*\t0\t0\tAAAACCCC\tIIIIIIII
"""


@pytest.fixture()
def sam_path(tmp_path):
    f = tmp_path / "in.sam"
    f.write_text(SAM)
    return str(f)


def test_transform_alignments_mark_dups_roundtrip(spark, sam_path, tmp_path):
    out = str(tmp_path / "out.sam")
    rc = main(
        [
            "transform_alignments",
            sam_path,
            out,
            "-mark_duplicate_reads",
            "-sort_by_reference_position",
        ]
    )
    assert rc == 0
    from adam_spark.sources.sam import load_sam

    gf = load_sam(spark, out)
    rows = {(r["readName"], r["readInFragment"]): r for r in gf.df.collect()}
    assert len(rows) == 6
    # r1/r2 are position duplicates; the higher-quality pair (r1, 'I'
    # quals) survives, r2 is flagged
    assert rows[("r2", 0)]["duplicateRead"] is True
    assert rows[("r1", 0)]["duplicateRead"] is False


def test_transform_alignments_to_parquet(spark, sam_path, tmp_path):
    out = str(tmp_path / "out.adam")
    rc = main(["transform_alignments", sam_path, out, "-partition_size", "1000"])
    assert rc == 0
    from adam_spark.sources.parquet import is_partitioned, load_partitioned_parquet

    assert is_partitioned(out)
    gf = load_partitioned_parquet(spark, out, regions=[("chr1", 0, 300)])
    assert gf.df.count() == 4  # r3 at 499 and unmapped r4 pruned
    assert gf.meta.references["chr1"].length == 10000


def test_flagstat_cli(spark, sam_path, capsys):
    rc = main(["flagstat", sam_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "total" in out


def test_view_count(spark, sam_path, capsys):
    rc = main(["view", sam_path, "-f", "64", "-c"])
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith("2")  # two first-of-pair reads


def test_coverage_cli(spark, sam_path, tmp_path):
    out = str(tmp_path / "cov.adam")
    rc = main(["coverage", sam_path, out, "-collapse"])
    assert rc == 0
    from adam_spark.sources.parquet import load_parquet

    cov = load_parquet(spark, out)
    rows = {(r["start"], r["end"]): r["count"] for r in cov.df.collect()}
    assert rows[(99, 109)] == 2.0  # r1+r2 overlap (r2 dup but unmarked here)


def test_count_kmers_cli(spark, sam_path, tmp_path):
    out = str(tmp_path / "kmers")
    rc = main(["count_kmers", sam_path, out, "4"])
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part"):
            lines += open(os.path.join(out, f)).read().splitlines()
    counts = dict(l.split("\t") for l in lines)
    assert counts["ACGT"] >= "1"


def test_transform_features_bed_to_gff3(spark, tmp_path):
    bed = tmp_path / "in.bed"
    bed.write_text("chr1\t10\t20\tfeat1\t5.0\t+\n")
    out = str(tmp_path / "out.gff3")
    rc = main(["transform_features", str(bed), out])
    assert rc == 0
    from adam_spark.sources.features_io import load_gff3

    gf = load_gff3(spark, out)
    r = gf.df.collect()[0]
    assert r["start"] == 10 and r["end"] == 20


def test_merge_shards(spark, tmp_path):
    from adam_spark.sources.merge import merge_shards

    d = tmp_path / "shards"
    d.mkdir()
    (d / "part-00000").write_text("line1\n")
    (d / "part-00001").write_text("line2\n")
    (d / "_SUCCESS").write_text("")
    hdr = tmp_path / "header.txt"
    hdr.write_text("@HD\tVN:1.6\n")
    out = str(tmp_path / "merged.sam")
    rc = main(["merge_shards", str(d), out, "-header", str(hdr)])
    assert rc == 0
    assert open(out).read() == "@HD\tVN:1.6\nline1\nline2\n"


def test_projection(spark, sam_path):
    from adam_spark.sources.sam import load_sam

    gf = load_sam(spark, sam_path)
    p = gf.project("referenceName", "start", "end")
    assert p.df.columns == ["referenceName", "start", "end"]
    assert p.meta.references["chr1"].length == 10000


def test_print_cli(spark, sam_path, tmp_path, capsys):
    out = str(tmp_path / "a.adam")
    assert main(["transform_alignments", sam_path, out]) == 0
    assert main(["print", out, "-limit", "3"]) == 0
    text = capsys.readouterr().out
    assert "readName" in text


def test_adam2fastq(spark, sam_path, tmp_path):
    out = str(tmp_path / "out.fq")
    rc = main(["adam2fastq", sam_path, out, "-sort_by_name", "-write_suffixes"])
    assert rc == 0
    if os.path.isdir(out):
        part = [f for f in os.listdir(out) if f.startswith("part-")][0]
        text = open(os.path.join(out, part)).read()
    else:
        text = open(out).read()
    assert text.startswith("@r1/1\n")
    assert text.count("@r") == 6


def test_transform_fragments_roundtrip(spark, sam_path, tmp_path):
    frag = str(tmp_path / "frags.adam")
    rc = main(["transform_fragments", sam_path, frag])
    assert rc == 0
    out = str(tmp_path / "aligned.adam")
    rc = main(["transform_fragments", frag, out, "-load_as_alignments"])
    assert rc == 0
    from adam_spark.sources.parquet import load_parquet

    gf = load_parquet(spark, out)
    assert gf.df.count() == 6


def test_count_slice_kmers(spark, tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 test\nACGTACGTAC\nGTACGTACGT\n")
    out = str(tmp_path / "kmers.txt")
    rc = main(["count_slice_kmers", str(fa), out, "4"])
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += open(os.path.join(out, f)).read().splitlines()
    counts = dict(l.split("\t") for l in lines)
    assert int(counts["ACGT"]) >= 4


def test_transform_sequences(spark, tmp_path):
    fa = tmp_path / "seqs.fa"
    fa.write_text(">s1\nACGTACGT\n>s2\nTTTTGGGG\n")
    out = str(tmp_path / "seqs.adam")
    rc = main(["transform_sequences", str(fa), out])
    assert rc == 0
    from adam_spark.sources.parquet import load_parquet

    gf = load_parquet(spark, out)
    rows = {r["name"]: r["sequence"] for r in gf.df.collect()}
    assert rows == {"s1": "ACGTACGT", "s2": "TTTTGGGG"}


def test_transform_alignments_predicates_and_layout(spark, sam_path, tmp_path):
    """New TransformAlignments flags drive end-to-end: region predicate,
    aligned-read predicate, limit_projection, repartition/coalesce,
    sort-by-index, cache (TransformAlignments.scala:62-653 surface)."""
    from adam_spark.sources.sam import load_sam

    out = str(tmp_path / "region.sam")
    rc = main([
        "transform_alignments", sam_path, out,
        "-region_predicate", "chr1:90-150",
        "-limit_projection",
        "-repartition", "2",
        "-sort_by_reference_position_and_index",
        "-cache",
        "-coalesce", "1",
    ])
    assert rc == 0
    names = {(r["readName"], r["readInFragment"])
             for r in load_sam(spark, out).df.collect()}
    assert names == {("r1", 0), ("r2", 0)}  # only reads overlapping 90-150

    out2 = str(tmp_path / "aligned.sam")
    rc = main([
        "transform_alignments", sam_path, out2,
        "-aligned_read_predicate",
        "-coalesce", "1", "-force_shuffle_coalesce",
    ])
    assert rc == 0
    rows = load_sam(spark, out2).df.collect()
    assert len(rows) == 5 and all(r["readMapped"] for r in rows)


def test_transform_alignments_concat_and_partitioned_save(spark, sam_path, tmp_path):
    """-concat unions a second input; -partition_by_start_pos writes the
    Hive-partitioned positionBin layout readable by the pruned loader."""
    import shutil

    sam2 = tmp_path / "in2.sam"
    shutil.copy(sam_path, sam2)
    out = str(tmp_path / "part.adam")
    rc = main([
        "transform_alignments", sam_path, out,
        "-concat", str(sam2),
        "-partition_by_start_pos", "-partition_bin_size", "1000",
    ])
    assert rc == 0
    from adam_spark.sources.parquet import is_partitioned, load_parquet

    assert is_partitioned(out)
    gf = load_parquet(spark, out)
    assert gf.df.count() == 12  # 6 reads twice


def test_transform_alignments_realign_knobs_and_stringency(spark, sam_path, tmp_path):
    """Realignment tuning flags parse through to the kernel; a bogus
    -stringency value is rejected."""
    out = str(tmp_path / "realn.sam")
    rc = main([
        "transform_alignments", sam_path, out,
        "-realign_indels",
        "-max_indel_size", "100",
        "-max_consensus_number", "10",
        "-log_odds_threshold", "4.5",
        "-max_target_size", "2000",
        "-max_reads_per_target", "100",
        "-unclip_reads",
        "-stringency", "STRICT",
    ])
    assert rc == 0
    from adam_spark.sources.sam import load_sam

    assert load_sam(spark, out).df.count() == 6

    assert main(["transform_alignments", sam_path, str(tmp_path / "x.sam"),
                 "-stringency", "BOGUS"]) == 2
    assert main(["transform_alignments", sam_path, str(tmp_path / "y.sam"),
                 "-region_predicate", "chr1:0-10",
                 "-aligned_read_predicate"]) == 2


def test_transform_alignments_md_tags(spark, sam_path, tmp_path):
    """-add_md_tags computes mismatchingPositions from a FASTA."""
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\n" + "A" * 10000 + "\n")
    out = str(tmp_path / "md.sam")
    rc = main([
        "transform_alignments", sam_path, out,
        "-add_md_tags", str(fasta), "-md_tag_overwrite",
    ])
    assert rc == 0
    from adam_spark.sources.sam import load_sam

    rows = {r["readName"]: r for r in load_sam(spark, out).df.collect()
            if r["readMapped"]}
    # r3 = TTTTGGGGCC vs all-A reference: every base mismatches → MD '0T...'
    assert rows["r3"]["mismatchingPositions"] is not None


FQ_R1 = "@p1\nACGTACGTAC\n+\nIIIIIIIIII\n@p2\nTTTTGGGGCC\n+\nIIIIIIIIII\n"
FQ_R2 = "@p1\nGGGGCCCCAA\n+\nIIIIIIIIII\n@p2\nAACCGGTTAA\n+\nIIIIIIIIII\n"


def test_ta_paired_fastq_read_group_and_max_length(spark, tmp_path):
    """-paired_fastq / -read_group '' (basename default) /
    -max_read_length (drop under LENIENT, error under STRICT)."""
    r1 = tmp_path / "sampleX.fq"
    r1.write_text(FQ_R1 + "@long1\n" + "A" * 50 + "\n+\n" + "I" * 50 + "\n")
    r2 = tmp_path / "sampleX_2.fq"
    r2.write_text(FQ_R2 + "@long1\n" + "C" * 50 + "\n+\n" + "I" * 50 + "\n")
    out = str(tmp_path / "out.adam")
    rc = main([
        "transform_alignments", str(r1), out,
        "-paired_fastq", str(r2),
        "-read_group", "",
        "-max_read_length", "20",
    ])
    assert rc == 0
    from adam_spark.sources.parquet import load_parquet

    df = load_parquet(spark, out, "alignment").df
    rows = df.collect()
    # 2 pairs survive; the 50bp pair is dropped by -max_read_length
    assert len(rows) == 4
    assert {r["readGroupId"] for r in rows} == {"sampleX"}
    assert {(r["readName"], r["readInFragment"]) for r in rows} == {
        ("p1", 0), ("p1", 1), ("p2", 0), ("p2", 1)
    }
    # STRICT: over-long reads are an error, not a drop
    assert main([
        "transform_alignments", str(r1), str(tmp_path / "strict.adam"),
        "-force_load_fastq", "-max_read_length", "20", "-stringency", "STRICT",
    ]) == 1


def test_ta_force_load_flags(spark, sam_path, tmp_path):
    """-force_load_* bypasses extension dispatch; mutually exclusive."""
    # text SAM under a misleading name, forced through the BAM/SAM path
    weird = tmp_path / "reads.dat"
    weird.write_text(open(sam_path).read())
    out1 = str(tmp_path / "o1.adam")
    assert main(["transform_alignments", str(weird), out1, "-force_load_bam"]) == 0
    from adam_spark.sources.parquet import load_parquet

    assert load_parquet(spark, out1, "alignment").df.count() == 6

    # unpaired FASTQ under .txt
    fq = tmp_path / "reads.txt"
    fq.write_text(FQ_R1)
    out2 = str(tmp_path / "o2.adam")
    assert main(["transform_alignments", str(fq), out2, "-force_load_fastq"]) == 0
    assert load_parquet(spark, out2, "alignment").df.count() == 2

    # interleaved FASTQ under .txt: alternating r1/r2 records pair up
    ifq = tmp_path / "inter.txt"
    ifq.write_text(
        "@p1\nACGTACGTAC\n+\nIIIIIIIIII\n@p1\nGGGGCCCCAA\n+\nIIIIIIIIII\n"
    )
    out3 = str(tmp_path / "o3.adam")
    assert main(["transform_alignments", str(ifq), out3, "-force_load_ifastq"]) == 0
    got = load_parquet(spark, out3, "alignment").df.collect()
    assert {(r["readName"], r["readInFragment"]) for r in got} == {("p1", 0), ("p1", 1)}

    # parquet under a non-.adam name
    out4 = str(tmp_path / "o4.plaindir")
    assert main(["transform_alignments", out1, out4, "-force_load_parquet"]) == 0
    assert load_parquet(spark, out4, "alignment").df.count() == 6

    # at most one force flag
    assert main(["transform_alignments", str(fq), str(tmp_path / "x.adam"),
                 "-force_load_fastq", "-force_load_bam"]) == 2


def test_ta_single_defer_concat_and_pg(spark, sam_path, tmp_path):
    """-single / -defer_merging / -disable_fast_concat / -disable_pg."""
    import glob

    # default single-file SAM carries a fresh @PG line
    out_pg = str(tmp_path / "pg.sam")
    assert main(["transform_alignments", sam_path, out_pg]) == 0
    txt = open(sorted(glob.glob(out_pg + "/part-*"))[0]).read() if os.path.isdir(out_pg) else open(out_pg).read()
    assert "@PG\tID:adam_spark" in txt

    # -disable_pg drops it
    out_npg = str(tmp_path / "npg.sam")
    assert main(["transform_alignments", sam_path, out_npg, "-disable_pg"]) == 0
    txt_npg = open(sorted(glob.glob(out_npg + "/part-*"))[0]).read() if os.path.isdir(out_npg) else open(out_npg).read()
    assert "@PG" not in txt_npg

    # -sharded -single: -single forces the merge back on
    out_s = str(tmp_path / "single.sam")
    assert main(["transform_alignments", sam_path, out_s, "-sharded", "-single"]) == 0
    from adam_spark.sources.sam import load_sam

    assert load_sam(spark, out_s).df.count() == 6

    # -defer_merging leaves unmerged shards even with -single
    out_d = str(tmp_path / "defer.sam")
    assert main(["transform_alignments", sam_path, out_d, "-single",
                 "-defer_merging"]) == 0
    assert os.path.isdir(out_d) and glob.glob(out_d + "/part-*")

    # -disable_fast_concat: serial driver concat — same records as the
    # fast path, one plain file, no leftover shard dir
    out_c = str(tmp_path / "concat.sam")
    assert main(["transform_alignments", sam_path, out_c, "-single",
                 "-disable_fast_concat"]) == 0
    assert os.path.isfile(out_c)
    assert not os.path.exists(str(tmp_path / "concat.shards.sam"))
    keep = ["readName", "readInFragment", "start", "cigar", "sequence"]
    a = {tuple(r) for r in load_sam(spark, out_c).df.select(keep).collect()}
    b = {tuple(r) for r in load_sam(spark, out_s).df.select(keep).collect()}
    assert a == b


def test_ta_sort_fastq_output(tmp_path):
    fq = tmp_path / "in.fq"
    fq.write_text(
        "@zz\nAAAA\n+\nIIII\n@aa\nCCCC\n+\nIIII\n@mm\nGGGG\n+\nIIII\n"
    )
    out = str(tmp_path / "sorted.fq")
    assert main(["transform_alignments", str(fq), out, "-force_load_fastq",
                 "-single", "-sort_fastq_output"]) == 0
    import glob

    path = out if os.path.isfile(out) else sorted(glob.glob(out + "/part-*"))[0]
    names = [l[1:] for l in open(path).read().splitlines() if l.startswith("@")]
    assert names == ["aa", "mm", "zz"]


def test_ta_sampling_storage_and_md_fragments(spark, sam_path, tmp_path):
    """-sampling_fraction/-sampling_seed reach BQSR, -storage_level
    validates, -md_tag_fragment_size tags against bounded slices and
    matches the whole-contig path."""
    out = str(tmp_path / "recal.sam")
    assert main([
        "transform_alignments", sam_path, out,
        "-recalibrate_base_qualities",
        "-sampling_fraction", "1.0", "-sampling_seed", "42",
        "-cache", "-storage_level", "MEMORY_AND_DISK",
    ]) == 0
    from adam_spark.sources.sam import load_sam

    assert load_sam(spark, out).df.count() == 6
    assert main(["transform_alignments", sam_path, str(tmp_path / "x.sam"),
                 "-cache", "-storage_level", "NOT_A_LEVEL"]) == 2

    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\n" + ("ACGT" * 2500) + "\n")
    frag = str(tmp_path / "frag.sam")
    whole = str(tmp_path / "whole.sam")
    assert main(["transform_alignments", sam_path, frag,
                 "-add_md_tags", str(fasta), "-md_tag_overwrite",
                 "-md_tag_fragment_size", "1000"]) == 0
    assert main(["transform_alignments", sam_path, whole,
                 "-add_md_tags", str(fasta), "-md_tag_overwrite"]) == 0
    md_f = {r["readName"]: r["mismatchingPositions"]
            for r in load_sam(spark, frag).df.collect() if r["readMapped"]}
    md_w = {r["readName"]: r["mismatchingPositions"]
            for r in load_sam(spark, whole).df.collect() if r["readMapped"]}
    assert md_f == md_w and md_f["r3"] is not None


def test_ta_reference_refreshes_md_after_realign(spark, sam_path, tmp_path):
    """-reference: realigned reads get MD tags recomputed against the
    reference file (TransformAlignments.scala:125, :280)."""
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\n" + "A" * 10000 + "\n")
    out = str(tmp_path / "realn_md.sam")
    assert main([
        "transform_alignments", sam_path, out,
        "-realign_indels", "-reference", str(fasta),
    ]) == 0
    from adam_spark.sources.sam import load_sam

    rows = {r["readName"]: r for r in load_sam(spark, out).df.collect()
            if r["readMapped"]}
    # r3 = TTTTGGGGCC vs all-A reference: MD must be present and start
    # with a mismatch run
    assert rows["r3"]["mismatchingPositions"] is not None
    assert rows["r3"]["mismatchingPositions"].startswith("0")
