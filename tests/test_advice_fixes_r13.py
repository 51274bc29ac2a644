"""Round-13 advice fixes.

The high item: CSI ``loffset`` must carry htslib semantics — the
forward-filled LINEAR-index minimum over the bin's bottom-left 16 kb
window (htslib ``update_loff``), NOT the min chunk start within the
bin. The latter over-prunes: a record crossing a 16 kb window boundary
is stored in a COARSER (parent) bin, so a query landing in its second
window computes a floor from the deeper bin's own records and discards
(``ve <= floor``) or truncates (``max(vb, floor)``) the spanning
record's chunk even though it overlaps the query.
"""

import pytest

from adam_spark.sources import vcf as vcf_io
from adam_spark.sources.binned_index import (
    new_index,
    read_csi,
    reg2bin,
    voffset,
    write_csi,
)


def _dense_vcf_with_spanning_record(n_rows, sv_pos1, sv_ref_len):
    lines = [
        "##fileformat=VCFv4.3",
        "##contig=<ID=chr1,length=10000000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    rows = [(1 + i * 30, "A") for i in range(n_rows)]
    rows.append((sv_pos1, "A" * sv_ref_len))
    rows.sort()
    for pos1, ref in rows:
        lines.append(f"chr1\t{pos1}\t.\t{ref}\tG\t50\tPASS\tDP=1")
    return "\n".join(lines) + "\n"


def _range4(gf, n=4):
    from adam_spark.core.genomic_frame import GenomicFrame

    df = gf.df.repartitionByRange(
        n, "referenceName", "start"
    ).sortWithinPartitions("referenceName", "start")
    return GenomicFrame(df, gf.meta)


def test_csi_loffset_keeps_window_spanning_record(spark, tmp_path):
    """ADVICE r12 (high): a record whose REF crosses a 16 kb window
    boundary (stored in a parent bin) must survive an indexed query
    that lands in its SECOND window, byte-adjacent records and all."""
    from adam_spark.sources.bcf import load_indexed_bcf, save_bcf

    # SV starts in window 2 (beg 49147 = 3*2^14 - 5) and its 200 bp REF
    # carries it across the window-2/3 boundary into window 3; dense
    # 30 bp-spaced records fill every window so the deepest window-3
    # bin has its own (later) chunk floor
    sv_beg = 3 * (1 << 14) - 5
    p = tmp_path / "span.vcf"
    p.write_text(_dense_vcf_with_spanning_record(4000, sv_beg + 1, 200))
    gf = _range4(vcf_io.load_vcf(spark, str(p)))
    out = str(tmp_path / "span.bcf")
    save_bcf(gf, out)

    # the SV must sit in a coarser-than-leaf bin (it crosses a leaf
    # boundary) — the precondition for the over-pruning bug
    idx = read_csi(out + ".csi")
    sv_bin = reg2bin(sv_beg, sv_beg + 200)
    leaf_base = ((1 << (3 * idx.depth)) - 1) // 7
    assert sv_bin < leaf_base and sv_bin in idx.refs[0].bins

    # query fully inside window 3, overlapping the SV's tail
    regions = [("chr1", 49_200, 49_500)]
    got = sorted(
        (r["start"], r["end"])
        for r in load_indexed_bcf(spark, out, regions).df.collect()
    )
    want = sorted(
        (r["start"], r["end"])
        for r in gf.filter_by_overlapping_regions(regions).df.collect()
    )
    assert (sv_beg, sv_beg + 200) in want  # fixture sanity
    assert got == want


def test_write_csi_loffset_is_linear_floor_forward_filled():
    """Unit pin of the htslib ``update_loff`` semantics: each written
    bin's loffset equals the forward-filled linear-index value at the
    bin's bottom-left window — parent bins included — with leading
    zeros filled from the ref's first chunk offset."""
    idx = new_index(["c1"])
    # record A spans windows 2->3 -> parent bin; B, C start in window 3
    va, vb, vc = voffset(100, 0), voffset(200, 0), voffset(300, 0)
    idx.add_record(0, 49_147, 49_347, va, vb)  # spans 2->3
    idx.add_record(0, 49_400, 49_410, vb, vc)  # leaf bin of window 3
    idx.add_record(0, 49_500, 49_510, vc, voffset(400, 0))

    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".csi")
    os.close(fd)
    try:
        write_csi(idx, path)
        rd = read_csi(path)
    finally:
        os.unlink(path)

    leaf3 = ((1 << 15) - 1) // 7 + 3  # leaf bin of window 3
    parent = reg2bin(49_147, 49_347)
    assert rd.refs[0].loffset[leaf3] == va  # window-3 min is A, not B
    # parent bin's bottom-left window is window 0 (empty) -> leading
    # fill from the ref's first chunk start, never a later record's
    assert rd.refs[0].loffset[parent] == va
    # the floor used for a window-3 query must not discard A's chunk
    assert rd.chunks_for(0, 49_200, 49_500)[0][0] == va


def test_faidx_offsets_are_bytes_not_chars(spark, tmp_path):
    """ADVICE r12 (low): the .fai skip must count UTF-8 BYTES of the
    header line — a non-ASCII description must not shift the offsets
    of every subsequent sequence."""
    import os

    from adam_spark.core.genomic_frame import GenomicFrame
    from adam_spark.sources.fasta import load_fasta_sequences, save_fasta
    from adam_spark.sources.reference_file import IndexedFastaFile

    src = tmp_path / "in.fa"
    src.write_text(
        ">ctg1 homo sapiens ♥ mitochondrion\nACGTACGTAC\n"
        ">ctg2 plain\nTTGGCCAATT\nGGCC\n"
    )
    gf = load_fasta_sequences(spark, str(src))
    gf = GenomicFrame(gf.df.repartition(2), gf.meta)
    out = str(tmp_path / "out.fa")
    save_fasta(gf, out, single_file=True)

    idx = IndexedFastaFile(out)
    assert idx.extract("ctg1", 0, 10) == "ACGTACGTAC"
    assert idx.extract("ctg2", 0, 14) == "TTGGCCAATTGGCC"
    # pin the raw offset math too: seek each .fai offset directly
    part = os.path.join(out, "part-00000")
    raw = open(part, "rb").read()
    seqs = {"ctg1": "ACGTACGTAC", "ctg2": "TTGGCCAATTGGCC"}
    for line in open(part + ".fai"):
        name, _, off, linebases, _ = line.split("\t")
        first = raw[int(off): int(off) + int(linebases)].decode()
        assert first == seqs[name][: int(linebases)], (name, first)


def test_cli_indexed_bam_path_threads_stringency(spark, tmp_path, monkeypatch):
    """ADVICE r12 (low): the -region_predicate indexed-BAM fast path
    must pass -stringency through to the header parse — whether a
    malformed header raises under STRICT must not depend on whether a
    .bai sidecar happens to exist."""
    import os

    import adam_spark.sources.bam as bam_mod
    from adam_spark.cli import main
    from adam_spark.sources.bam import save_bam
    from adam_spark.sources.sam import load_sam

    lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:100000"]
    for i in range(50):
        lines.append(
            f"r{i}\t0\tchr1\t{1 + i * 40}\t60\t10M\t*\t0\t0\t{'A'*10}\t{'I'*10}"
        )
    src = tmp_path / "a.sam"
    src.write_text("\n".join(lines) + "\n")
    bam = str(tmp_path / "a.bam")
    save_bam(load_sam(spark, str(src)), bam)
    assert os.path.exists(bam + ".bai")

    seen = []
    real = bam_mod.load_indexed_bam

    def spy(spark_, path, regions, **kw):
        seen.append(kw.get("stringency"))
        return real(spark_, path, regions, **kw)

    monkeypatch.setattr(bam_mod, "load_indexed_bam", spy)
    out = str(tmp_path / "out.sam")
    rc = main(["transform_alignments", bam, out,
               "-region_predicate", "chr1:100-900", "-single",
               "-stringency", "STRICT"])
    assert rc == 0 and seen == ["STRICT"]

    # and STRICT actually bites through this arm: a malformed @SQ (no
    # SN) must raise on the indexed path exactly as on the full scan
    malformed = ["@HD\tVN:1.6", "@SQ\tLN:100000", "@SQ\tSN:chr1\tLN:100000"]
    from adam_spark.sources.sam import header_metadata_from_lines

    with pytest.raises(ValueError):
        header_metadata_from_lines(malformed, "STRICT")
    from adam_spark.sources.bam import load_indexed_bam

    # load_sam normalizes headers on the way in, so inject the bad @SQ
    # at the header-parse seam the indexed loader actually uses
    real_hdr = bam_mod._read_bam_header_lazy

    def bad_hdr(p, *a, **kw):
        h, names, off, intra = real_hdr(p, *a, **kw)
        return malformed, names, off, intra

    monkeypatch.setattr(bam_mod, "_read_bam_header_lazy", bad_hdr)
    with pytest.raises(ValueError):
        load_indexed_bam(spark, bam, [("chr1", 100, 900)], stringency="STRICT")
    # ...and SILENT (the default) still tolerates it on the same arm
    load_indexed_bam(spark, bam, [("chr1", 100, 900)])


def test_idxstats_fallback_conserves_unlisted_contigs(spark, tmp_path, capsys):
    """ADVICE r12 (low): the idxstats distributed fallback must emit a
    row for reads grouped under a contig ABSENT from the sequence
    dictionary — samtools idxstats totals always sum to the read
    count."""
    from adam_spark.cli import main

    lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:5000"]
    for i in range(6):
        lines.append(
            f"r{i}\t0\tchr1\t{10 + i}\t60\t5M\t*\t0\t0\tAAAAA\tIIIII"
        )
    # three reads on a contig the header does not list
    for i in range(3):
        lines.append(
            f"x{i}\t0\tchrUn\t{10 + i}\t60\t5M\t*\t0\t0\tAAAAA\tIIIII"
        )
    sam = tmp_path / "a.sam"
    sam.write_text("\n".join(lines) + "\n")

    assert main(["idxstats", str(sam)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = {ln.split("\t")[0]: ln.split("\t") for ln in out}
    assert rows["chr1"][2] == "6"
    assert rows["chrUn"][:4] == ["chrUn", "0", "3", "0"]
    total = sum(int(r[2]) + int(r[3]) for r in rows.values())
    assert total == 9 and out[-1].startswith("*\t")


def test_bcf_guesser_rejects_forged_fixed_header():
    """A 2.5M-record sites-only BCF produced a resync false positive:
    with n_sample==0 the fixed-header checks lose their 24-bit
    discriminator, and a forged 32-byte header chained to a clean EOF
    was accepted — decode then crashed on garbage typed values. The
    guesser now walks the candidate's SHARED section (typed
    descriptors, legal types, cursor landing exactly on l_shared) and
    rejects it."""
    import struct

    from adam_spark.sources.bcf import _plausible_bcf_record

    # passes every fixed-field check (l_shared>=24, rid in range, sane
    # pos/rlen, n_allele>=1, n_sample==0, l_indiv==0) but the shared
    # payload is garbage the typed walk cannot parse
    rec = struct.pack("<II", 28, 0)
    rec += struct.pack("<iii", 0, 100, 1)
    rec += struct.pack("<f", 50.0)
    rec += struct.pack("<II", 1 << 16, 0)  # n_allele=1, n_info=0, n_sample=0
    rec += b"\xcc\xcc\xcc\xcc"
    buf = rec + rec  # two forged records ending exactly at EOF
    assert not _plausible_bcf_record(buf, 0, 1, 0)

    # a REAL sites-only record stream is still accepted at its true
    # boundary (and only there) — the walk must never cost recall
    from adam_spark.sources.bcf import _bcf_header_blob, _encode_record

    hdr = [
        "##fileformat=VCFv4.3",
        "##contig=<ID=c1,length=100000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="D">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    _, str_ix, contig_ix, info_types, fmt_types, flag_keys = _bcf_header_blob(
        hdr, None
    )
    data = b""
    bounds = set()
    for i in range(30):
        bounds.add(len(data))
        data += _encode_record(
            f"c1\t{100 + i * 50}\t.\tA\tG\t50\tPASS\tDP={i}",
            str_ix, contig_ix, info_types, fmt_types, flag_keys,
        )
    for off in range(len(data)):
        assert _plausible_bcf_record(data, off, 1, 0) == (off in bounds), off
