"""BAM binary codec tests (reference: ADAMContext.loadBam:2041-2111,
AlignmentDatasetSuite round-trip suites — here SAM↔BAM equivalence on
the same fixture)."""

import gzip
import zlib
import struct

import pytest

from adam_spark.sources.bam import (
    bam_bytes_to_sam,
    bgzf_compress_to,
    bgzf_decompress,
    load_bam,
    sam_line_to_bam_record,
    save_bam,
)
from adam_spark.sources.sam import load_sam

SAM = """@HD\tVN:1.6\tSO:coordinate
@SQ\tSN:chr1\tLN:10000
@SQ\tSN:chr2\tLN:5000
@RG\tID:rg1\tSM:s1\tLB:lib1
r1\t99\tchr1\t100\t60\t6M2I2M\t=\t200\t110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1\tMD:Z:8\tNM:i:1
r1\t147\tchr1\t200\t60\t10M\t=\t100\t-110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1\tMD:Z:10
r2\t0\tchr2\t500\t30\t10M\t*\t0\t0\tTTTTGGGGCC\tJJJJJJJJJJ\tXS:f:12.5\tXB:B:i,1,2,3
r3\t4\t*\t0\t0\t*\t*\t0\t0\tAAAACCCC\t*
"""


@pytest.fixture()
def sam_path(tmp_path):
    p = tmp_path / "in.sam"
    p.write_text(SAM)
    return str(p)


def test_bgzf_roundtrip(tmp_path):
    data = b"hello bgzf " * 20_000  # > one 60 KB block
    p = str(tmp_path / "x.bgzf")
    bgzf_compress_to(p, data)
    assert bgzf_decompress(p) == data
    # readable by plain gzip too (BGZF is valid multi-member gzip)
    with gzip.open(p, "rb") as f:
        assert f.read() == data


def test_bgzf_bsize_block_walk(tmp_path):
    """Walk blocks the way htsjdk/samtools do — seek by BSIZE+1 — and
    land exactly on the EOF sentinel. Catches BSIZE off-by-one that
    gzip-stream decompression (which ignores BSIZE) cannot see."""
    from adam_spark.sources.bam import _BGZF_EOF

    data = b"bsize walk " * 30_000  # several 60 KB blocks
    p = str(tmp_path / "x.bgzf")
    bgzf_compress_to(p, data)
    raw = open(p, "rb").read()
    pos = 0
    blocks = 0
    out = b""
    while pos < len(raw):
        assert raw[pos : pos + 4] == b"\x1f\x8b\x08\x04", f"bad magic at {pos}"
        xlen = struct.unpack_from("<H", raw, pos + 10)[0]
        # scan extra subfields for BC
        e, bsize = pos + 12, None
        while e < pos + 12 + xlen:
            si1, si2, slen = raw[e], raw[e + 1], struct.unpack_from("<H", raw, e + 2)[0]
            if bytes((si1, si2)) == b"BC":
                bsize = struct.unpack_from("<H", raw, e + 4)[0]
            e += 4 + slen
        assert bsize is not None
        total = bsize + 1
        block = raw[pos : pos + total]
        # deflate payload sits between header and 8-byte trailer
        payload = block[12 + xlen : -8]
        crc, isize = struct.unpack_from("<II", block, len(block) - 8)
        chunk = zlib.decompress(payload, -15)
        assert len(chunk) == isize
        assert zlib.crc32(chunk) & 0xFFFFFFFF == crc
        out += chunk
        pos += total
        blocks += 1
    assert pos == len(raw)  # BSIZE walk consumed the file exactly
    assert out == data
    assert raw[-28:] == _BGZF_EOF
    assert blocks >= 6  # data blocks + sentinel


def test_record_codec_roundtrip():
    line = "r1\t99\tchr1\t100\t60\t6M2I2M\t=\t200\t110\tACGTACGTAC\tIIIIIIIIII\tRG:Z:rg1\tNM:i:1"
    rec = sam_line_to_bam_record(line, {"chr1": 0})
    # wrap in a minimal BAM stream
    text = "@SQ\tSN:chr1\tLN:10000\n"
    stream = (
        b"BAM\x01"
        + struct.pack("<i", len(text))
        + text.encode()
        + struct.pack("<i", 1)
        + struct.pack("<i", 5)
        + b"chr1\x00"
        + struct.pack("<i", 10000)
        + rec
    )
    header, records = bam_bytes_to_sam(stream)
    assert header == ["@SQ\tSN:chr1\tLN:10000"]
    assert list(records) == [line]


def test_sam_bam_sam_roundtrip(spark, sam_path, tmp_path):
    gf = load_sam(spark, sam_path)
    bam = str(tmp_path / "out.bam")
    save_bam(gf, bam)
    gf2 = load_bam(spark, bam)
    a = {(r["readName"], r["readInFragment"]): r for r in gf.df.collect()}
    b = {(r["readName"], r["readInFragment"]): r for r in gf2.df.collect()}
    assert set(a) == set(b) and len(a) == 4
    for k in a:
        for col in (
            "referenceName", "start", "end", "cigar", "sequence",
            "qualityScores", "mappingQuality", "mismatchingPositions",
            "readGroupId", "mateReferenceName", "mateAlignmentStart",
            "insertSize", "readMapped", "readPaired", "duplicateRead",
        ):
            assert a[k][col] == b[k][col], (k, col, a[k][col], b[k][col])
    # typed aux tags survive
    assert b[("r2", 0)]["attributes"]["XS"] == "f:12.5"
    assert b[("r2", 0)]["attributes"]["XB"] == "B:i,1,2,3"
    # header metadata survives
    assert [r.name for r in gf2.meta.references.references] == ["chr1", "chr2"]
    assert gf2.meta.read_groups[0].library == "lib1"


def test_bam_cli_end_to_end(spark, sam_path, tmp_path):
    from adam_spark.cli import main

    bam = str(tmp_path / "a.bam")
    assert main(["transform_alignments", sam_path, bam]) == 0
    out = str(tmp_path / "b.adam")
    assert main(["transform_alignments", bam, out, "-mark_duplicate_reads"]) == 0
    from adam_spark.sources.parquet import load_parquet

    gf = load_parquet(spark, out)
    rows = {(r["readName"], r["readInFragment"]): r for r in gf.df.collect()}
    assert len(rows) == 4
    assert rows[("r2", 0)]["duplicateRead"] is False


def test_load_indexed_bam(spark, sam_path, tmp_path):
    gf = load_sam(spark, sam_path)
    bam = str(tmp_path / "idx.bam")
    save_bam(gf, bam)
    from adam_spark.sources.bam import load_indexed_bam

    hits = load_indexed_bam(spark, bam, [("chr1", 0, 150)])
    assert [r["readName"] for r in hits.df.collect()] == ["r1"]
