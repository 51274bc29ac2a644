"""BAM binary format: pure-Python BGZF + record codec.

The reference reads BAM via hadoop-bam/htsjdk (ADAMContext.loadBam
:2041-2111) and writes via AlignmentDataset.saveAsSam(:810-997,
asSingleFile BAM path). No native codecs exist in this environment, so
this module implements the format directly:

- **BGZF** is a series of gzip members (RFC1952) each carrying a
  ``BC`` extra subfield with the compressed block size; Python's
  ``gzip`` reads concatenated members natively, and the writer emits
  ≤64 KiB blocks plus the fixed 28-byte EOF sentinel.
- **Records** (SAM spec §4.2) decode to SAM text lines and feed the
  existing `sam_lines_to_alignments` parser, so BAM and SAM share one
  column mapping; the encoder walks the same path in reverse.

Scale posture: a single BAM is an inherently sequential container
(records span BGZF blocks, and split-guessing needs the .bai index),
so ingestion streams on the driver into a text staging file and the
engine's parallelism starts at the staged scan — at fleet scale,
parallelism comes from many BAM files (one per sample), each staged
independently. Stage once to (partitioned) Parquet and every
downstream query runs fully parallel.
"""

from __future__ import annotations

import gzip
import os
import re
import struct
import tempfile
import zlib

from pyspark.sql import SparkSession

from adam_spark.core.genomic_frame import GenomicFrame

_SEQ_ALPHABET = "=ACMGRSVTWYHKDBN"
_SEQ_CODE = {c: i for i, c in enumerate(_SEQ_ALPHABET)}
_CIGAR_OPS = "MIDNSHP=X"
_CIGAR_CODE = {c: i for i, c in enumerate(_CIGAR_OPS)}

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


# --- BGZF ------------------------------------------------------------------
def bgzf_decompress(path: str) -> bytes:
    """Whole-file decompression (gzip handles concatenated members)."""
    with gzip.open(path, "rb") as f:
        return f.read()


def bgzf_compress_to(path: str, data: bytes, block_size: int = 60_000) -> None:
    """Write ``data`` as BGZF blocks + EOF sentinel."""
    with open(path, "wb") as out:
        for off in range(0, len(data), block_size):
            chunk = data[off : off + block_size]
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = comp.compress(chunk) + comp.flush()
            # BSIZE = total block length − 1 (SAM spec §4.1):
            # header(12) + extra(6) + payload + crc(4) + isize(4) − 1
            bsize = len(payload) + 25
            block = (
                b"\x1f\x8b\x08\x04"  # magic, deflate, FEXTRA
                + b"\x00\x00\x00\x00"  # mtime
                + b"\x00\xff"  # XFL, OS
                + struct.pack("<H", 6)  # XLEN
                + b"BC"
                + struct.pack("<H", 2)
                + struct.pack("<H", bsize)
                + payload
                + struct.pack("<I", zlib.crc32(chunk) & 0xFFFFFFFF)
                + struct.pack("<I", len(chunk))
            )
            out.write(block)
        out.write(_BGZF_EOF)


# --- decode ----------------------------------------------------------------
def _aux_to_text(buf: bytes, off: int) -> tuple[str, int]:
    tag = buf[off : off + 2].decode()
    t = chr(buf[off + 2])
    off += 3
    if t == "A":
        return f"{tag}:A:{chr(buf[off])}", off + 1
    if t in "cC":
        v = struct.unpack_from("<b" if t == "c" else "<B", buf, off)[0]
        return f"{tag}:i:{v}", off + 1
    if t in "sS":
        v = struct.unpack_from("<h" if t == "s" else "<H", buf, off)[0]
        return f"{tag}:i:{v}", off + 2
    if t in "iI":
        v = struct.unpack_from("<i" if t == "i" else "<I", buf, off)[0]
        return f"{tag}:i:{v}", off + 4
    if t == "f":
        v = struct.unpack_from("<f", buf, off)[0]
        return f"{tag}:f:{v:g}", off + 4
    if t in "ZH":
        end = buf.index(b"\x00", off)
        return f"{tag}:{t}:{buf[off:end].decode()}", end + 1
    if t == "B":
        sub = chr(buf[off])
        n = struct.unpack_from("<I", buf, off + 1)[0]
        off += 5
        fmt, width = {
            "c": ("<b", 1), "C": ("<B", 1), "s": ("<h", 2),
            "S": ("<H", 2), "i": ("<i", 4), "I": ("<I", 4), "f": ("<f", 4),
        }[sub]
        vals = [struct.unpack_from(fmt, buf, off + i * width)[0] for i in range(n)]
        txt = ",".join(f"{v:g}" if sub == "f" else str(v) for v in vals)
        return f"{tag}:B:{sub},{txt}", off + n * width
    raise ValueError(f"unknown BAM aux type {t!r}")


def bam_bytes_to_sam(data: bytes):
    """Decoded BAM stream → (header_lines, iter of SAM body lines)."""
    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream (bad magic)")
    l_text = struct.unpack_from("<i", data, 4)[0]
    text = data[8 : 8 + l_text].decode().rstrip("\x00")
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    ref_names: list[str] = []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, off)[0]
        name = data[off + 4 : off + 4 + l_name - 1].decode()
        off += 4 + l_name + 4
        ref_names.append(name)
    header_lines = [ln for ln in text.splitlines() if ln.startswith("@")]

    def _records():
        pos = off
        n = len(data)
        while pos + 4 <= n:
            block_size = struct.unpack_from("<i", data, pos)[0]
            rec = data[pos + 4 : pos + 4 + block_size]
            pos += 4 + block_size
            (
                ref_id, p0, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
                next_ref, next_pos, tlen,
            ) = struct.unpack_from("<iiBBHHHiiii", rec, 0)
            o = 32
            name = rec[o : o + l_read_name - 1].decode()
            o += l_read_name
            cig = []
            for i in range(n_cigar):
                v = struct.unpack_from("<I", rec, o + i * 4)[0]
                cig.append(f"{v >> 4}{_CIGAR_OPS[v & 0xF]}")
            o += n_cigar * 4
            cigar = "".join(cig) or "*"
            nb = (l_seq + 1) // 2
            seq = "".join(
                _SEQ_ALPHABET[(rec[o + i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF]
                for i in range(l_seq)
            ) or "*"
            o += nb
            quals = rec[o : o + l_seq]
            qual = (
                "*"
                if l_seq == 0 or all(q == 0xFF for q in quals)
                else "".join(chr(q + 33) for q in quals)
            )
            o += l_seq
            tags = []
            while o < len(rec):
                txt, o = _aux_to_text(rec, o)
                tags.append(txt)
            rname = ref_names[ref_id] if ref_id >= 0 else "*"
            if next_ref < 0:
                rnext = "*"
            elif next_ref == ref_id:
                rnext = "="
            else:
                rnext = ref_names[next_ref]
            fields = [
                name or "*", str(flag), rname, str(p0 + 1), str(mapq),
                cigar, rnext, str(next_pos + 1), str(tlen), seq, qual,
            ] + tags
            yield "\t".join(fields)

    return header_lines, _records()


def load_bam(spark: SparkSession, path: str) -> GenomicFrame:
    """BAM → alignments, via a driver-staged SAM text file."""
    from adam_spark.sources.sam import load_sam

    header, records = bam_bytes_to_sam(bgzf_decompress(path))
    stage_dir = tempfile.mkdtemp(prefix="adam_spark_bam_")
    stage = os.path.join(stage_dir, os.path.basename(path) + ".sam")
    with open(stage, "w") as f:
        for ln in header:
            f.write(ln + "\n")
        for ln in records:
            f.write(ln + "\n")
    return load_sam(spark, stage)


def load_indexed_bam(
    spark: SparkSession, path: str, regions: list[tuple[str, int, int]]
) -> GenomicFrame:
    """Region-filtered BAM load (reference: ADAMContext.loadIndexedBam
    :2125-2308, .bai-driven). Staging already decodes the container
    once, so the query-time equivalent is the staged scan plus the
    overlap predicate — the same plan shape the reference's partitioned
    layout produces, with the predicate pushed into the staged scan."""
    return load_bam(spark, path).filter_by_overlapping_regions(regions)


# --- encode ----------------------------------------------------------------
_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def _aux_from_text(field: str) -> bytes:
    tag, t, val = field.split(":", 2)
    tb = tag.encode()
    if t == "A":
        return tb + b"A" + val.encode()
    if t == "i":
        return tb + b"i" + struct.pack("<i", int(val))
    if t == "f":
        return tb + b"f" + struct.pack("<f", float(val))
    if t in ("Z", "H"):
        return tb + t.encode() + val.encode() + b"\x00"
    if t == "B":
        parts = val.split(",")
        sub = parts[0]
        fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I", "f": "<f"}[sub]
        out = tb + b"B" + sub.encode() + struct.pack("<I", len(parts) - 1)
        for p in parts[1:]:
            out += struct.pack(fmt, float(p) if sub == "f" else int(p))
        return out
    raise ValueError(f"unknown SAM tag type {t!r} in {field!r}")


def sam_line_to_bam_record(line: str, ref_index: dict[str, int]) -> bytes:
    f = line.rstrip("\n").split("\t")
    name, flag, rname, pos1, mapq, cigar, rnext, pnext1, tlen, seq, qual = f[:11]
    ref_id = ref_index.get(rname, -1)
    if rnext == "=":
        next_ref = ref_id
    else:
        next_ref = ref_index.get(rnext, -1)
    cig_ops = _CIGAR_RE.findall(cigar) if cigar != "*" else []
    seq_s = "" if seq == "*" else seq
    l_seq = len(seq_s)
    name_b = (name if name != "*" else "").encode() + b"\x00"
    rec = struct.pack(
        "<iiBBHHHiiii",
        ref_id,
        int(pos1) - 1,
        len(name_b),
        int(mapq),
        0,  # bin: optional for readers; htsjdk recomputes on demand
        len(cig_ops),
        int(flag),
        l_seq,
        next_ref,
        int(pnext1) - 1,
        int(tlen),
    )
    rec += name_b
    for n, op in cig_ops:
        rec += struct.pack("<I", (int(n) << 4) | _CIGAR_CODE[op])
    packed = bytearray((l_seq + 1) // 2)
    for i, base in enumerate(seq_s):
        code = _SEQ_CODE.get(base.upper(), 15)  # unknown → N
        packed[i // 2] |= code << (4 if i % 2 == 0 else 0)
    rec += bytes(packed)
    if qual == "*":
        rec += b"\xff" * l_seq
    else:
        rec += bytes(ord(c) - 33 for c in qual)
    for field in f[11:]:
        rec += _aux_from_text(field)
    return struct.pack("<i", len(rec)) + rec


def save_bam(gf: GenomicFrame, path: str) -> None:
    """Alignments → single-file BAM (export job: SAM lines collected to
    the driver and encoded — the same driver boundary as the
    reference's single-file FileMerger concat, util/FileMerger.scala:35)."""
    from adam_spark.sources.sam import sam_body_lines, sam_header_lines

    header = sam_header_lines(gf.meta)
    refs = [r for r in gf.meta.references.references]
    ref_index = {r.name: i for i, r in enumerate(refs)}
    text = "\n".join(header) + "\n"
    out = b"BAM\x01" + struct.pack("<i", len(text)) + text.encode()
    out += struct.pack("<i", len(refs))
    for r in refs:
        nb = r.name.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", r.length or 0)
    body = bytearray()
    for row in sam_body_lines(gf.df).toLocalIterator():
        body += sam_line_to_bam_record(row["value"], ref_index)
    bgzf_compress_to(path, out + bytes(body))
