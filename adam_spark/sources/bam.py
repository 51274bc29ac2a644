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

Scale posture: the scan is DISTRIBUTED. The driver does only O(blocks)
work — a BSIZE seek-walk over the 18-byte block headers (no payload
decompression) plus decoding the header blocks — then executors
decompress contiguous block ranges in parallel. Records span block
boundaries, so each non-first range resyncs to the first record
boundary with an htsjdk/hadoop-bam-style plausibility guesser
(`BAMSplitGuesser` semantics: chain-check refID/pos bounds, name
NUL-terminator, section lengths) and every range reads forward past
its end to finish its last spanning record — the same split contract
as Hadoop text splits. Driver memory is O(block index), not O(file).
"""

from __future__ import annotations

import gzip
import os
import re
import struct
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
def bgzf_decompress(path: str, fs=None) -> bytes:
    """Whole-file decompression (gzip handles concatenated members;
    GzipFile streams them LINEARLY — never gzip.decompress, which is
    quadratic in member count)."""
    if fs is None:
        with gzip.open(path, "rb") as f:
            return f.read()
    raw = fs.open_read(path)
    try:
        with gzip.GzipFile(fileobj=raw) as f:
            return f.read()
    finally:
        raw.close()


#: uncompressed bytes per BGZF block. Must stay < 2^16 so intra-block
#: (uoffset) virtual-offset components fit 16 bits; the .bai writer's
#: voffset math assumes exactly this value — change it HERE only.
BGZF_BLOCK_SIZE = 60_000


def bgzf_blocks_bytes(data: bytes, block_size: int = BGZF_BLOCK_SIZE) -> tuple[bytes, list[int]]:
    """BGZF-compress ``data`` (NO EOF sentinel) → (bytes, block offsets
    within the returned stream, plus the end offset). BGZF members
    concatenate, so independently compressed shards join into one valid
    file — the property the parallel writer exploits."""
    out = bytearray()
    offsets: list[int] = []
    for off in range(0, len(data), block_size):
        offsets.append(len(out))
        chunk = data[off : off + block_size]
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(chunk) + comp.flush()
        # BSIZE = total block length − 1 (SAM spec §4.1):
        # header(12) + extra(6) + payload + crc(4) + isize(4) − 1
        bsize = len(payload) + 25
        out += (
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
    offsets.append(len(out))
    return bytes(out), offsets


def bgzf_compress_to(
    path: str, data: bytes, block_size: int = BGZF_BLOCK_SIZE, fs=None
) -> list[int]:
    """Write ``data`` as BGZF blocks + EOF sentinel.

    Returns the compressed file offset of each block PLUS the sentinel
    offset, so callers can map an uncompressed offset ``u`` to a BGZF
    virtual offset: block ``u // block_size`` at intra-offset
    ``u % block_size`` (a ``u`` exactly at the data end maps into the
    empty sentinel block — still a valid virtual offset).
    """
    from adam_spark.sources.filesystem import get_fs

    fs, path = get_fs(path, fs)
    blob, offsets = bgzf_blocks_bytes(data, block_size)
    out = fs.open_write(path)
    try:
        out.write(blob)
        out.write(_BGZF_EOF)
    finally:
        out.close()
    return offsets


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


def _parse_bam_header(data: bytes):
    """Parse the BAM header region from a decoded prefix.

    Returns (header_lines, ref_names, records_offset) or ``None`` when
    ``data`` doesn't yet contain the complete header + reference list.
    """
    if len(data) < 8:
        return None
    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream (bad magic)")
    l_text = struct.unpack_from("<i", data, 4)[0]
    off = 8 + l_text
    if len(data) < off + 4:
        return None
    text = data[8 : 8 + l_text].decode().rstrip("\x00")
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    ref_names: list[str] = []
    for _ in range(n_ref):
        if len(data) < off + 4:
            return None
        l_name = struct.unpack_from("<i", data, off)[0]
        if len(data) < off + 4 + l_name + 4:
            return None
        ref_names.append(data[off + 4 : off + 4 + l_name - 1].decode())
        off += 4 + l_name + 4
    header_lines = [ln for ln in text.splitlines() if ln.startswith("@")]
    return header_lines, ref_names, off


def _record_to_sam_line(rec: bytes, ref_names: list[str]) -> str:
    """One raw BAM record (without the leading block_size) → SAM line."""
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
    return "\t".join(fields)


def bam_bytes_to_sam(data: bytes):
    """Decoded BAM stream → (header_lines, iter of SAM body lines)."""
    parsed = _parse_bam_header(data)
    if parsed is None:
        raise ValueError("truncated BAM stream")
    header_lines, ref_names, off = parsed

    def _records():
        pos = off
        n = len(data)
        while pos + 4 <= n:
            block_size = struct.unpack_from("<i", data, pos)[0]
            rec = data[pos + 4 : pos + 4 + block_size]
            pos += 4 + block_size
            yield _record_to_sam_line(rec, ref_names)

    return header_lines, _records()


# --- distributed scan ------------------------------------------------------
def _block_at(f, off: int) -> tuple[int, int]:
    """Read one BGZF block header at ``off`` → (total_size, xlen)."""
    f.seek(off)
    h = f.read(12)
    if len(h) < 12 or h[:4] != b"\x1f\x8b\x08\x04":
        raise ValueError(f"bad BGZF block magic at offset {off}")
    xlen = struct.unpack_from("<H", h, 10)[0]
    extra = f.read(xlen)
    e, bsize = 0, None
    while e + 4 <= len(extra):
        slen = struct.unpack_from("<H", extra, e + 2)[0]
        if extra[e : e + 2] == b"BC":
            bsize = struct.unpack_from("<H", extra, e + 4)[0]
        e += 4 + slen
    if bsize is None:
        raise ValueError(f"BGZF block at {off} has no BC subfield")
    return bsize + 1, xlen


def bgzf_block_offsets(path: str) -> list[tuple[int, int]]:
    """BSIZE seek-walk → [(compressed_offset, total_size)]. O(blocks)
    driver work, 18-byte header reads only — no payload decompression.

    NOT on the load path: ``load_bam`` generates byte-range splits
    arithmetically and executors resync to block boundaries themselves
    (a full walk would be ~5M serial driver seeks on a 300 GB BAM).
    Kept for tests and small-file tooling."""
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            total, _ = _block_at(f, pos)
            out.append((pos, total))
            pos += total
        if pos != size:
            raise ValueError("BGZF walk overran EOF (corrupt BSIZE chain)")
    return out


def _inflate_block(f, off: int, total: int) -> bytes:
    f.seek(off)
    raw = f.read(total)
    xlen = struct.unpack_from("<H", raw, 10)[0]
    return zlib.decompress(raw[12 + xlen : -8], -15)


def _read_block_fully(f, off: int) -> tuple[int, bytes]:
    """One sequential pass per block: (total_size, inflated bytes).

    ``_block_at`` + ``_inflate_block`` costs two seeks and re-reads the
    header; chunk readers iterating many consecutive blocks (indexed
    access hot path) use this instead — consecutive calls turn the seek
    into a no-op and each byte is read once."""
    f.seek(off)
    h = f.read(12)
    if len(h) < 12 or h[:4] != b"\x1f\x8b\x08\x04":
        raise ValueError(f"bad BGZF block magic at offset {off}")
    xlen = struct.unpack_from("<H", h, 10)[0]
    extra = f.read(xlen)
    e, bsize = 0, None
    while e + 4 <= len(extra):
        slen = struct.unpack_from("<H", extra, e + 2)[0]
        if extra[e : e + 2] == b"BC":
            bsize = struct.unpack_from("<H", extra, e + 4)[0]
        e += 4 + slen
    if bsize is None:
        raise ValueError(f"BGZF block at {off} has no BC subfield")
    total = bsize + 1
    rest = f.read(total - 12 - xlen)
    return total, zlib.decompress(rest[:-8], -15)


def _read_bam_header(path: str, blocks: list[tuple[int, int]]):
    """Decode just enough leading blocks to parse the header.

    Returns (header_lines, ref_names, block_idx, intra_offset): records
    begin ``intra_offset`` bytes into decoded block ``block_idx``.
    """
    data = b""
    ulens: list[int] = []
    with open(path, "rb") as f:
        for off, total in blocks:
            chunk = _inflate_block(f, off, total)
            data += chunk
            ulens.append(len(chunk))
            parsed = _parse_bam_header(data)
            if parsed is not None:
                header_lines, ref_names, rec_off = parsed
                idx = 0
                while idx < len(ulens) and rec_off >= ulens[idx]:
                    rec_off -= ulens[idx]
                    idx += 1
                return header_lines, ref_names, idx, rec_off
    raise ValueError("truncated BAM: header never completed")


def _read_bam_header_lazy(path: str, fs=None):
    """Driver-side header decode with O(header-blocks) I/O.

    Walks the BSIZE chain only until the header parses — never the whole
    file. Returns (header_lines, ref_names, records_off, records_intra):
    records begin ``records_intra`` bytes into the decoded text of the
    block at compressed offset ``records_off``.
    """
    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    data = b""
    walked: list[tuple[int, int]] = []  # (compressed_off, decoded_len)
    size = fs.size(path)
    with fs.open_read(path) as f:
        pos = 0
        while pos < size:
            total, _ = _block_at(f, pos)
            chunk = _inflate_block(f, pos, total)
            data += chunk
            walked.append((pos, len(chunk)))
            pos += total
            parsed = _parse_bam_header(data)
            if parsed is not None:
                header_lines, ref_names, rec_off = parsed
                for off, ulen in walked:
                    if rec_off < ulen:
                        return header_lines, ref_names, off, rec_off
                    rec_off -= ulen
                # records begin exactly at the next block boundary
                return header_lines, ref_names, pos, 0
    raise ValueError("truncated BAM: header never completed")


def _verify_block_chain(f, off: int, fsize: int, chain: int = 3) -> bool:
    """True when ``off`` starts a run of ``chain`` well-formed BGZF blocks
    whose BSIZE chain lands on EOF or further valid magics."""
    try:
        for _ in range(chain):
            if off == fsize:
                return True
            total, _ = _block_at(f, off)
            off += total
            if off > fsize:
                return False
        return True
    except (ValueError, struct.error):
        return False


_BGZF_MAGIC = b"\x1f\x8b\x08\x04"


def _next_block_offset(f, start: int, fsize: int) -> int | None:
    """First verified BGZF block boundary at or after ``start``.

    Executor-side resync (the hadoop-bam guesser shape): a BGZF block is
    at most 64 KiB, so a boundary must occur within 64 KiB of any
    in-body offset; scan a 128 KiB window for the 4-byte magic and
    verify each candidate by walking the BSIZE chain.
    """
    f.seek(start)
    buf = f.read(1 << 17)
    i = 0
    while True:
        j = buf.find(_BGZF_MAGIC, i)
        if j == -1:
            return None
        if _verify_block_chain(f, start + j, fsize):
            return start + j
        i = j + 1


def _plausible_record(buf, off: int, n_ref: int, chain: int = 3, extend=None) -> bool:
    """htsjdk BAMSplitGuesser-style boundary check: a chain of ``chain``
    records must have in-bounds refIDs/positions, a NUL-terminated read
    name, and section lengths that fit inside block_size.

    ``extend``: callback growing ``buf`` with the next block (the lazy
    range reader's machinery). When the chain outruns the buffer the
    check EXTENDS rather than guessing — a blind "cannot disprove →
    True" near the buffer tail would bless garbage offsets inside a
    record that spans the whole range (long-read data) and emit corrupt
    records. A clean stop exactly at EOF after k full records is a real
    boundary; anything else unverifiable is rejected."""

    def need(upto: int) -> bool:
        while upto > len(buf):
            if extend is None or not extend():
                return False
        return True

    for _ in range(chain):
        if off == len(buf) and (extend is None or not extend()):
            return True  # clean record boundary at end of file
        if not need(off + 36):
            return False
        bs = struct.unpack_from("<i", buf, off)[0]
        if bs < 32 or bs > (1 << 26):
            return False
        ref_id, pos, l_read_name = struct.unpack_from("<iiB", buf, off + 4)
        if not (-1 <= ref_id < n_ref) or not (-1 <= pos < (1 << 31) - 1) or l_read_name < 1:
            return False
        n_cigar, _flag, l_seq, next_ref, next_pos = struct.unpack_from(
            "<HHiii", buf, off + 16
        )
        if l_seq < 0 or not (-1 <= next_ref < n_ref) or not (-1 <= next_pos < (1 << 31) - 1):
            return False
        if 32 + l_read_name + 4 * n_cigar + (l_seq + 1) // 2 + l_seq > bs:
            return False
        name_end = off + 4 + 32 + l_read_name - 1
        if not need(name_end + 1):
            return False
        if buf[name_end] != 0:
            return False
        off += 4 + bs
    return True


def _decode_byte_range(
    path: str,
    start: int,
    end: int,
    first_intra: int,
    resync: bool,
    n_ref: int,
    ref_names: list[str],
    fs=None,
):
    """Executor task: decode records STARTING inside byte range [start, end).

    The split is arithmetic — no driver-side block index. With
    ``resync`` the task first finds the block boundary at or after
    ``start`` (:func:`_next_block_offset`), then the first plausible
    record boundary inside it; a block belongs to the task whose range
    contains its starting compressed offset, so ranges that tile the
    file partition both blocks and records exactly. Reads forward past
    the range end (walking the BSIZE chain directly) to finish a
    trailing record that spans into the next range — the Hadoop split
    contract.
    """
    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    fsize = fs.size(path)
    with fs.open_read(path) as f:
        if resync:
            first = _next_block_offset(f, start, fsize)
            if first is None or first >= end:
                return
        else:
            first = start
        data = bytearray()
        next_off = first
        while next_off < end and next_off < fsize:
            total, _ = _block_at(f, next_off)
            data += _inflate_block(f, next_off, total)
            next_off += total
        owned = len(data)
        if owned == 0:
            return

        def extend() -> bool:
            nonlocal next_off
            if next_off >= fsize:
                return False
            total, _ = _block_at(f, next_off)
            data.extend(_inflate_block(f, next_off, total))
            next_off += total
            return True

        pos = first_intra
        if resync:
            # the guesser EXTENDS past the range tail when a candidate
            # chain outruns the buffer — never a blind accept (a record
            # spanning the whole range would otherwise "match" garbage)
            pos = next(
                (o for o in range(owned) if _plausible_record(data, o, n_ref, extend=extend)),
                None,
            )
            if pos is None:
                return
        # working set = the range's decompressed bytes (scan and
        # ownership both need them); the consumed prefix is trimmed so a
        # tail record extending into following blocks doesn't stack the
        # next range's bytes on top of the whole buffer
        trimmed = 0
        while pos < owned:
            if pos - trimmed > (8 << 20):
                cut = pos - trimmed
                del data[: cut]
                trimmed = pos
            while pos - trimmed + 4 > len(data):
                if not extend():
                    if pos - trimmed == len(data):
                        return  # clean EOF
                    raise ValueError("truncated BAM record length")
            bs = struct.unpack_from("<i", data, pos - trimmed)[0]
            while pos - trimmed + 4 + bs > len(data):
                if not extend():
                    raise ValueError("truncated BAM record body")
            p = pos - trimmed
            yield _record_to_sam_line(bytes(data[p + 4 : p + 4 + bs]), ref_names)
            pos += 4 + bs


def _expand_bam_paths(path: str, fs=None) -> list[str] | None:
    """Directory or glob → sorted .bam file list; None for a plain
    single-file path (the common case takes the direct branch)."""
    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    if fs.isdir(path):
        return fs.glob(fs.join(path, "*.bam"))
    if any(c in path for c in "*?["):
        return [p for p in fs.glob(path) if p.lower().endswith(".bam")]
    return None


def load_bam(
    spark: SparkSession, path: str, target_split_bytes: int = 16 << 20,
    stringency: str = "SILENT", fs=None,
) -> GenomicFrame:
    """BAM → alignments via a distributed BGZF block-range scan.

    Reference: ADAMContext.loadBam:2041-2111 (hadoop-bam splittable
    scan). Driver: block-offset walk + header decode only; executors
    decode record ranges in parallel and feed the shared SAM line
    parser, so BAM and SAM share one column mapping.
    """
    from adam_spark.sources.filesystem import LocalFileSystem, get_fs
    from adam_spark.sources.sam import _aligned_with_meta

    # resolved ONCE; the handle rides the task closures so executors
    # read directly from the store (HDFS/S3 via pyarrow.fs)
    fs, path = get_fs(path, fs)
    # globs and directories (ADAMContext.loadBam glob support;
    # ADAMContextSuite "loadBam with a glob" / "with a directory" /
    # "bad glob should fail"): expand, load each file, union records
    # and merge headers
    multi = _expand_bam_paths(path, fs)
    if multi is not None:
        if not multi:
            raise FileNotFoundError(f"no .bam files match {path}")
        gfs = [
            load_bam(spark, p, target_split_bytes, stringency, fs=fs)
            for p in multi
        ]
        df = gfs[0].df
        meta = gfs[0].meta
        for g in gfs[1:]:
            df = df.unionByName(g.df)
            meta = meta.merge(g.meta)
        return GenomicFrame(df, meta)

    if isinstance(fs, LocalFileSystem):
        path = os.path.abspath(path)
    # driver I/O is O(header blocks) + O(splits): header decode walks the
    # BSIZE chain only until the header parses, and the split boundaries
    # are pure arithmetic over the file size — executors resync to block
    # and record boundaries themselves (the earlier full BSIZE walk was
    # ~5M serial driver seeks on a 300 GB BAM before any task launched)
    header_lines, ref_names, records_off, records_intra = _read_bam_header_lazy(
        path, fs
    )
    fsize = fs.size(path)
    tasks = []
    body_bytes = fsize - records_off
    if body_bytes > 0:
        par = spark.sparkContext.defaultParallelism
        n_ranges = max(1, par * 2, body_bytes // target_split_bytes)
        # never more ranges than ~64 KiB each — a range smaller than one
        # BGZF block would mostly resync to nothing
        n_ranges = int(min(n_ranges, max(1, body_bytes // (64 << 10))))
        bounds = [records_off + (body_bytes * i) // n_ranges for i in range(n_ranges + 1)]
        bounds[-1] = fsize
        for i in range(n_ranges):
            if bounds[i] >= bounds[i + 1]:
                continue
            tasks.append(
                dict(
                    path=path,
                    start=bounds[i],
                    end=bounds[i + 1],
                    first_intra=records_intra if i == 0 else 0,
                    resync=i > 0,
                    n_ref=len(ref_names),
                    ref_names=ref_names,
                    fs=fs,
                )
            )
    sc = spark.sparkContext
    rdd = sc.parallelize(tasks, max(1, len(tasks))).flatMap(
        lambda t: _decode_byte_range(**t)
    )
    raw = spark.createDataFrame(rdd.map(lambda ln: (ln,)), "value string")
    return GenomicFrame(
        *_aligned_with_meta(raw, header_lines, stringency)
    )


def _decode_chunk_range(path: str, chunks: list[tuple[int, int]],
                        ref_names: list[str], fs=None):
    """Executor task: decode records from .bai-addressed chunks only."""
    from adam_spark.sources.binned_index import read_chunk_bytes

    for vb, ve in chunks:
        data = read_chunk_bytes(path, vb, ve, fs)
        pos = 0
        while pos + 4 <= len(data):
            bs = struct.unpack_from("<i", data, pos)[0]
            if pos + 4 + bs > len(data):
                break  # chunk ends mid-record only if index is foreign
            yield _record_to_sam_line(data[pos + 4 : pos + 4 + bs], ref_names)
            pos += 4 + bs


def load_indexed_bam(
    spark: SparkSession, path: str, regions: list[tuple[str, int, int]],
    stringency: str = "SILENT", fs=None,
) -> GenomicFrame:
    """Region-filtered BAM load (reference: ADAMContext.loadIndexedBam
    :2125-2308). With a ``.bai`` next to the file (``save_bam`` writes
    one), only the .bai-addressed BGZF chunks overlapping the query
    regions are read and decoded — I/O and decode cost scale with the
    overlap fraction, not the file. Without an index it falls back to
    the distributed full scan plus the overlap predicate."""
    from adam_spark.core.genomic_frame import GenomicFrame as GF
    from adam_spark.sources.filesystem import LocalFileSystem, get_fs
    from adam_spark.sources.sam import _aligned_with_meta

    fs, path = get_fs(path, fs)
    if isinstance(fs, LocalFileSystem):
        path = os.path.abspath(path)
    bai = path + ".bai"
    csi = path + ".csi"
    if not fs.exists(bai) and not fs.exists(csi):
        return load_bam(
            spark, path, stringency=stringency, fs=fs
        ).filter_by_overlapping_regions(regions)

    from adam_spark.sources.binned_index import merge_chunks, read_bai, read_csi

    # .csi is the long-contig fallback save_bam writes past 2^29
    idx = read_bai(bai, fs) if fs.exists(bai) else read_csi(csi, fs)
    header_lines, ref_names, _, _ = _read_bam_header_lazy(path, fs)
    rid = {n: i for i, n in enumerate(ref_names)}
    chunks = merge_chunks(
        [
            c
            for (rname, beg, end) in regions
            if rname in rid
            for c in idx.chunks_for(rid[rname], beg, end)
        ]
    )
    par = spark.sparkContext.defaultParallelism
    # contiguous byte-balanced slices (not strides): partition-index
    # order reproduces file order, so order-sensitive downstream
    # single-file saves keep the record order of the source file
    from adam_spark.sources.binned_index import split_chunks_contiguous

    task_chunks = split_chunks_contiguous(chunks, max(1, min(len(chunks), par * 2)))
    rdd = spark.sparkContext.parallelize(task_chunks, max(1, len(task_chunks))).flatMap(
        lambda t: _decode_chunk_range(path, t, ref_names, fs)
    )
    raw = spark.createDataFrame(rdd.map(lambda ln: (ln,)), "value string")
    gf = GF(*_aligned_with_meta(raw, header_lines, stringency))
    return gf.filter_by_overlapping_regions(regions)


# --- encode ----------------------------------------------------------------
_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def _aux_from_text(field: str) -> bytes:
    tag, t, val = field.split(":", 2)
    tb = tag.encode()
    if t == "A":
        return tb + b"A" + val.encode()
    if t == "i":
        # SAM text folds all BAM int widths into 'i'; pick a width that
        # actually holds the value (uint32 'I' tags decode to text as
        # 'i' with values past 2^31-1 — signed repack would raise)
        v = int(val)
        if -(1 << 31) <= v < (1 << 31):
            return tb + b"i" + struct.pack("<i", v)
        if 0 <= v < (1 << 32):
            return tb + b"I" + struct.pack("<I", v)
        raise ValueError(f"integer tag out of 32-bit range: {field!r}")
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


_CIG_REF_OPS = set("MDN=X")


def _cigar_ref_len(cigar: str) -> int:
    return sum(int(n) for n, op in _CIGAR_RE.findall(cigar) if op in _CIG_REF_OPS)


def _encode_shard(lines, shard_path: str, ref_index: dict[str, int],
                  collect_spans: bool, fs=None):
    """Executor task: SAM lines → one BGZF shard file (no EOF member).

    Returns one tuple: (shard_path, compressed_len, index manifest)
    where the manifest is a :class:`ShardIndexAgg` payload — per-(rid,
    bin) chunk extents + per-16kb-window minima over shard-LOCAL
    virtual offsets, O(bins-touched) not O(records) — which the driver
    prefix-shifts by the shard's global base when it builds the
    .bai/.csi."""
    from adam_spark.sources.binned_index import ShardIndexAgg, voffset

    body = bytearray()
    spans: list[tuple[int, int, int, int, int]] = []
    counts: dict[int, list[int]] = {}  # rid -> [n_mapped, n_unmapped]
    no_coor = 0
    for line in lines:
        u0 = len(body)
        body += sam_line_to_bam_record(line, ref_index)
        if collect_spans:
            f = line.split("\t", 6)
            rid_ = ref_index.get(f[2], -1)
            if rid_ < 0:
                no_coor += 1  # unplaced: the .bai n_no_coor trailer
            else:
                c = counts.setdefault(rid_, [0, 0])
                if int(f[1]) & 0x4:
                    c[1] += 1  # placed-unmapped: counted, not binned
                else:
                    c[0] += 1
                    beg = int(f[3]) - 1
                    end = beg + max(
                        1, _cigar_ref_len(f[5]) if f[5] != "*" else 1
                    )
                    spans.append((rid_, beg, end, u0, len(body)))
    blob, offsets = bgzf_blocks_bytes(bytes(body))
    bs = BGZF_BLOCK_SIZE
    agg = ShardIndexAgg()
    for rid_, beg, end, u0, u1 in spans:
        agg.add(
            rid_, beg, end,
            voffset(offsets[u0 // bs], u0 % bs),
            voffset(offsets[u1 // bs], u1 % bs),
        )
    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    f = fs.open_write(shard_path)
    try:
        f.write(blob)
    finally:
        f.close()
    return (shard_path, len(blob), agg.manifest(), counts, no_coor)


def save_bam(
    gf: GenomicFrame, path: str, write_index: bool = True,
    pg_line: str | None = None, fs=None,
) -> None:
    """Alignments → single-file BAM via PARALLEL shard compression.

    Executors encode and BGZF-compress their partitions into shard
    files (record encoding + deflate is the dominant cost and runs
    fully distributed — BGZF members concatenate, so shards join
    byte-for-byte); the driver writes the header member, appends the
    shards in partition order, and closes with the EOF sentinel — the
    same merge boundary as the reference's FileMerger concat
    (util/FileMerger.scala:35, ParallelFileMerger.scala:34).
    ``write_index`` also emits ``path + ".bai"`` (per-record span
    metadata returns to the driver shifted by each shard's base; skip
    the index for pure-throughput exports)."""
    from adam_spark.sources.filesystem import get_fs
    from adam_spark.sources.sam import sam_body_lines, sam_header_lines

    # resolved ONCE here; the handle rides the task closures so shard
    # bytes stream executor->store directly (HDFS/S3 via pyarrow.fs)
    fs, path = get_fs(path, fs)

    header = sam_header_lines(gf.meta, pg_line=pg_line)
    refs = [r for r in gf.meta.references.references]
    ref_index = {r.name: i for i, r in enumerate(refs)}
    text = "\n".join(header) + "\n"
    out = b"BAM\x01" + struct.pack("<i", len(text)) + text.encode()
    out += struct.pack("<i", len(refs))
    for r in refs:
        nb = r.name.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", r.length or 0)

    shard_dir = path + ".__shards"
    fs.rmtree(shard_dir)
    fs.makedirs(shard_dir)
    try:
        shards = (
            sam_body_lines(gf.df)
            .rdd.map(lambda r: r["value"])
            .mapPartitionsWithIndex(
                lambda i, it: [
                    _encode_shard(
                        it, fs.join(shard_dir, f"part-{i:05d}"), ref_index,
                        write_index, fs,
                    )
                ]
            )
            .collect()
        )
        header_blob, _ = bgzf_blocks_bytes(out)
        from adam_spark.sources.merge import concat_files_parallel

        live = [(sp, m, c, nc) for sp, clen, m, c, nc in shards if clen]
        # shard sizes are known, so output offsets are a prefix sum and
        # the copies run as parallel positioned writes (the reference's
        # ParallelFileMerger, util/ParallelFileMerger.scala:34)
        offsets = concat_files_parallel(
            path, [sp for sp, *_ in live], header_blob, _BGZF_EOF, fs=fs
        )
        bases = list(zip(offsets, (m for _, m, _, _ in live)))
        ref_counts: dict[int, list[int]] = {}
        n_no_coor = 0
        for _, _, c, nc in live:
            n_no_coor += nc
            for r_id, (n_map, n_unmap) in c.items():
                t = ref_counts.setdefault(r_id, [0, 0])
                t[0] += n_map
                t[1] += n_unmap
    finally:
        fs.rmtree(shard_dir)

    if write_index:
        from adam_spark.sources.binned_index import (
            max_bin_coord,
            new_index,
            write_bai,
            write_csi,
        )

        # .bai caps at 2^29; longer contigs (plant genomes) get a
        # depth-scaled .csi instead — htslib's `samtools index -c`
        max_end = max((m[2] for _, m in bases), default=0)
        depth = 5
        while max_bin_coord(14, depth) < max_end and depth < 10:
            depth += 1
        idx = new_index([r.name for r in refs], depth=depth)
        idx.names = []  # .bai/.csi carry no names; contig order = BAM header
        for base, (bins, linear, _, _, _) in bases:
            idx.add_shard(bins, linear, base)
        # htslib metadata pseudo-bins + unplaced trailer: the payload
        # `samtools idxstats` reads without touching the BAM
        for r_id, (n_map, n_unmap) in ref_counts.items():
            idx.set_ref_stats(r_id, n_map, n_unmap)
        idx.n_no_coor = n_no_coor
        # a re-save can flip the index format (short vs long contigs);
        # the reader PREFERS .bai, so a stale sibling from a previous
        # save would silently serve region queries for old data
        if depth == 5:
            if fs.exists(path + ".csi"):
                fs.remove(path + ".csi")
            write_bai(idx, path + ".bai", fs=fs)
        else:
            if fs.exists(path + ".bai"):
                fs.remove(path + ".bai")
            write_csi(idx, path + ".csi", fs=fs)
    else:
        # the data changed; any index from a previous indexed save at
        # this path no longer addresses it
        for stale in (path + ".bai", path + ".csi"):
            if fs.exists(stale):
                fs.remove(stale)
