"""BCFv2.2 reader — the binary VCF encoding (BGZF-framed or raw).

Reference relationship: ADAMContextSuite carries two BCF fixtures and
two tests pinning ``loadVcf(path.bcf).count === 7`` — both marked
``ignore`` because htsjdk cannot read them (htsjdk issue #507), so the
reference has NO working BCF path. This reader decodes BCFv2.2
natively (pure stdlib struct over the BGZF/gzip stream) and re-renders
records as VCF text lines, so the battle-tested text parser
(``vcf_lines_to_contexts``) supplies identical conversion semantics —
the engine passes the tests the reference itself skips.

Layout (hts-specs VCFv4.x §6 "BCF"): magic ``BCF\\x02\\x02``, uint32
header-text length, the full VCF header text (FILTER/INFO/FORMAT/contig
lines carry explicit ``IDX=`` dictionary indices), then records of
(l_shared, l_indiv) byte blocks. Values use the "typed" encoding: one
descriptor byte (low nibble = type, high nibble = count, 15 = count in
a following typed int). GT cells are ints encoding
``(allele + 1) << 1 | phased``.

Scale shape: the scan is SPLITTABLE in every BGZF case — arithmetic
ranges over the compressed bytes; tasks resync to a BGZF block
boundary and then to a record boundary with a BAMSplitGuesser-style
chain check (:func:`_plausible_bcf_record`). A ``.csi`` sidecar
(written by :func:`save_bcf`) serves :func:`load_indexed_bcf`'s
region queries only — full scans measured FASTER on the arithmetic
split than on the index's chunk cover (MEASURED.md r13). Only a RAW
(uncompressed) BCF decodes in one task. The header reads
driver-side, O(header bytes).
"""

from __future__ import annotations

import struct

from pyspark.sql import SparkSession

from adam_spark.core.genomic_frame import GenomicFrame

#: missing / end-of-vector sentinels per integer width; floats use the
#: SIGNALING-NaN payloads 0x7F800001 / 0x7F800002, which are handled
#: at the raw-bits level everywhere (a pass through a Python double
#: quiets them into different bit patterns)
_INT_MISSING = {1: -0x80, 2: -0x8000, 3: -0x80000000}
_INT_EOV = {1: -0x7F, 2: -0x7FFF, 3: -0x7FFFFFFF}


def _read_typed_desc(data: bytes, pos: int) -> tuple[int, int, int]:
    b = data[pos]
    pos += 1
    t, n = b & 0x0F, b >> 4
    if n == 15:
        n, pos = _read_typed_scalar_int(data, pos)
    return t, n, pos


def _read_vals(data: bytes, pos: int, t: int, n: int):
    if t == 0:
        return [], pos
    if t == 1:
        return list(struct.unpack_from(f"<{n}b", data, pos)), pos + n
    if t == 2:
        return list(struct.unpack_from(f"<{n}h", data, pos)), pos + 2 * n
    if t == 3:
        return list(struct.unpack_from(f"<{n}i", data, pos)), pos + 4 * n
    if t == 5:
        # floats surface as RAW uint32 bits: the missing/EOV sentinels
        # are SIGNALING-NaN payloads (0x7F80000{1,2}) that a pass
        # through a Python double would quiet into different bits
        return list(struct.unpack_from(f"<{n}I", data, pos)), pos + 4 * n
    if t == 7:
        # fixed-width char vectors pad with NULs (htslib convention)
        return [data[pos : pos + n].decode().rstrip("\x00")], pos + n
    raise ValueError(f"unsupported BCF value type {t}")


def _read_typed_scalar_int(data: bytes, pos: int) -> tuple[int, int]:
    t, n, pos = _read_typed_desc(data, pos)
    vals, pos = _read_vals(data, pos, t, n)
    return vals[0], pos


def _bcf_payload(raw: bytes) -> bytes:
    """Raw file bytes → uncompressed BCF stream (BGZF is multi-member
    gzip; an uncompressed .bcf starts with the magic directly)."""
    if raw[:2] == b"\x1f\x8b":
        import gzip

        raw = gzip.decompress(raw)
    if raw[:5] != b"BCF\x02\x02":
        raise ValueError(
            f"not a BCFv2.2 stream (magic {raw[:5]!r}); BCFv2.1 and"
            " plain VCF are handled by load_vcf"
        )
    return raw


def bcf_header_text(raw: bytes) -> str:
    data = _bcf_payload(raw)
    l_text = struct.unpack_from("<I", data, 5)[0]
    return data[9 : 9 + l_text].rstrip(b"\x00").decode()


def _dictionaries(header_text: str):
    """IDX-keyed string + contig dictionaries (BCF headers written by
    htslib always annotate IDX; fall back to declaration order)."""
    str_dict: dict[int, str] = {}
    contig_dict: dict[int, str] = {}
    next_implicit = 1  # 0 is reserved for PASS (htslib pre-occupies it)
    for line in header_text.splitlines():
        if line.startswith("##contig=<"):
            fields = dict(
                kv.split("=", 1)
                for kv in line[len("##contig=<") : -1].split(",")
                if "=" in kv
            )
            contig_dict[int(fields.get("IDX", len(contig_dict)))] = fields["ID"]
        elif line.startswith(("##FILTER=<", "##INFO=<", "##FORMAT=<")):
            body = line.split("<", 1)[1][:-1]
            fields = dict(
                kv.split("=", 1)
                for kv in body.split(",")
                if "=" in kv and not kv.startswith("Description")
            )
            if "ID" in fields:
                if "IDX" in fields:
                    idx = int(fields["IDX"])
                else:
                    # implicit dictionary: first occurrence of each ID
                    # in declaration order, counting up from 1 — PASS
                    # always maps to 0 whether or not (and wherever)
                    # it is declared, exactly htslib's bcf_hdr_sync
                    if fields["ID"] in str_dict.values():
                        continue
                    if fields["ID"] == "PASS":
                        idx = 0
                    else:
                        idx = next_implicit
                        next_implicit += 1
                str_dict.setdefault(idx, fields["ID"])
    str_dict.setdefault(0, "PASS")
    return str_dict, contig_dict


def _fmt_float(x: float) -> str:
    """float32 → shortest round-trip text (htslib prints %g-shortest;
    numpy's float32 repr is the shortest string that reparses)."""
    import numpy as np

    return str(np.float32(x))


def _render_value(t: int, vals: list) -> str:
    """One INFO value vector → VCF text ('.' per missing element,
    end-of-vector truncates)."""
    out = []
    for v in vals:
        if t in (1, 2, 3):
            if v == _INT_EOV[t]:
                break
            out.append("." if v == _INT_MISSING[t] else str(v))
        elif t == 5:
            if v == 0x7F800002:
                break
            out.append(
                "."
                if v == 0x7F800001
                else _fmt_float(struct.unpack("<f", struct.pack("<I", v))[0])
            )
        else:
            out.append(v)
    return ",".join(out)


def _render_gt(vals: list[int], t: int) -> str:
    parts, seps = [], []
    for i, v in enumerate(vals):
        if v == _INT_EOV.get(t, -0x7F):
            break
        if v in (0, _INT_MISSING.get(t, -0x80)):
            allele = "."
        else:
            allele = str((v >> 1) - 1)
        if i > 0:
            seps.append("|" if v & 1 else "/")
        parts.append(allele)
    if all(p == "." for p in parts):
        return "/".join(["."] * len(parts)) if len(parts) > 1 else "."
    out = parts[0]
    for sep, p in zip(seps, parts[1:]):
        out += sep + p
    return out


def _flag_keys(header_text: str) -> set[str]:
    return {
        line.split("<ID=", 1)[1].split(",", 1)[0]
        for line in header_text.splitlines()
        if line.startswith("##INFO=<") and "Type=Flag" in line
    }


def bcf_records_to_vcf_lines(raw: bytes) -> list[str]:
    """Decode every BCF record into an equivalent VCF body line."""
    data = _bcf_payload(raw)
    l_text = struct.unpack_from("<I", data, 5)[0]
    header_text = data[9 : 9 + l_text].rstrip(b"\x00").decode()
    str_dict, contig_dict = _dictionaries(header_text)
    return _records_from_buffer(
        data, 9 + l_text, len(data), str_dict, contig_dict, _flag_keys(header_text)
    )


def _records_from_buffer(
    data: bytes,
    pos: int,
    end: int,
    str_dict: dict[int, str],
    contig_dict: dict[int, str],
    flag_keys: set[str],
) -> list[str]:
    """Decode the records in ``data[pos:end]`` (which must start at a
    record boundary — the whole body, or a .csi-addressed chunk) into
    VCF body lines."""
    lines: list[str] = []
    while pos + 8 <= end:
        l_shared, l_indiv = struct.unpack_from("<II", data, pos)
        pos += 8
        shared_end = pos + l_shared
        rid, p0, _rlen = struct.unpack_from("<iii", data, pos)
        qual_bits = struct.unpack_from("<I", data, pos + 12)[0]
        qual = struct.unpack_from("<f", data, pos + 12)[0]
        n_allele_info = struct.unpack_from("<I", data, pos + 16)[0]
        n_info, n_allele = n_allele_info & 0xFFFF, n_allele_info >> 16
        n_fmt_sample = struct.unpack_from("<I", data, pos + 20)[0]
        n_sample, n_fmt = n_fmt_sample & 0xFFFFFF, n_fmt_sample >> 24
        p = pos + 24

        t, n, p = _read_typed_desc(data, p)
        v, p = _read_vals(data, p, t, n)
        vid = v[0] if v and v[0] else "."
        alleles = []
        for _ in range(n_allele):
            t, n, p = _read_typed_desc(data, p)
            v, p = _read_vals(data, p, t, n)
            alleles.append(v[0])
        t, n, p = _read_typed_desc(data, p)
        filt_ix, p = _read_vals(data, p, t, n)
        info_parts = []
        for _ in range(n_info):
            k, p = _read_typed_scalar_int(data, p)
            t, n, p = _read_typed_desc(data, p)
            v, p = _read_vals(data, p, t, n)
            key = str_dict[k]
            if key in flag_keys or t == 0:
                info_parts.append(key)
            else:
                info_parts.append(f"{key}={_render_value(t, v)}")

        fmt_keys: list[str] = []
        sample_cells: list[list[str]] = [[] for _ in range(n_sample)]
        p2 = shared_end
        for _ in range(n_fmt):
            k, p2 = _read_typed_scalar_int(data, p2)
            t, n, p2 = _read_typed_desc(data, p2)
            key = str_dict[k]
            fmt_keys.append(key)
            for s in range(n_sample):
                v, p2 = _read_vals(data, p2, t, n)
                if key == "GT":
                    sample_cells[s].append(_render_gt(v, t))
                else:
                    sample_cells[s].append(_render_value(t, v) or ".")

        ref = alleles[0] if alleles else "."
        alt = ",".join(alleles[1:]) if len(alleles) > 1 else "."
        qual_s = "." if qual_bits == 0x7F800001 else _fmt_float(qual)
        if not filt_ix:
            filt_s = "."
        else:
            filt_s = ";".join(str_dict[i] for i in filt_ix)
        cols = [
            contig_dict.get(rid, str(rid)),
            str(p0 + 1),
            vid,
            ref,
            alt,
            qual_s,
            filt_s,
            ";".join(info_parts) or ".",
        ]
        if fmt_keys:
            cols.append(":".join(fmt_keys))
            cols.extend(":".join(c) for c in sample_cells)
        lines.append("\t".join(cols))
        pos = shared_end + l_indiv
    return lines


#: byte width per BCF typed-value type (0 missing, ints, float, char)
_TYPE_WIDTH = {0: 0, 1: 1, 2: 2, 3: 4, 5: 4, 7: 1}


def _shared_walk_ok(buf, p: int, end: int, n_allele: int, n_info: int,
                    str_dict=None) -> bool:
    """Walk a candidate record's SHARED section typed values (ID,
    alleles, FILTER vector, INFO pairs) and require the cursor to land
    EXACTLY on the section end — the decisive resync check for
    sites-only files, where n_sample==0 leaves the fixed-header test
    without its 24-bit discriminator (measured: a 2.5M-record
    sites-only BCF produced a false 3-chain that the fixed checks
    alone accepted, crashing the decode downstream). A misaligned
    offset that forges a sane 32-byte header still has to produce a
    legal typed-descriptor walk whose lengths sum to l_shared.
    ``str_dict`` (when given) additionally pins FILTER/INFO keys to
    real dictionary indices."""
    try:
        t, n, p = _read_typed_desc(buf, p)  # ID: char vector
        if t not in (0, 7):
            return False
        p += n * _TYPE_WIDTH[t]
        for _ in range(n_allele):
            t, n, p = _read_typed_desc(buf, p)
            if t not in (0, 7) or p + n > end:
                return False
            p += n
        t, n, p = _read_typed_desc(buf, p)  # FILTER: int vector
        if t not in (0, 1, 2, 3) or p + n * _TYPE_WIDTH[t] > end:
            return False
        if t:
            vals, p = _read_vals(buf, p, t, n)
            if str_dict is not None and any(v not in str_dict for v in vals):
                return False
        for _ in range(n_info):
            k, p = _read_typed_scalar_int(buf, p)
            if str_dict is not None and k not in str_dict:
                return False
            t, n, p = _read_typed_desc(buf, p)
            if t not in _TYPE_WIDTH:
                return False
            p += n * _TYPE_WIDTH[t]
            if p > end:
                return False
        return p == end
    except (struct.error, IndexError, ValueError):
        return False


def _plausible_bcf_record(
    buf, off: int, n_contigs: int, n_samples: int, chain: int = 3,
    extend=None, str_dict=None,
) -> bool:
    """BCF record-boundary check, the BAMSplitGuesser shape
    (bam._plausible_record): a chain of ``chain`` records must carry
    sane section lengths, an in-bounds contig id/position, ≥1 allele,
    and — the strongest discriminator — a sample count EQUAL to the
    header's (htslib requires every record to carry it). ``extend``
    grows ``buf`` with the next block when the chain outruns it; a
    clean stop exactly at EOF is a real boundary, anything else
    unverifiable is rejected (never a blind accept).

    Worst-case resync cost per task (r12 verdict item 7): the caller
    probes offsets 0..owned-1; each probe is O(chain)=3 fixed-size
    header reads against the SHARED task buffer, and ``extend`` grows
    that buffer monotonically — extension bytes are paid ONCE across
    all probes, not per probe. The l_shared/l_indiv < 2^26 caps bound
    any single chain's span at chain × (8 + 2·2^26) ≈ 400 MB, so even
    adversarial bytes that pass the 32-byte header checks at every
    offset cost at most O(owned) struct reads + one ≤400 MB buffer
    extension per task; real data rejects almost every offset at the
    first read (a false positive needs a 24-bit sample-count
    coincidence AND in-range section lengths AND a valid rid), so the
    measured cost is a handful of probes past the first block
    boundary."""

    def need(upto: int) -> bool:
        while upto > len(buf):
            if extend is None or not extend():
                return False
        return True

    for _ in range(chain):
        if off == len(buf) and (extend is None or not extend()):
            return True  # clean record boundary at end of file
        if not need(off + 32):
            return False
        l_shared, l_indiv = struct.unpack_from("<II", buf, off)
        if l_shared < 24 or l_shared > (1 << 26) or l_indiv > (1 << 26):
            return False
        rid, pos, rlen = struct.unpack_from("<iii", buf, off + 8)
        if not (0 <= rid < n_contigs) or not (-1 <= pos < (1 << 31) - 1) or rlen < 0:
            return False
        n_allele_info, n_fmt_sample = struct.unpack_from("<II", buf, off + 24)
        n_sample, n_fmt = n_fmt_sample & 0xFFFFFF, n_fmt_sample >> 24
        if (n_allele_info >> 16) < 1 or n_sample != n_samples:
            return False
        if n_sample == 0 and (n_fmt or l_indiv):
            return False
        # the fixed header can be forged by chance (especially at
        # n_samples==0 — no 24-bit discriminator); require the shared
        # section's typed walk to land exactly on its end
        if not need(off + 8 + l_shared):
            return False
        if not _shared_walk_ok(
            buf, off + 32, off + 8 + l_shared,
            n_allele_info >> 16, n_allele_info & 0xFFFF, str_dict,
        ):
            return False
        off += 8 + l_shared + l_indiv
    return True


def _bcf_body_start(path: str, fs=None) -> tuple[int, int] | None:
    """Driver-side, O(header blocks): (compressed block offset,
    intra-block offset) where the record stream begins in a
    BGZF-framed BCF — the split arithmetic's origin. ``None`` when the
    file is not BGZF (raw BCF stays a single decode task)."""
    from adam_spark.sources.bam import _read_block_fully

    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    with fs.open_read(path) as f:
        if f.read(2) != b"\x1f\x8b":
            return None
        fsize = fs.size(path)
        buf = bytearray()
        off = cum = 0
        l_text = None
        while off < fsize:
            total, data = _read_block_fully(f, off)
            if l_text is None:
                buf += data
                if len(buf) >= 9:
                    if buf[:5] != b"BCF\x02\x02":
                        raise ValueError(f"{path} is not a BCFv2.2 stream")
                    l_text = struct.unpack_from("<I", buf, 5)[0]
            if l_text is not None:
                target = 9 + l_text
                if cum + len(data) > target:
                    return (off, target - cum)
                if cum + len(data) == target:
                    return (off + total, 0)  # body starts at next block
            cum += len(data)
            off += total
    return (off, 0)  # header-only file: empty body at EOF


def _decode_bcf_byte_range(
    path: str,
    start: int,
    end: int,
    first_intra: int,
    resync: bool,
    n_contigs: int,
    n_samples: int,
    str_dict: dict[int, str],
    contig_dict: dict[int, str],
    flags: set[str],
    fs=None,
):
    """Executor task: decode BCF records STARTING inside compressed
    byte range [start, end) — the bam._decode_byte_range contract:
    resync to the first BGZF block at/after ``start``, then to the
    first plausible record boundary; read forward past the range end to
    finish a trailing record that spans into the next range."""
    from adam_spark.sources.bam import _block_at, _inflate_block, _next_block_offset

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
            pos = next(
                (
                    o
                    for o in range(owned)
                    if _plausible_bcf_record(
                        data, o, n_contigs, n_samples, extend=extend,
                        str_dict=str_dict,
                    )
                ),
                None,
            )
            if pos is None:
                return
        trimmed = 0
        while pos < owned:
            if pos - trimmed > (8 << 20):
                del data[: pos - trimmed]
                trimmed = pos
            while pos - trimmed + 8 > len(data):
                if not extend():
                    if pos - trimmed == len(data):
                        return  # clean EOF
                    raise ValueError("truncated BCF record header")
            l_shared, l_indiv = struct.unpack_from("<II", data, pos - trimmed)
            rec_len = 8 + l_shared + l_indiv
            while pos - trimmed + rec_len > len(data):
                if not extend():
                    raise ValueError("truncated BCF record body")
            p = pos - trimmed
            yield from _records_from_buffer(
                bytes(data[p : p + rec_len]), 0, rec_len,
                str_dict, contig_dict, flags,
            )
            pos += rec_len


def _bcf_header_driver_side(path: str, fs=None):
    """Driver-side header read, O(header bytes): (header_text, parsed
    header lines, refs, sample names) — the IDX= dictionary annotations
    strip off the text header exactly as htsjdk does on read.

    STREAMS through ``gzip.GzipFile`` (lazy multi-member reader) and
    reads exactly magic + l_text bytes. The earlier probe-then-
    ``gzip.decompress``-the-whole-file fallback was QUADRATIC in BGZF
    member count (``gzip.decompress`` re-slices the remaining buffer
    once per member: ~14 MB/s measured on a 26 MB BCF, minutes on a
    100 MB one) — a driver stall that grew with file size on any file
    whose 1 MB probe raised."""
    import gzip as _gzip
    import re

    from adam_spark.sources.vcf import _header_from_lines, mix_header_lines

    if fs is None:
        from adam_spark.sources.filesystem import LocalFileSystem

        fs = LocalFileSystem()
    with fs.open_read(path) as f:
        probe = f.read(2)
        f.seek(0)
        src = _gzip.GzipFile(fileobj=f) if probe == b"\x1f\x8b" else f
        magic = src.read(5)
        if magic != b"BCF\x02\x02":
            raise ValueError(
                f"not a BCFv2.2 stream (magic {magic!r}); BCFv2.1 and"
                " plain VCF are handled by load_vcf"
            )
        (l_text,) = struct.unpack("<I", src.read(4))
        header_text = src.read(l_text).rstrip(b"\x00").decode()
    header_lines_raw = [
        re.sub(r",IDX=\d+(?=[,>])", "", ln) for ln in header_text.splitlines()
    ]
    header_lines, refs, sample_names = _header_from_lines(header_lines_raw)
    return header_text, mix_header_lines(header_lines), refs, sample_names


def load_bcf(
    spark: SparkSession, path: str, target_split_bytes: int = 16 << 20,
    fs=None,
) -> GenomicFrame:
    """BCFv2.2 → variant contexts, through the shared text parser.

    The scan is SPLITTABLE in every BGZF case, indexed or not: the
    split is ARITHMETIC over the compressed bytes (the load_bam
    shape) — tasks resync to a BGZF block boundary, then to the first
    plausible record boundary (:func:`_plausible_bcf_record` — the
    BAMSplitGuesser chain check over l_shared/l_indiv/rid/pos/
    n_sample plus a typed walk of the shared section) and decode
    records starting inside their range, reading past the range end
    for a trailing spanning record. A ``.csi`` sidecar is NOT
    consulted for full scans (it serves :func:`load_indexed_bcf`'s
    region queries): a position-sorted save's merged chunk cover is
    ~one chunk per shard, capping an indexed full scan at shard-count
    tasks, and the r13 interleaved A/B on a 105 MB / 10M-record file
    measured the index-cover path 2.3-6× SLOWER than the arithmetic
    split at equal task counts (full-chunk buffering vs streaming
    block decode; MEASURED.md) — the same reason load_bam never
    consults the .bai for full scans. Only a RAW (uncompressed) BCF
    falls back to one decode task."""
    import os

    from adam_spark.sources.filesystem import LocalFileSystem, get_fs
    from adam_spark.sources.vcf import vcf_lines_to_contexts

    # resolved ONCE; the handle rides the task closures so executors
    # read directly from the store (HDFS/S3 via pyarrow.fs)
    fs, path = get_fs(path, fs)
    header_text, header_lines, refs, sample_names = _bcf_header_driver_side(
        path, fs
    )
    sc = spark.sparkContext
    apath = os.path.abspath(path) if isinstance(fs, LocalFileSystem) else path

    body_start = _bcf_body_start(apath, fs)
    str_dict, contig_dict = _dictionaries(header_text)
    if body_start is None or not contig_dict:
        # raw uncompressed BCF (or no contigs → no records): one task
        def _raw_lines(p):
            with fs.open_read(p) as rf:
                return bcf_records_to_vcf_lines(rf.read())

        rdd = sc.parallelize([apath], 1).flatMap(_raw_lines)
    else:
        flags = _flag_keys(header_text)
        n_contigs = max(contig_dict) + 1
        n_samples = len(sample_names)
        records_off, records_intra = body_start
        fsize = fs.size(apath)
        body_bytes = fsize - records_off
        tasks = []
        if body_bytes > 0:
            par = sc.defaultParallelism
            n_ranges = max(1, par * 2, body_bytes // target_split_bytes)
            # never more ranges than ~64 KiB each — a range smaller
            # than one BGZF block would mostly resync to nothing
            n_ranges = int(min(n_ranges, max(1, body_bytes // (64 << 10))))
            bounds = [
                records_off + (body_bytes * i) // n_ranges
                for i in range(n_ranges + 1)
            ]
            bounds[-1] = fsize
            for i in range(n_ranges):
                if bounds[i] >= bounds[i + 1]:
                    continue
                tasks.append(
                    dict(
                        path=apath,
                        start=bounds[i],
                        end=bounds[i + 1],
                        first_intra=records_intra if i == 0 else 0,
                        resync=i > 0,
                        n_contigs=n_contigs,
                        n_samples=n_samples,
                        str_dict=str_dict,
                        contig_dict=contig_dict,
                        flags=flags,
                        fs=fs,
                    )
                )
        rdd = sc.parallelize(tasks, max(1, len(tasks))).flatMap(
            lambda t: _decode_bcf_byte_range(**t)
        )
    body = spark.createDataFrame(rdd.map(lambda ln: (ln,)), "value string")
    return vcf_lines_to_contexts(body, header_lines, refs, sample_names)


def load_indexed_bcf(
    spark: SparkSession, path: str, regions: list[tuple[str, int, int]],
    fs=None,
) -> GenomicFrame:
    """Region-restricted BCF load via the .csi sidecar (the
    load_indexed_vcf shape over the binary records): only the
    index-addressed BGZF chunks overlapping the query regions are read
    and decoded — I/O scales with the overlap fraction, not the file.
    The coarse bin prefilter is followed by an exact per-record overlap
    predicate on (CHROM, POS-1, POS-1+len(REF))."""
    import os

    from pyspark.sql import functions as F  # noqa: N812

    from adam_spark.sources.binned_index import merge_chunks, read_csi
    from adam_spark.sources.filesystem import LocalFileSystem, get_fs
    from adam_spark.sources.vcf import vcf_lines_to_contexts

    fs, path = get_fs(path, fs)
    apath = os.path.abspath(path) if isinstance(fs, LocalFileSystem) else path
    header_text, header_lines, refs, sample_names = _bcf_header_driver_side(
        apath, fs
    )
    str_dict, contig_dict = _dictionaries(header_text)
    flags = _flag_keys(header_text)
    rid = {name: i for i, name in contig_dict.items()}

    idx = read_csi(apath + ".csi", fs)
    chunks = merge_chunks(
        [
            c
            for (rname, beg, end) in regions
            if rname in rid
            for c in idx.chunks_for(rid[rname], beg, end)
        ]
    )

    def _lines(task_chunks):
        from adam_spark.sources.binned_index import read_chunk_bytes

        for vb, ve in task_chunks:
            buf = read_chunk_bytes(apath, vb, ve, fs)
            yield from _records_from_buffer(
                buf, 0, len(buf), str_dict, contig_dict, flags
            )

    sc = spark.sparkContext
    par = sc.defaultParallelism
    # contiguous byte-balanced slices (not strides): partition-index
    # order reproduces file order, so order-sensitive downstream
    # single-file saves keep the record order of the source file
    from adam_spark.sources.binned_index import split_chunks_contiguous

    task_chunks = split_chunks_contiguous(chunks, max(1, min(len(chunks), par * 2)))
    rdd = sc.parallelize(task_chunks, max(1, len(task_chunks))).flatMap(_lines)
    body = spark.createDataFrame(rdd.map(lambda ln: (ln,)), "value string")

    t = F.split(F.col("value"), "\t")
    ref_c = F.try_element_at(t, F.lit(1))
    beg_c = F.try_element_at(t, F.lit(2)).try_cast("long") - 1
    end_c = beg_c + F.length(F.try_element_at(t, F.lit(4)))
    pred = F.lit(False)
    for rname, beg, end in regions:
        pred = pred | (
            (ref_c == F.lit(rname)) & (beg_c < F.lit(end)) & (end_c > F.lit(beg))
        )
    return vcf_lines_to_contexts(body.where(pred), header_lines, refs, sample_names)


# --- writer ----------------------------------------------------------------

#: htslib reserves the top 8 values of each integer width for
#: missing/end-of-vector sentinels; width minimization must not collide
_INT8_RANGE = (-120, 127)
_INT16_RANGE = (-32760, 32767)


def _typed_desc(t: int, n: int) -> bytes:
    if n < 15:
        return bytes([(n << 4) | t])
    return bytes([0xF0 | t]) + _typed_ints([n])


def _typed_ints(vals: list[int], pad_to: int | None = None) -> bytes:
    """Width-minimized typed int vector; None elements are MISSING and
    padding (up to ``pad_to``) is END-OF-VECTOR."""
    present = [v for v in vals if v is not None]
    lo = min(present) if present else 0
    hi = max(present) if present else 0
    if _INT8_RANGE[0] <= lo and hi <= _INT8_RANGE[1]:
        t, fmt, miss, eov = 1, "b", -0x80, -0x7F
    elif _INT16_RANGE[0] <= lo and hi <= _INT16_RANGE[1]:
        t, fmt, miss, eov = 2, "h", -0x8000, -0x7FFF
    else:
        t, fmt, miss, eov = 3, "i", -0x80000000, -0x7FFFFFFF
    out = [miss if v is None else v for v in vals]
    if pad_to is not None:
        out += [eov] * (pad_to - len(out))
    n = len(out)
    return _typed_desc(t, n) + struct.pack(f"<{n}{fmt}", *out)


def _float_bits(v: float | None) -> int:
    """float → raw float32 bits; None → the MISSING payload. The
    sentinels are specific quiet-NaN payloads (0x7F80000{1,2}) which a
    round trip THROUGH a Python float would squash to the canonical
    NaN — always pack them at the bit level."""
    if v is None:
        return 0x7F800001
    return struct.unpack("<I", struct.pack("<f", v))[0]


def _typed_floats(vals: list[float | None], pad_to: int | None = None) -> bytes:
    bits = [_float_bits(v) for v in vals]
    if pad_to is not None:
        bits += [0x7F800002] * (pad_to - len(bits))
    n = len(bits)
    return _typed_desc(5, n) + struct.pack(f"<{n}I", *bits)


def _typed_str(s: str, pad_to: int | None = None) -> bytes:
    b = s.encode()
    if pad_to is not None:
        b += b"\x00" * (pad_to - len(b))
    return _typed_desc(7, len(b)) + b


def _encode_cell(typ: str, raw: str, pad_to: int | None = None) -> bytes:
    """One INFO value / FORMAT sample cell → typed bytes. ``pad_to`` is
    the record-wide per-key width for FORMAT vectors."""
    if raw == "" or raw == ".":
        if typ == "Integer":
            return _typed_ints([None], pad_to=pad_to)
        if typ == "Float":
            return _typed_floats([None], pad_to=pad_to)
        return _typed_str(".", pad_to=pad_to)
    if typ == "Integer":
        return _typed_ints(
            [None if x == "." else int(x) for x in raw.split(",")], pad_to=pad_to
        )
    if typ == "Float":
        return _typed_floats(
            [None if x == "." else float(x) for x in raw.split(",")], pad_to=pad_to
        )
    return _typed_str(raw, pad_to=pad_to)


def _cell_width(typ: str, raw: str) -> int:
    if typ in ("Integer", "Float"):
        return 1 if raw in ("", ".") else raw.count(",") + 1
    return len(raw.encode()) if raw not in ("", ".") else 1


def _encode_gt(raw: str) -> list[int]:
    vals: list[int] = []
    phased_next = False
    tok = ""
    for ch in raw + "/":
        if ch in "/|":
            allele = 0 if tok == "." else (int(tok) + 1) << 1
            vals.append(allele | (1 if phased_next else 0))
            phased_next = ch == "|"
            tok = ""
        else:
            tok += ch
    return vals


def _encode_record(
    line: str,
    str_ix: dict[str, int],
    contig_ix: dict[str, int],
    info_types: dict[str, str],
    fmt_types: dict[str, str],
    flag_keys: set[str],
) -> bytes:
    cols = line.split("\t")
    chrom, pos1, vid, ref, alt, qual, filt, info = cols[:8]
    alleles = [ref] + ([] if alt == "." else alt.split(","))
    shared = bytearray()
    shared += struct.pack(
        "<iii", contig_ix[chrom], int(pos1) - 1, len(ref) if ref != "." else 0
    )
    if qual == ".":
        shared += struct.pack("<I", 0x7F800001)
    else:
        shared += struct.pack("<f", float(qual))
    info_items = []
    if info != ".":
        for part in info.split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
            else:
                k, v = part, None
            info_items.append((k, v))
    n_sample = max(0, len(cols) - 9)
    fmt_keys = cols[8].split(":") if len(cols) > 8 and cols[8] else []
    shared += struct.pack("<I", (len(alleles) << 16) | len(info_items))
    shared += struct.pack("<I", (len(fmt_keys) << 24) | n_sample)
    shared += _typed_str(vid) if vid != "." else _typed_desc(7, 0)
    for a in alleles:
        shared += _typed_str(a)
    if filt == ".":
        shared += _typed_ints([])
    else:
        shared += _typed_ints([str_ix[f] for f in filt.split(";")])
    for k, v in info_items:
        shared += _typed_ints([str_ix[k]])
        if k in flag_keys or v is None:
            shared += _typed_desc(0, 0)
        else:
            shared += _encode_cell(info_types.get(k, "String"), v)

    indiv = bytearray()
    if fmt_keys:
        cells = [c.split(":") for c in cols[9:]]
        for ki, k in enumerate(fmt_keys):
            raws = [c[ki] if ki < len(c) else "." for c in cells]
            indiv += _typed_ints([str_ix[k]])
            if k == "GT":
                gts = [_encode_gt(r) for r in raws]
                width = max((len(g) for g in gts), default=1)
                vec = []
                for g in gts:
                    vec += g + [-0x7F] * (width - len(g))  # int8 EOV pad
                indiv += _typed_desc(1, width) + struct.pack(
                    f"<{len(vec)}b", *vec
                )
            else:
                # ONE shared descriptor prefixes the whole per-sample
                # block, so the element type and width must be uniform
                # across samples (the spec's FORMAT layout)
                typ = fmt_types.get(k, "String")
                width = max(_cell_width(typ, r) for r in raws)
                if typ == "Integer":
                    allvals = [
                        [None]
                        if r in (".", "")
                        else [None if x == "." else int(x) for x in r.split(",")]
                        for r in raws
                    ]
                    flat = [v for vs in allvals for v in vs if v is not None]
                    lo, hi = (min(flat), max(flat)) if flat else (0, 0)
                    if _INT8_RANGE[0] <= lo and hi <= _INT8_RANGE[1]:
                        t, fc, miss, eov = 1, "b", -0x80, -0x7F
                    elif _INT16_RANGE[0] <= lo and hi <= _INT16_RANGE[1]:
                        t, fc, miss, eov = 2, "h", -0x8000, -0x7FFF
                    else:
                        t, fc, miss, eov = 3, "i", -0x80000000, -0x7FFFFFFF
                    blob = bytearray()
                    for vs in allvals:
                        row = [miss if v is None else v for v in vs]
                        row += [eov] * (width - len(row))
                        blob += struct.pack(f"<{width}{fc}", *row)
                    indiv += _typed_desc(t, width) + blob
                elif typ == "Float":
                    blob = bytearray()
                    for r in raws:
                        vs = (
                            [None]
                            if r in (".", "")
                            else [None if x == "." else float(x) for x in r.split(",")]
                        )
                        bits = [_float_bits(v) for v in vs]
                        bits += [0x7F800002] * (width - len(bits))
                        blob += struct.pack(f"<{width}I", *bits)
                    indiv += _typed_desc(5, width) + blob
                else:
                    blob = bytearray()
                    for r in raws:
                        b = (r if r not in ("", ".") else ".").encode()
                        blob += b + b"\x00" * (width - len(b))
                    indiv += _typed_desc(7, width) + blob

    return (
        struct.pack("<II", len(shared), len(indiv)) + bytes(shared) + bytes(indiv)
    )


def _bcf_header_blob(header_lines: list[str], refs) -> tuple[bytes, dict, dict, dict, dict, set]:
    """BCF header text (IDX-annotated) + encode dictionaries."""
    import re

    str_ix: dict[str, int] = {"PASS": 0}
    info_types: dict[str, str] = {}
    fmt_types: dict[str, str] = {}
    flag_keys: set[str] = set()
    out_lines: list[str] = []
    for ln in header_lines:
        if ln.startswith(("##FILTER=<", "##INFO=<", "##FORMAT=<")):
            body = ln.split("<", 1)[1][:-1]
            m = re.match(r"ID=([^,>]+)", body)
            lid = m.group(1) if m else None
            if lid is not None and lid not in str_ix:
                str_ix[lid] = len(str_ix)
            tm = re.search(r"Type=([A-Za-z]+)", body)
            if lid and tm:
                if ln.startswith("##INFO=<"):
                    info_types[lid] = tm.group(1)
                    if tm.group(1) == "Flag":
                        flag_keys.add(lid)
                elif ln.startswith("##FORMAT=<"):
                    fmt_types[lid] = tm.group(1)
            if lid is not None:
                out_lines.append(ln[:-1] + f",IDX={str_ix[lid]}>")
                continue
        out_lines.append(ln)
    # contigs last with their own dictionary (render_vcf_header already
    # emits them; annotate with IDX in dictionary order)
    contig_ix: dict[str, int] = {}
    final_lines: list[str] = []
    for ln in out_lines:
        if ln.startswith("##contig=<"):
            m = re.match(r"##contig=<ID=([^,>]+)", ln)
            name = m.group(1)
            contig_ix[name] = len(contig_ix)
            final_lines.append(ln[:-1] + f",IDX={contig_ix[name]}>")
        else:
            final_lines.append(ln)
    text = "\n".join(final_lines) + "\n\x00"
    blob = b"BCF\x02\x02" + struct.pack("<I", len(text)) + text.encode()
    return blob, str_ix, contig_ix, info_types, fmt_types, flag_keys


def save_bcf(gf: GenomicFrame, path: str, fs=None) -> dict:
    """Variant contexts → single-file BCFv2.2 (BGZF-framed).

    Shards encode + compress fully distributed (BGZF members
    concatenate, the save_bam merge shape) with ZERO shuffles: the
    rendered body's partition order already IS the frame order (the
    render is a narrow projection), so each task record-encodes +
    BGZF-compresses its own partition's shard file and the driver
    appends shards in partition-index order — reproducing the global
    frame order without a sort exchange. The rendered lines persist
    once, shared by the dictionary key scans and the encode pass. The
    driver writes the dictionary-annotated header member first and
    closes with the BGZF EOF sentinel.
    Undeclared attribute keys found in the rendered lines get Number=.
    Type=String declarations appended, and contig names absent from the
    sequence dictionary get synthesized ##contig lines, so the BCF
    dictionaries are complete (bcftools errors on undeclared keys; this
    writer is lenient the same way the text loader is). Round trip
    pinned by load_bcf equality tests + the converter fuzzer corpus."""
    from pyspark.sql import functions as F  # noqa: N812

    from adam_spark.sources.bam import _BGZF_EOF, bgzf_blocks_bytes
    from adam_spark.sources.filesystem import get_fs
    from adam_spark.sources.vcf import _render_vcf

    # resolved ONCE here; the handle rides the task closures so shard
    # bytes stream executor->store directly (HDFS/S3 via pyarrow.fs)
    fs, path = get_fs(path, fs)

    header_lines, body = _render_vcf(gf)
    from pyspark import StorageLevel

    ordered = body.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # pass 1: the distinct INFO/FORMAT keys actually present, so the
        # dictionary (and declarations) cover undeclared attributes
        t = F.split(F.col("value"), "\t")
        info_keys = (
            ordered.select(
                F.explode(F.split(F.try_element_at(t, F.lit(8)), ";")).alias("kv")
            )
            .select(F.substring_index("kv", "=", 1).alias("k"))
            .where(F.col("k") != ".")
            .distinct()
            .collect()
        )
        fmt_keys = (
            ordered.select(
                F.explode(
                    F.split(F.coalesce(F.try_element_at(t, F.lit(9)), F.lit("")), ":")
                ).alias("k")
            )
            .where(F.col("k") != "")
            .distinct()
            .collect()
        )
        declared = set()
        for ln in header_lines:
            if ln.startswith(("##INFO=<", "##FORMAT=<", "##FILTER=<")):
                declared.add(ln.split("<ID=", 1)[1].split(",", 1)[0].rstrip(">"))
        hdr = [ln for ln in header_lines if not ln.startswith("#CHROM")]
        chrom_line = [ln for ln in header_lines if ln.startswith("#CHROM")]
        for r in info_keys:
            if r["k"] not in declared:
                hdr.append(
                    f'##INFO=<ID={r["k"]},Number=.,Type=String,Description="undeclared">'
                )
                declared.add(r["k"])
        for r in fmt_keys:
            if r["k"] not in declared and r["k"] != "GT":
                hdr.append(
                    f'##FORMAT=<ID={r["k"]},Number=.,Type=String,Description="undeclared">'
                )
                declared.add(r["k"])
        if "GT" in {r["k"] for r in fmt_keys} and not any(
            "##FORMAT=<ID=GT," in ln for ln in hdr
        ):
            hdr.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
        if not any(ln.startswith("##FILTER=<ID=PASS") for ln in hdr):
            hdr.insert(1, '##FILTER=<ID=PASS,Description="All filters passed">')
        # filter names appearing only in data must enter the dictionary
        # THROUGH the header, or the reader has no string for the index
        filt_names = (
            ordered.select(
                F.explode(F.split(F.try_element_at(t, F.lit(7)), ";")).alias("f")
            )
            .where(~F.col("f").isin(".", "PASS", ""))
            .distinct()
            .collect()
        )
        for r in filt_names:
            if r["f"] not in declared:
                hdr.append(f'##FILTER=<ID={r["f"]},Description="undeclared">')
                declared.add(r["f"])
        # contig names absent from the header (frame loaded from a VCF
        # with no ##contig declarations — common) must still enter the
        # contig dictionary, or _encode_record KeyErrors on rid lookup
        declared_contigs = {
            ln.split("<ID=", 1)[1].split(",", 1)[0].rstrip(">")
            for ln in hdr
            if ln.startswith("##contig=<")
        }
        chrom_rows = (
            ordered.select(F.try_element_at(t, F.lit(1)).alias("c"))
            .distinct()
            .collect()
        )
        for name in sorted(
            r["c"] for r in chrom_rows
            if r["c"] is not None and r["c"] not in declared_contigs
        ):
            hdr.append(f"##contig=<ID={name}>")
        hdr += chrom_line
        blob, str_ix, contig_ix, info_types, fmt_types, flag_keys = _bcf_header_blob(
            hdr, gf.meta.references
        )

        shard_dir = path + ".__shards"
        fs.rmtree(shard_dir)
        fs.makedirs(shard_dir)

        bs = 60_000

        def _encode_shard(i, it):
            from adam_spark.sources.binned_index import ShardIndexAgg, voffset

            buf = bytearray()
            recs: list[tuple[int, int, int, int, int]] = []
            for row in it:
                line = row["value"]
                u0 = len(buf)
                buf += _encode_record(
                    line, str_ix, contig_ix, info_types, fmt_types, flag_keys
                )
                chrom, pos1, _, ref = line.split("\t", 4)[:4]
                beg = int(pos1) - 1
                recs.append(
                    (contig_ix[chrom], beg, beg + max(len(ref), 1), u0, len(buf))
                )
            sblob, offsets = bgzf_blocks_bytes(bytes(buf), block_size=bs)
            # index metadata aggregates to per-(ref, bin) chunk extents
            # HERE, on the executor — the driver receives O(bins) per
            # shard, never O(records) (the 100 TB constraint)
            agg = ShardIndexAgg()
            for rid, beg, rend, u0, u1 in recs:
                agg.add(
                    rid, beg, rend,
                    voffset(offsets[u0 // bs], u0 % bs),
                    voffset(offsets[u1 // bs], u1 % bs),
                )
            sp = fs.join(shard_dir, f"part-{i:05d}")
            f = fs.open_write(sp)
            try:
                f.write(sblob)
            finally:
                f.close()
            return [(i, sp, len(sblob), agg.manifest())]

        manifests = (
            ordered.select("value")
            .rdd.mapPartitionsWithIndex(_encode_shard)
            .collect()
        )
        manifests.sort(key=lambda m: m[0])
        hblob, _ = bgzf_blocks_bytes(blob)
        # .csi sidecar: shard-local virtual offsets shift to global ones
        # via the prefix-summed shard compressed offsets (each shard's
        # blocks restart at local uncompressed offset 0); depth scales
        # to the longest coordinate (the reason CSI exists: contigs
        # past the 2^29 tabix/BAI limit)
        from adam_spark.sources.binned_index import (
            max_bin_coord,
            new_index,
            write_csi,
        )

        max_end = max((m[3][2] for m in manifests), default=0)
        depth = 5
        while max_bin_coord(14, depth) < max_end and depth < 10:
            depth += 1
        idx = new_index(list(contig_ix), depth=depth)
        index_chunks = 0
        # parallel positioned-write concat (ParallelFileMerger shape);
        # the returned prefix offsets are exactly the manifest shifts
        from adam_spark.sources.merge import concat_files_parallel

        offs = concat_files_parallel(
            path, [m[1] for m in manifests], hblob, _BGZF_EOF, fs=fs
        )
        totals: dict[int, int] = {}
        for (_, sp, _, (bins, linear, _, _, counts)), base in zip(manifests, offs):
            # the linear fold feeds the CSI per-bin loffsets (htslib
            # update_loff semantics) — without it write_csi would have
            # no safe pruning floor and disable start-offset pruning
            idx.add_shard(bins, linear, base)
            index_chunks += sum(len(c) for c in bins.values())
            for r_id, c in counts.items():
                totals[r_id] = totals.get(r_id, 0) + c
            fs.remove(sp)
        fs.rmdir(shard_dir)
        # htslib metadata pseudo-bins (`bcftools index -s` payload)
        for r_id, total in totals.items():
            idx.set_ref_stats(r_id, total)
        idx.n_no_coor = 0
        write_csi(idx, path + ".csi", fs=fs)
        return {"shards": len(manifests), "index_manifest_chunks": index_chunks}
    finally:
        ordered.unpersist()
