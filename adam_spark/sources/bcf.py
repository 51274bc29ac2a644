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

Scale shape: one decode task per FILE (BCF records are not resyncable
mid-stream without a .csi index — same parallelism class as Spark's
unsplittable gzip). The header reads driver-side, O(header bytes).
"""

from __future__ import annotations

import struct

from pyspark.sql import SparkSession

from adam_spark.core.genomic_frame import GenomicFrame

#: missing / end-of-vector sentinels per integer width; floats use the
#: quiet-NaN payloads 0x7F800001 / 0x7F800002
_INT_MISSING = {1: -0x80, 2: -0x8000, 3: -0x80000000}
_INT_EOV = {1: -0x7F, 2: -0x7FFF, 3: -0x7FFFFFFF}
_FLOAT_MISSING = struct.unpack("<f", struct.pack("<I", 0x7F800001))[0]
_FLOAT_EOV = struct.unpack("<f", struct.pack("<I", 0x7F800002))[0]


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
        return list(struct.unpack_from(f"<{n}f", data, pos)), pos + 4 * n
    if t == 7:
        return [data[pos : pos + n].decode()], pos + n
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
                idx = int(fields["IDX"]) if "IDX" in fields else None
                if idx is None:
                    # implicit dictionary: first occurrence of each ID,
                    # PASS preassigned 0
                    if fields["ID"] in str_dict.values():
                        continue
                    idx = len(str_dict) if str_dict or fields["ID"] == "PASS" else 1
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
            bits = struct.unpack("<I", struct.pack("<f", v))[0]
            if bits == 0x7F800002:
                break
            out.append("." if bits == 0x7F800001 else _fmt_float(v))
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


def bcf_records_to_vcf_lines(raw: bytes) -> list[str]:
    """Decode every BCF record into an equivalent VCF body line."""
    data = _bcf_payload(raw)
    l_text = struct.unpack_from("<I", data, 5)[0]
    header_text = data[9 : 9 + l_text].rstrip(b"\x00").decode()
    str_dict, contig_dict = _dictionaries(header_text)
    flag_keys = {
        line.split("<ID=", 1)[1].split(",", 1)[0]
        for line in header_text.splitlines()
        if line.startswith("##INFO=<") and "Type=Flag" in line
    }

    lines: list[str] = []
    pos = 9 + l_text
    end = len(data)
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


def load_bcf(spark: SparkSession, path: str) -> GenomicFrame:
    """BCFv2.2 → variant contexts, through the shared text parser."""
    import os
    import re

    from adam_spark.sources.vcf import (
        _header_from_lines,
        mix_header_lines,
        vcf_lines_to_contexts,
    )

    # header: driver-side, O(header bytes) (gzip streams lazily)
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # header text is bounded; fixtures ~1 KB
    try:
        header_text = bcf_header_text(head)
    except (ValueError, struct.error, EOFError):
        header_text = bcf_header_text(open(path, "rb").read())
    # htsjdk strips the IDX= dictionary annotations on read; so do we
    header_lines_raw = [
        re.sub(r",IDX=\d+(?=[,>])", "", ln) for ln in header_text.splitlines()
    ]
    header_lines, refs, sample_names = _header_from_lines(header_lines_raw)
    header_lines = mix_header_lines(header_lines)

    sc = spark.sparkContext
    apath = os.path.abspath(path)
    rdd = sc.parallelize([apath], 1).flatMap(
        lambda p: bcf_records_to_vcf_lines(open(p, "rb").read())
    )
    body = spark.createDataFrame(rdd.map(lambda ln: (ln,)), "value string")
    return vcf_lines_to_contexts(body, header_lines, refs, sample_names)
