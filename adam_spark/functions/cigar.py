"""Pure-Python CIGAR / MD-tag walkers.

Shared by the Arrow-batched kernels (BQSR, MD tagging, indel
normalization/realignment). These run INSIDE pandas UDFs — per read,
never per base in Python where avoidable — mirroring the reference's
per-record converters (models/MdTag.scala:46-611, samtools CIGAR
semantics). Kept dependency-free (no pysam).
"""

from __future__ import annotations

import re
from typing import NamedTuple

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_MD_RE = re.compile(r"(\d+)|(\^[A-Za-z]+)|([A-Za-z])")

CONSUMES_READ = frozenset("MIS=X")
CONSUMES_REF = frozenset("MDN=X")


def parse_cigar(cigar: str) -> list[tuple[int, str]]:
    """'3M1I4M' → [(3,'M'), (1,'I'), (4,'M')]."""
    if not cigar or cigar == "*":
        return []
    return [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]


def cigar_read_length(cigar: str) -> int:
    return sum(n for n, op in parse_cigar(cigar) if op in CONSUMES_READ)


def cigar_reference_length(cigar: str) -> int:
    return sum(n for n, op in parse_cigar(cigar) if op in CONSUMES_REF)


class AlignedBase(NamedTuple):
    read_idx: int  # offset into the read sequence
    ref_pos: int  # 0-based reference position
    op: str  # cigar op ('M', '=', 'X')


def aligned_pairs(cigar: str, start: int) -> list[AlignedBase]:
    """(read offset, reference position) for every aligned (M/=/X) base."""
    out: list[AlignedBase] = []
    read_idx, ref_pos = 0, start
    for n, op in parse_cigar(cigar):
        if op in "M=X":
            for i in range(n):
                out.append(AlignedBase(read_idx + i, ref_pos + i, op))
            read_idx += n
            ref_pos += n
        elif op in "IS":
            read_idx += n
        elif op in "DN":
            ref_pos += n
        # H, P consume nothing
    return out


class MdWalk(NamedTuple):
    mismatch_aligned: list[int]  # indices into the aligned-base sequence
    mismatch_ref_bases: list[str]  # reference base at each mismatch
    deletions: list[tuple[int, str]]  # (aligned-idx before which del occurs, ref bases)


def walk_md(md: str) -> MdWalk:
    """Walk an MD tag. Aligned-base indices count matched+mismatched
    bases (MD does not see insertions/clips)."""
    mism_idx: list[int] = []
    mism_ref: list[str] = []
    dels: list[tuple[int, str]] = []
    aligned = 0
    for m in _MD_RE.finditer(md or ""):
        num, deletion, base = m.groups()
        if num is not None:
            aligned += int(num)
        elif deletion is not None:
            dels.append((aligned, deletion[1:].upper()))
        else:
            mism_idx.append(aligned)
            mism_ref.append(base.upper())
            aligned += 1
    return MdWalk(mism_idx, mism_ref, dels)


def mismatch_read_offsets(cigar: str, md: str, start: int = 0) -> list[int]:
    """Read offsets of mismatching aligned bases, per cigar + MD."""
    pairs = aligned_pairs(cigar, start)
    walk = walk_md(md)
    return [pairs[i].read_idx for i in walk.mismatch_aligned if i < len(pairs)]


def reference_from_read(cigar: str, md: str, sequence: str) -> str:
    """Reconstruct the reference sequence covered by this read from its
    sequence + cigar + MD (models/MdTag.getReference semantics)."""
    walk = walk_md(md)
    mism = dict(zip(walk.mismatch_aligned, walk.mismatch_ref_bases))
    dels = dict(walk.deletions)
    out: list[str] = []
    read_idx = 0
    aligned = 0
    for n, op in parse_cigar(cigar):
        if op in "M=X":
            for _ in range(n):
                out.append(mism.get(aligned, sequence[read_idx]))
                read_idx += 1
                aligned += 1
        elif op in "IS":
            read_idx += n
        elif op == "D":
            # MD records deleted ref bases at the current aligned count
            out.append(dels.get(aligned, "N" * n))
        # N/H/P contribute nothing reconstructible
    return "".join(out)


def md_from_reference(cigar: str, sequence: str, ref_slice: str) -> tuple[str, int]:
    """Compute the MD tag for a read given the reference bases it spans
    (ds/read/MDTagging.scala semantics). ``ref_slice`` starts at the
    read's alignment start. Returns (md, n_mismatches)."""
    md_parts: list[str] = []
    match_run = 0
    mismatches = 0
    read_idx, ref_idx = 0, 0

    def flush():
        md_parts.append(str(match_run))

    for n, op in parse_cigar(cigar):
        if op in "M=X":
            for _ in range(n):
                rb = ref_slice[ref_idx].upper() if ref_idx < len(ref_slice) else "N"
                qb = sequence[read_idx].upper() if read_idx < len(sequence) else "N"
                if rb == qb:
                    match_run += 1
                else:
                    flush()
                    match_run = 0
                    md_parts.append(rb)
                    mismatches += 1
                read_idx += 1
                ref_idx += 1
        elif op in "IS":
            read_idx += n
        elif op == "D":
            flush()
            match_run = 0
            md_parts.append("^" + ref_slice[ref_idx : ref_idx + n].upper())
            ref_idx += n
        elif op == "N":
            ref_idx += n
        # H, P: nothing
    flush()
    return "".join(md_parts), mismatches


def left_align_indel(cigar: str, sequence: str, md: str | None) -> str:
    """Shift a single indel left while preceding read bases allow
    (algorithms/consensus/NormalizationUtils.scala:30-118 semantics):
    reads with zero or 2+ indels are returned unchanged; the variant
    (inserted read bases, or deleted reference bases from MD) is shifted
    left one base at a time while the base to its left equals its last
    base (repeat rotation)."""
    elems = parse_cigar(cigar)
    indels = [i for i, (_, op) in enumerate(elems) if op in "ID"]
    if len(indels) != 1:
        return cigar
    idx = indels[0]
    n, op = elems[idx]
    read_pos = sum(m for m, o in elems[:idx] if o in CONSUMES_READ)
    ref_pos = sum(m for m, o in elems[:idx] if o in CONSUMES_REF)
    if op == "I":
        variant = sequence[read_pos : read_pos + n]
    else:
        if not md:
            return cigar
        ref = reference_from_read(cigar, md, sequence)
        variant = ref[ref_pos : ref_pos + n]
    preceding = sequence[:read_pos]
    shift = 0
    var = variant
    pre = preceding
    while pre and var and pre[-1] == var[-1]:
        var = pre[-1] + var[:-1]
        pre = pre[:-1]
        shift += 1
    if shift == 0:
        return cigar
    # rebuild: shrink the M before the indel, grow (or create) the M after
    out = list(elems)
    if idx == 0 or out[idx - 1][1] != "M" or out[idx - 1][0] < shift:
        return cigar  # cannot shift past a non-M or beyond its length
    out[idx - 1] = (out[idx - 1][0] - shift, "M")
    if idx + 1 < len(out) and out[idx + 1][1] == "M":
        out[idx + 1] = (out[idx + 1][0] + shift, "M")
    else:
        out.insert(idx + 1, (shift, "M"))
    return "".join(f"{m}{o}" for m, o in out if m > 0)


def move_cigar_left(cigar: str, index: int) -> str:
    """RichCigar.moveLeft (rich/RichCigar.scala:38-93): move the cigar
    element at (1-based) ``index`` one base left. The element before it
    shrinks by one base (dropped entirely at length 1); the element
    after grows by one (a fresh 1M is appended when none exists).
    Out-of-range indexes return the cigar unchanged, matching the
    recursion's base case."""
    elems = parse_cigar(cigar)
    head: list[tuple[int, str]] = []
    rest = list(elems)
    i = index
    while True:
        if i == 1:
            trim = rest[0] if rest else None
            move = rest[1] if len(rest) >= 2 else None
            pad = rest[2] if len(rest) >= 3 else None
            after = rest[3:]
            out: list[tuple[int, str]] = []
            if trim is not None and trim[0] > 1:
                out.append((trim[0] - 1, trim[1]))
            if move is not None:
                out.append(move)
            if pad is not None:
                out.append((pad[0] + 1, pad[1]))
            else:
                out.append((1, "M"))
            return "".join(f"{n}{op}" for n, op in head + out + after)
        if i == 0 or len(rest) < 2:
            return "".join(f"{n}{op}" for n, op in head + rest)
        head.append(rest[0])
        rest = rest[1:]
        i -= 1


def _soft_clipped_at_head(elems: list[tuple[int, str]]) -> int:
    """RichCigar.getSoftClippedBases (:123-129): the first S run after
    skipping leading H."""
    i = 0
    while i < len(elems) and elems[i][1] == "H":
        i += 1
    if i < len(elems) and elems[i][1] == "S":
        return elems[i][0]
    return 0


def soft_clipped_bases_start(cigar: str) -> int:
    """RichCigar.softClippedBasesAtStart (:134-140)."""
    return _soft_clipped_at_head(parse_cigar(cigar))


def soft_clipped_bases_end(cigar: str) -> int:
    """RichCigar.softClippedBasesAtEnd (:146-152)."""
    return _soft_clipped_at_head(list(reversed(parse_cigar(cigar))))
