"""Random-access reference genome readers: 2bit and faidx-indexed FASTA.

Mirrors the reference's ReferenceFile surface (util/TwoBitFile.scala:59,
util/IndexedFastaFile.scala:36; ADAMContext.loadReferenceFile:3492):
driver-side random access used by MD tagging and indel realignment.
Both readers expose ``extract(name, start, end) -> str`` and
``to_dict()`` (for broadcasting to pandas-UDF kernels); a 2bit WRITER
is included so round-trips are testable without external files.

The .2bit format is the public UCSC spec: little/big-endian signature
0x1A412743, sequence index, then per-sequence packed 2-bit bases
(T=0, C=1, A=2, G=3) with N-block and mask-block run lists.
"""

from __future__ import annotations

import struct

_SIG = 0x1A412743
_BASES = "TCAG"
_CODE = {b: i for i, b in enumerate(_BASES)}


class TwoBitFile:
    """Parse a UCSC .2bit file into random-access sequences."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            data = fh.read()
        self._parse(data)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TwoBitFile":
        """Open from an in-memory payload (e.g. a Spark broadcast of the
        compact 2bit bytes — ~4× smaller than raw contig strings)."""
        obj = cls.__new__(cls)
        obj.path = None
        obj._parse(data)
        return obj

    def _parse(self, data: bytes) -> None:
        sig_le = struct.unpack_from("<I", data, 0)[0]
        if sig_le == _SIG:
            self._e = "<"
        elif struct.unpack_from(">I", data, 0)[0] == _SIG:
            self._e = ">"
        else:
            raise ValueError(f"{self.path or '<bytes>'} is not a 2bit file")
        e = self._e
        _version, seq_count, _reserved = struct.unpack_from(f"{e}III", data, 4)
        self._data = data
        self._index: dict[str, int] = {}
        off = 16
        for _ in range(seq_count):
            (name_len,) = struct.unpack_from(f"{e}B", data, off)
            off += 1
            name = data[off : off + name_len].decode()
            off += name_len
            (rec_off,) = struct.unpack_from(f"{e}I", data, off)
            off += 4
            self._index[name] = rec_off
        self._cache: dict[str, tuple[int, list, list]] = {}

    def names(self) -> list[str]:
        return list(self._index)

    def _record(self, name: str):
        if name in self._cache:
            return self._cache[name]
        e, data = self._e, self._data
        off = self._index[name]
        (dna_size,) = struct.unpack_from(f"{e}I", data, off)
        off += 4
        (n_block_count,) = struct.unpack_from(f"{e}I", data, off)
        off += 4
        n_starts = struct.unpack_from(f"{e}{n_block_count}I", data, off)
        off += 4 * n_block_count
        n_sizes = struct.unpack_from(f"{e}{n_block_count}I", data, off)
        off += 4 * n_block_count
        (mask_count,) = struct.unpack_from(f"{e}I", data, off)
        off += 4
        mask_starts = struct.unpack_from(f"{e}{mask_count}I", data, off)
        off += 4 * mask_count
        mask_sizes = struct.unpack_from(f"{e}{mask_count}I", data, off)
        off += 4 * mask_count
        off += 4  # reserved
        rec = (
            dna_size,
            list(zip(n_starts, n_sizes)),
            off,
            list(zip(mask_starts, mask_sizes)),
        )
        self._cache[name] = rec
        return rec

    def length(self, name: str) -> int:
        return self._record(name)[0]

    def extract(self, name: str, start: int, end: int,
                masked: bool = False) -> str:
        """Bases [start, end) of ``name`` (0-based half-open).
        ``masked=True`` lowercases soft-masked (mask-block) runs like
        the UCSC format intends (TwoBitFileSuite "correctly return
        masked sequences"); the default stays uppercase because every
        kernel here compares case-insensitively."""
        dna_size, n_blocks, base_off, mask_blocks = self._record(name)
        start = max(0, start)
        end = min(end, dna_size)
        if end <= start:
            return ""
        out = []
        data = self._data
        for pos in range(start, end):
            byte = data[base_off + pos // 4]
            shift = (3 - pos % 4) * 2
            out.append(_BASES[(byte >> shift) & 0x3])
        seq = "".join(out)
        # overlay N blocks (and, opt-in, lowercase the mask blocks)
        chars = None
        for bs, bl in n_blocks:
            lo, hi = max(bs, start), min(bs + bl, end)
            if lo < hi:
                if chars is None:
                    chars = list(seq)
                for p in range(lo, hi):
                    chars[p - start] = "N"
        if masked:
            for bs, bl in mask_blocks:
                lo, hi = max(bs, start), min(bs + bl, end)
                if lo < hi:
                    if chars is None:
                        chars = list(seq)
                    for p in range(lo, hi):
                        chars[p - start] = chars[p - start].lower()
        return "".join(chars) if chars is not None else seq

    def to_dict(self) -> dict[str, str]:
        """Full {name: sequence} (for broadcast to kernels)."""
        return {n: self.extract(n, 0, self.length(n)) for n in self.names()}


def write_2bit(sequences: dict[str, str], path: str) -> None:
    """Write sequences to a .2bit file (little-endian). Lowercase input
    runs become mask blocks (UCSC soft-masking convention), mirrored
    back by ``extract(..., masked=True)``."""
    recs = []
    for name, seq in sequences.items():
        seq_u = seq.upper()

        def _runs(pred):
            blocks, i = [], 0
            while i < len(seq):
                if pred(i):
                    j = i
                    while j < len(seq) and pred(j):
                        j += 1
                    blocks.append((i, j - i))
                    i = j
                else:
                    i += 1
            return blocks

        n_blocks = _runs(lambda i: seq_u[i] == "N")
        mask_blocks = _runs(lambda i: seq[i].islower())
        packed = bytearray()
        acc = 0
        for i, b in enumerate(seq_u):
            acc = (acc << 2) | _CODE.get(b, 0)  # N packs as T; N-blocks restore
            if i % 4 == 3:
                packed.append(acc)
                acc = 0
        if len(seq_u) % 4:
            acc <<= 2 * (4 - len(seq_u) % 4)
            packed.append(acc)
        body = struct.pack("<I", len(seq_u))
        body += struct.pack("<I", len(n_blocks))
        body += struct.pack(f"<{len(n_blocks)}I", *[s for s, _ in n_blocks])
        body += struct.pack(f"<{len(n_blocks)}I", *[l for _, l in n_blocks])
        body += struct.pack("<I", len(mask_blocks))
        body += struct.pack(f"<{len(mask_blocks)}I", *[s for s, _ in mask_blocks])
        body += struct.pack(f"<{len(mask_blocks)}I", *[l for _, l in mask_blocks])
        body += struct.pack("<I", 0)  # reserved
        body += bytes(packed)
        recs.append((name, body))

    header = struct.pack("<IIII", _SIG, 0, len(recs), 0)
    index_size = sum(1 + len(n.encode()) + 4 for n, _ in recs)
    off = len(header) + index_size
    index = b""
    offsets = []
    for name, body in recs:
        nb = name.encode()
        offsets.append(off)
        index += struct.pack("<B", len(nb)) + nb + struct.pack("<I", off)
        off += len(body)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(index)
        for _, body in recs:
            fh.write(body)


class IndexedFastaFile:
    """faidx-indexed FASTA random access (util/IndexedFastaFile.scala).

    Requires ``<path>.fai`` (samtools faidx layout: name, length,
    offset, line_bases, line_width). Builds the index itself when the
    .fai is missing.
    """

    def __init__(self, path: str):
        import os

        if os.path.isdir(path):
            # Spark-style single-file save dir (save_fasta single_file
            # writes part-00000 + part-00000.fai inside it)
            path = os.path.join(path, "part-00000")
        self.path = path
        self._index: dict[str, tuple[int, int, int, int]] = {}
        try:
            with open(path + ".fai") as fh:
                for line in fh:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 5:
                        self._index[parts[0]] = (
                            int(parts[1]), int(parts[2]), int(parts[3]), int(parts[4])
                        )
        except FileNotFoundError:
            self._build_index()

    def _build_index(self) -> None:
        with open(self.path, "rb") as fh:
            name = None
            length = 0
            offset = 0
            line_bases = line_width = 0
            pos = 0
            for raw in fh:
                line = raw.decode()
                if line.startswith(">"):
                    if name is not None:
                        self._index[name] = (length, offset, line_bases, line_width)
                    name = line[1:].split()[0].strip()
                    length = 0
                    offset = pos + len(raw)
                    line_bases = line_width = 0
                else:
                    stripped = line.rstrip("\n")
                    if not line_bases:
                        line_bases = len(stripped)
                        line_width = len(raw)
                    length += len(stripped)
                pos += len(raw)
            if name is not None:
                self._index[name] = (length, offset, line_bases, line_width)

    def names(self) -> list[str]:
        return list(self._index)

    def length(self, name: str) -> int:
        return self._index[name][0]

    def extract(self, name: str, start: int, end: int) -> str:
        length, offset, line_bases, line_width = self._index[name]
        start = max(0, start)
        end = min(end, length)
        if end <= start or not line_bases:
            return ""
        file_start = offset + (start // line_bases) * line_width + start % line_bases
        file_end = offset + ((end - 1) // line_bases) * line_width + (end - 1) % line_bases + 1
        with open(self.path, "rb") as fh:
            fh.seek(file_start)
            chunk = fh.read(file_end - file_start)
        return chunk.decode().replace("\n", "").replace("\r", "").upper()

    def to_dict(self) -> dict[str, str]:
        return {n: self.extract(n, 0, self.length(n)) for n in self.names()}


def load_reference_file(path: str):
    """ADAMContext.loadReferenceFile:3492 — dispatch on extension."""
    if path.lower().endswith(".2bit"):
        return TwoBitFile(path)
    return IndexedFastaFile(path)
