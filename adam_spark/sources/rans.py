"""rANS 4x8 entropy codec (CRAM 3.0 specification §8.4, order-0 and
order-1).

The reference reads real-world CRAMs through htsjdk
(ADAMContext.scala:2041-2111), and those near-universally compress
their external blocks with rANS. This is a from-scratch implementation
of the spec's byte-oriented 4-way-interleaved rANS:

- 12-bit normalized frequencies (total 4096), RLE-packed frequency
  tables (order-1 adds an RLE'd outer context dimension),
- four 32-bit states, lower bound ``L = 1<<23``, byte-wise
  renormalization against a single shared byte stream,
- payload layout: ``order u8, compressed_size u32le,
  uncompressed_size u32le, freq table, state0..state3 u32le,
  renorm byte stream``.

Encoding walks the input backwards (classic rANS LIFO), recording
renorm bytes, then reverses the stream so the decoder reads forwards —
the decoder is written purely from the spec's decode semantics and
never peeks at encoder internals. Order-1 conditions each byte on its
predecessor; the input is split into four contiguous quarters (the
fourth takes the remainder), one state per quarter, contexts starting
at 0.

Used by :mod:`adam_spark.sources.cram` as block compression method 4.
"""

from __future__ import annotations

import struct

RANS_L = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


# --- frequency tables ------------------------------------------------------
def _normalize(hist: list[int]) -> list[int]:
    """Scale counts to 12-bit freqs summing to exactly TOTFREQ, every
    nonzero count kept ≥ 1."""
    total = sum(hist)
    if total == 0:
        return [0] * 256
    freqs = [0] * 256
    for s, c in enumerate(hist):
        if c:
            freqs[s] = max(1, (c * TOTFREQ) // total)
    drift = TOTFREQ - sum(freqs)
    # push the residual onto the most frequent symbols (never below 1)
    order = sorted((s for s in range(256) if freqs[s]), key=lambda s: -freqs[s])
    i = 0
    while drift != 0:
        s = order[i % len(order)]
        step = 1 if drift > 0 else -1
        if freqs[s] + step >= 1:
            freqs[s] += step
            drift -= step
        i += 1
    return freqs


def _write_freqs(out: bytearray, freqs: list[int]) -> None:
    """Spec RLE: a symbol byte may be followed by a run-length byte when
    it starts a run of consecutive present symbols; table ends with 0."""
    rle = 0
    for j in range(256):
        if not freqs[j]:
            continue
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j and freqs[j - 1]:
                run = j + 1
                while run < 256 and freqs[run]:
                    run += 1
                rle = run - (j + 1)
                out.append(rle)
        f = freqs[j]
        if f < 128:
            out.append(f)
        else:
            out.append(0x80 | (f >> 8))
            out.append(f & 0xFF)
    out.append(0)


def _read_freqs(buf: bytes, p: int) -> tuple[list[int], int]:
    freqs = [0] * 256
    j = buf[p]
    p += 1
    rle = 0
    while True:
        f = buf[p]
        p += 1
        if f >= 128:
            f = ((f & 0x7F) << 8) | buf[p]
            p += 1
        freqs[j] = f
        if not rle and p < len(buf) and buf[p] == j + 1:
            j = buf[p]
            p += 1
            rle = buf[p]
            p += 1
        elif rle:
            rle -= 1
            j += 1
        else:
            j = buf[p]
            p += 1
            if j == 0:
                break
    return freqs, p


def _cumulative(freqs: list[int]) -> tuple[list[int], list[int]]:
    """(C, lookup): C[s] = cumulative start; lookup maps a 12-bit slot to
    its symbol."""
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + freqs[s]
    lookup = [0] * TOTFREQ
    for s in range(256):
        for slot in range(C[s], C[s + 1]):
            lookup[slot] = s
    return C, lookup


# --- order-0 ---------------------------------------------------------------
def _enc_renorm(x: int, freq: int, stream: bytearray) -> int:
    x_max = ((RANS_L >> TF_SHIFT) << 8) * freq
    while x >= x_max:
        stream.append(x & 0xFF)
        x >>= 8
    return x


def _enc_put(x: int, freq: int, cum: int) -> int:
    return ((x // freq) << TF_SHIFT) + (x % freq) + cum


def _encode_o0(data: bytes) -> bytes:
    hist = [0] * 256
    for b in data:
        hist[b] += 1
    freqs = _normalize(hist)
    C, _ = _cumulative(freqs)
    out = bytearray()
    _write_freqs(out, freqs)

    states = [RANS_L] * 4
    stream = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i & 3
        s = data[i]
        states[j] = _enc_renorm(states[j], freqs[s], stream)
        states[j] = _enc_put(states[j], freqs[s], C[s])
    out += struct.pack("<4I", *states)
    out += bytes(reversed(stream))
    return bytes(out)


def _decode_o0(buf: bytes, p: int, n_out: int) -> bytes:
    freqs, p = _read_freqs(buf, p)
    C, lookup = _cumulative(freqs)
    states = list(struct.unpack_from("<4I", buf, p))
    p += 16
    out = bytearray(n_out)
    for i in range(n_out):
        j = i & 3
        x = states[j]
        slot = x & (TOTFREQ - 1)
        s = lookup[slot]
        out[i] = s
        x = freqs[s] * (x >> TF_SHIFT) + slot - C[s]
        while x < RANS_L:
            x = (x << 8) | buf[p]
            p += 1
        states[j] = x
    return bytes(out)


# --- order-1 ---------------------------------------------------------------
def _quarters(n: int) -> list[tuple[int, int]]:
    """Four contiguous (start, length) quarters; the fourth takes the
    remainder."""
    q = n >> 2
    return [(0, q), (q, q), (2 * q, q), (3 * q, n - 3 * q)]


def _encode_o1(data: bytes) -> bytes:
    n = len(data)
    hist = [[0] * 256 for _ in range(256)]
    for start, ln in _quarters(n):
        last = 0
        for i in range(start, start + ln):
            hist[last][data[i]] += 1
            last = data[i]
    freqs = [_normalize(h) for h in hist]
    C = [None] * 256
    for ctx in range(256):
        if any(freqs[ctx]):
            cum = [0] * 257
            for s in range(256):
                cum[s + 1] = cum[s] + freqs[ctx][s]
            C[ctx] = cum

    out = bytearray()
    # outer RLE over contexts, inner table per context (same spec shape)
    present = [ctx for ctx in range(256) if any(freqs[ctx])]
    rle = 0
    for ctx in present:
        if rle:
            rle -= 1
        else:
            out.append(ctx)
            if ctx and any(freqs[ctx - 1]):
                run = ctx + 1
                while run < 256 and any(freqs[run]):
                    run += 1
                rle = run - (ctx + 1)
                out.append(rle)
        _write_freqs(out, freqs[ctx])
    out.append(0)

    # schedule: decode does `for i: for j in 0..3: if i < qlen[j]` —
    # encode simulates the exact reverse of that interleaving
    qs = _quarters(n)
    steps: list[tuple[int, int, int]] = []  # (state j, ctx, symbol)
    for i in range(max(ln for _, ln in qs) if n else 0):
        for j, (start, ln) in enumerate(qs):
            if i < ln:
                pos = start + i
                ctx = data[pos - 1] if i > 0 else 0
                steps.append((j, ctx, data[pos]))
    states = [RANS_L] * 4
    stream = bytearray()
    for j, ctx, s in reversed(steps):
        f = freqs[ctx][s]
        states[j] = _enc_renorm(states[j], f, stream)
        states[j] = _enc_put(states[j], f, C[ctx][s])
    out += struct.pack("<4I", *states)
    out += bytes(reversed(stream))
    return bytes(out)


def _decode_o1(buf: bytes, p: int, n_out: int) -> bytes:
    freqs: list[list[int] | None] = [None] * 256
    cums: list[list[int] | None] = [None] * 256
    looks: list[list[int] | None] = [None] * 256
    ctx = buf[p]
    p += 1
    rle = 0
    while True:
        f, p = _read_freqs(buf, p - 0)
        freqs[ctx] = f
        cums[ctx], looks[ctx] = _cumulative(f)
        if not rle and p < len(buf) and buf[p] == ctx + 1:
            ctx = buf[p]
            p += 1
            rle = buf[p]
            p += 1
        elif rle:
            rle -= 1
            ctx += 1
        else:
            ctx = buf[p]
            p += 1
            if ctx == 0:
                break
    states = list(struct.unpack_from("<4I", buf, p))
    p += 16
    out = bytearray(n_out)
    qs = _quarters(n_out)
    lasts = [0, 0, 0, 0]
    for i in range(max(ln for _, ln in qs) if n_out else 0):
        for j, (start, ln) in enumerate(qs):
            if i >= ln:
                continue
            c = lasts[j]
            x = states[j]
            slot = x & (TOTFREQ - 1)
            s = looks[c][slot]
            out[start + i] = s
            x = freqs[c][s] * (x >> TF_SHIFT) + slot - cums[c][s]
            while x < RANS_L:
                x = (x << 8) | buf[p]
                p += 1
            states[j] = x
            lasts[j] = s
    return bytes(out)


# --- public API ------------------------------------------------------------
def rans_compress(data: bytes, order: int = 0) -> bytes:
    """data → rANS 4x8 payload (order 0 or 1)."""
    if order not in (0, 1):
        raise ValueError("rANS order must be 0 or 1")
    if len(data) == 0:
        body = b""
    elif order == 0:
        body = _encode_o0(data)
    else:
        if len(data) < 4:
            # order-1 needs one symbol per state; tiny inputs fall back
            order, body = 0, _encode_o0(data)
        else:
            body = _encode_o1(data)
    return struct.pack("<BII", order, len(body), len(data)) + body


def rans_uncompress(payload: bytes) -> bytes:
    """rANS 4x8 payload → data."""
    order, csize, usize = struct.unpack_from("<BII", payload, 0)
    if len(payload) - 9 != csize:
        raise ValueError("rANS payload size mismatch")
    if usize == 0:
        return b""
    if order == 0:
        return _decode_o0(payload, 9, usize)
    if order == 1:
        return _decode_o1(payload, 9, usize)
    raise ValueError(f"unsupported rANS order {order}")
