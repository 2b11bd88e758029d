"""Pure-Python, loop-based reference packer for golden-byte tests.

Implements the simdcomp SSE 4-lane interleaved layout LITERALLY, one value at
a time, following the streaming recurrence of ``simdpack_shortlength``
(/root/reference/src/simdbitpacking.c:14190-14240) and ``simdpackFOR_length``
(/root/reference/src/simdfor.c:15043-15096).  Deliberately NOT numpy — an
independent implementation the vectorized kernels must byte-match.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF


def _pack_stream(values: list[int], bit: int) -> bytes:
    """Pack len(values) (multiple of 4) b-bit values into the interleaved
    4-lane layout; returns ceil((len/4)*bit/32)*16 bytes."""
    assert len(values) % 4 == 0
    rows = len(values) // 4
    nwords = (rows * bit + 31) // 32
    lanes = [[0] * nwords for _ in range(4)]
    for i, v in enumerate(values):
        lane, k = i % 4, i // 4
        off = k * bit
        w, s = off // 32, off % 32
        lanes[lane][w] |= (v << s) & MASK32
        if s + bit > 32:
            lanes[lane][w + 1] |= (v >> (32 - s)) & MASK32
    out = bytearray()
    for w in range(nwords):
        for lane in range(4):
            out += lanes[lane][w].to_bytes(4, "little")
    return bytes(out)


def pack_plain(values: list[int], bit: int, mask: bool = True) -> bytes:
    """simdpack/simdpack_shortlength/simdpack_length at a single width:
    full 128-blocks then zero-padded tail; b=0 -> b'', b=32 -> raw."""
    values = [v & MASK32 for v in values]
    if bit == 0:
        return b""
    if bit == 32:
        return b"".join(v.to_bytes(4, "little") for v in values)
    if mask:
        values = [v & ((1 << bit) - 1) for v in values]
    out = bytearray()
    for s in range(0, len(values) - len(values) % 128, 128):
        out += _pack_stream(values[s:s + 128], bit)
    tail = values[len(values) - len(values) % 128:]
    if tail:
        tail = tail + [0] * ((-len(tail)) % 4)
        out += _pack_stream(tail, bit)
    return bytes(out)


def unpack_plain(data: bytes, n: int, bit: int) -> list[int]:
    if bit == 0:
        return [0] * n
    if bit == 32:
        return [int.from_bytes(data[4 * i:4 * i + 4], "little") for i in range(n)]
    out = []
    pos = 0
    remaining = n
    while remaining > 0:
        blk = min(remaining, 128)
        rows = (blk + 3) // 4
        nwords = (rows * bit + 31) // 32
        words = [int.from_bytes(data[pos + 4 * j:pos + 4 * j + 4], "little")
                 for j in range(nwords * 4)]
        for i in range(blk):
            lane, k = i % 4, i // 4
            off = k * bit
            w, s = off // 32, off % 32
            v = words[4 * w + lane] >> s
            if s + bit > 32:
                v |= words[4 * (w + 1) + lane] << (32 - s)
            out.append(v & ((1 << bit) - 1))
        pos += nwords * 16
        remaining -= blk
    return out


def pack_for(init: int, values: list[int], bit: int) -> bytes:
    """simdpackFOR_length: one unframed stream of (v - init) mod 2**32,
    tail padded with init (residual 0); b=32 -> raw values."""
    if bit == 0:
        return b""
    if bit == 32:
        return b"".join((v & MASK32).to_bytes(4, "little") for v in values)
    resid = [(v - init) & MASK32 for v in values]
    resid += [0] * ((-len(resid)) % 4)
    return _pack_stream(resid, bit)


def unpack_for(init: int, data: bytes, n: int, bit: int) -> list[int]:
    if bit == 0:
        return [init & MASK32] * n
    if bit == 32:
        return [int.from_bytes(data[4 * i:4 * i + 4], "little") for i in range(n)]
    rows = (n + 3) // 4
    nwords = (rows * bit + 31) // 32
    words = [int.from_bytes(data[4 * j:4 * j + 4], "little")
             for j in range(nwords * 4)]
    out = []
    for i in range(n):
        lane, k = i % 4, i // 4
        off = k * bit
        w, s = off // 32, off % 32
        v = words[4 * w + lane] >> s
        if s + bit > 32:
            v |= words[4 * (w + 1) + lane] << (32 - s)
        out.append((init + (v & ((1 << bit) - 1))) & MASK32)
    return out


def pack_d1_block(init: int, values: list[int], bit: int) -> bytes:
    """simdpackwithoutmaskd1 over one full 128-block: wrapping deltas then
    plain pack; b=32 -> raw ORIGINAL values (ipackwithoutmask32)."""
    assert len(values) == 128
    if bit == 0:
        return b""
    if bit == 32:
        return b"".join((v & MASK32).to_bytes(4, "little") for v in values)
    deltas = [(values[0] - init) & MASK32] + [
        (values[i] - values[i - 1]) & MASK32 for i in range(1, 128)]
    return _pack_stream(deltas, bit)


def unpack_d1_block(init: int, data: bytes, bit: int) -> list[int]:
    if bit == 0:
        return [init & MASK32] * 128
    if bit == 32:
        return [int.from_bytes(data[4 * i:4 * i + 4], "little") for i in range(128)]
    deltas = unpack_plain(data, 128, bit)
    out, acc = [], init & MASK32
    for d in deltas:
        acc = (acc + d) & MASK32
        out.append(acc)
    return out


def compressed_bytes(length: int, bit: int) -> int:
    if bit == 0:
        return 0
    if bit == 32:
        return length * 4
    return (((length + 3) // 4) * bit + 31) // 32 * 16
