"""Run-length codec (north-rule addition; not in the reference — see
SURVEY.md §2.6).  Good for padding/repeated tokens.

Wire format per row:
    u32 n_runs | u8 bv | u8 bl | u16 pad |
    simdpack_length(run_values, bv) | simdpack_length(run_lengths - 1, bl)

Both sub-streams reuse the reference bit-packing layout (simdpack_length,
src/simdbitpacking.c:14379), so RLE inherits the bit-identical kernels.
Run lengths are stored minus 1 (a run is never empty), which lets
all-distinct data degrade to bl=0.
"""

from __future__ import annotations

import numpy as np

from .. import kernels as K
from .base import Codec

U32 = np.uint32
_HDR = 8


def _runs_per_batch(arrs: list[np.ndarray]):
    """Vectorized run detection across the whole batch.

    Returns (run_values, run_lengths, runs_per_row) flat arrays.
    """
    nrows = len(arrs)
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=nrows)
    flat = np.concatenate([np.ascontiguousarray(a, dtype=U32) for a in arrs]) \
        if nrows > 1 else np.ascontiguousarray(arrs[0], dtype=U32)
    total = flat.size
    if total == 0:
        return (np.empty(0, U32), np.empty(0, np.int64),
                np.zeros(nrows, np.int64))
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    is_start = np.ones(total, dtype=bool)
    is_start[1:] = flat[1:] != flat[:-1]
    is_start[row_starts[lens > 0]] = True
    start_idx = np.nonzero(is_start)[0]
    run_lens = np.diff(np.concatenate((start_idx, [total])))
    run_vals = flat[start_idx]
    # count runs per row
    row_of_run = np.searchsorted(np.cumsum(lens), start_idx, side="right")
    runs_per_row = np.bincount(row_of_run, minlength=nrows).astype(np.int64)
    return run_vals, run_lens, runs_per_row


class RLECodec(Codec):
    name = "rle"
    _per_block_overhead = 0

    def encode_rows(self, arrs):
        run_vals, run_lens, rpr = _runs_per_batch(arrs)
        payloads = []
        pos = 0
        for r in range(len(arrs)):
            nr = int(rpr[r])
            if nr == 0:
                payloads.append(b"")
                continue
            vals = run_vals[pos:pos + nr]
            lens1 = (run_lens[pos:pos + nr] - 1).astype(U32)
            pos += nr
            bv, bl = K.maxbits(vals), K.maxbits(lens1)
            hdr = int(nr).to_bytes(4, "little") + bytes([bv, bl, 0, 0])
            payloads.append(hdr + K.simdpack_length(vals, bv)
                            + K.simdpack_length(lens1, bl))
        n = len(arrs)
        return [b""] * n, [b""] * n, payloads

    def decode_rows(self, n_toks, widths, inits, payloads):
        out = []
        for n, p in zip(n_toks, payloads):
            n = int(n)
            if n == 0:
                out.append(np.empty(0, U32))
                continue
            nr = int.from_bytes(p[:4], "little")
            bv, bl = p[4], p[5]
            vb = K.compressed_bytes(nr, bv)
            vals = K.simdunpack_length(p[_HDR:_HDR + vb], nr, bv)
            lens = K.simdunpack_length(p[_HDR + vb:], nr, bl).astype(np.int64) + 1
            out.append(np.repeat(vals, lens))
        return out

    def payload_sizes(self, arrs):
        run_vals, run_lens, rpr = _runs_per_batch(arrs)
        nrows = len(arrs)
        sizes = np.zeros(nrows, dtype=np.int64)
        if run_vals.size == 0:
            return sizes
        # per-row maxbits of run values / (lens-1) via segmented OR
        offsets = np.concatenate(([0], np.cumsum(rpr)[:-1]))
        nz = rpr > 0
        bv = np.zeros(nrows, np.int64)
        bl = np.zeros(nrows, np.int64)
        if nz.any():
            orv = np.bitwise_or.reduceat(run_vals, offsets[nz])
            orl = np.bitwise_or.reduceat((run_lens - 1).astype(U32), offsets[nz])
            bv[nz] = K.bits_u32(orv)
            bl[nz] = K.bits_u32(orl)
        sizes[nz] = (_HDR + K.compressed_bytes_arr(rpr[nz], bv[nz])
                     + K.compressed_bytes_arr(rpr[nz], bl[nz]))
        return sizes
