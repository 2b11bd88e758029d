"""Batched multi-row block codec: ragged rows of uint32 tokens ⇄ per-row
(widths, inits, payload) triples in the simdcomp wire format.

This is the layer between the Arrow batch a Spark UDF receives and the
per-width numpy kernels in :mod:`simdcomp_spark.kernels`.  Design:

* every row is segmented into full 128-int blocks + one short tail block,
  exactly like ``simdpack_length`` (/root/reference/src/simdbitpacking.c:14379);
* each block gets its own width ``b`` (the reference's per-block ``maxbits``
  adaptive width, /root/reference/example.c:143-145) stored as one uint8 in a
  per-row ``widths`` binary column — Spark columns replace the demo format's
  1-byte stream header (/root/reference/example.c:68);
* FOR blocks store a per-block uint32 base (block min, as in
  /root/reference/tests/unit.c:659-666); d1 blocks store the per-block chain
  init (previous element), making every block independently decodable — the
  reference chains offsets sequentially (/root/reference/example.c:71), we
  trade 4 bytes/block for embarrassing parallelism (SURVEY.md §3.2);
* all heavy work is grouped by (block length, width) so each group is ONE
  vectorized pack/unpack over a dense matrix — no per-row numpy calls, no
  per-value Python;
* the native interface is FLAT (one values buffer + row lengths, one payload
  buffer + row payload lengths) so the Spark ``mapInArrow`` path moves
  Arrow list/binary columns in and out with zero per-row materialization.

Wire-format invariants (verified bit-identical in tests/test_kernels.py):
full blocks match ``simdpackwithoutmask``/``simdpackFOR``/
``simdpackwithoutmaskd1``; tails match ``simdpack_shortlength`` semantics
(d1 tails are an engine extension: short-layout over deltas).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import kernels as K

U32 = np.uint32
MODES = ("plain", "for", "d1")


@dataclass
class EncodedFlat:
    """Flat encode result for a batch of rows, in (row, block-seq) order."""
    nblocks: np.ndarray       # int64 per row
    widths: np.ndarray        # uint8 per block
    inits: np.ndarray         # uint32 per block ('' families: size 0)
    payload: np.ndarray       # uint8, concatenated per-block packed bytes
    payload_lens: np.ndarray  # int64 per row

    def widths_offsets(self) -> np.ndarray:
        return np.concatenate(([0], np.cumsum(self.nblocks)))

    def payload_offsets(self) -> np.ndarray:
        return np.concatenate(([0], np.cumsum(self.payload_lens)))


def _block_table(lens: np.ndarray):
    """Vectorized block table for a batch of row lengths.

    Returns (row_id, blk_start_in_flat, blk_len, nblocks-per-row) for every
    block, in (row, seq) order.
    """
    lens = np.asarray(lens, dtype=np.int64)
    nblocks = (lens + K.FULL_BLOCK - 1) // K.FULL_BLOCK
    total = int(nblocks.sum())
    row_id = np.repeat(np.arange(lens.size, dtype=np.int64), nblocks)
    ends = np.cumsum(nblocks)
    seq = np.arange(total, dtype=np.int64) - np.repeat(ends - nblocks, nblocks)
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    blk_start = row_starts[row_id] + seq * K.FULL_BLOCK
    blk_len = np.minimum(lens[row_id] - seq * K.FULL_BLOCK, K.FULL_BLOCK)
    return row_id, blk_start, blk_len, nblocks


def _gather_rows(flat: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    """(len(starts), length) matrix gathered from flat at given starts."""
    if starts.size == 0:
        return np.empty((0, length), dtype=flat.dtype)
    idx = starts[:, None] + np.arange(length, dtype=np.int64)[None, :]
    return np.take(flat, idx)  # ~100x faster than flat[idx] on this numpy


def encode_flat(flat: np.ndarray, lens: np.ndarray, mode: str) -> EncodedFlat:
    """Encode a batch given as one flat uint32 buffer + per-row lengths."""
    assert mode in MODES
    flat = np.ascontiguousarray(flat, dtype=U32)
    lens = np.asarray(lens, dtype=np.int64)
    nrows = lens.size
    if flat.size == 0:
        z = np.zeros(nrows, dtype=np.int64)
        return EncodedFlat((lens + 127) // 128, np.zeros(0, np.uint8),
                           np.zeros(0, U32), np.zeros(0, np.uint8), z)

    row_id, blk_start, blk_len, nblocks = _block_table(lens)
    total_blocks = row_id.size
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))

    widths = np.zeros(total_blocks, dtype=np.uint8)
    src = flat
    if mode == "d1":
        first_of_row = blk_start == row_starts[row_id]
        safe_prev = np.where(first_of_row, 0, blk_start - 1)
        inits = np.where(first_of_row, U32(0),
                         np.take(flat, safe_prev)).astype(U32)
        # fused delta pass: per-block init == previous element, so every
        # within-row delta is just the GLOBAL adjacent diff (one contiguous
        # SIMD subtract) — only row firsts need init-0 fixup.  The per-group
        # matrix subtract + extra alloc this replaces halved d1 encode
        # throughput vs bitpack.
        src = np.empty_like(flat)
        np.subtract(flat[1:], flat[:-1], out=src[1:])
        # row firsts (of NON-EMPTY rows only: an empty trailing row's start
        # is one past the buffer): init is 0, delta == the value itself
        rs = row_starts[lens > 0]
        src[rs] = np.take(flat, rs)
    else:
        inits = np.zeros(total_blocks if mode == "for" else 0, dtype=U32)

    # fused C fast path: analyze + pack directly on the flat buffers —
    # one pass each, no (nblk, blen) matrices (native.py; numpy fallback
    # below is byte-identical and remains the portable path)
    from . import native
    if native.have_flat_codec():
        blk_len32 = blk_len.astype(np.int32)
        cinits = inits if mode != "plain" else np.zeros(1, dtype=U32)
        if mode == "for":
            inits = cinits = np.empty(total_blocks, dtype=U32)
        widths = native.analyze_blocks(src, blk_start, blk_len32, mode,
                                       cinits)
        sizes = K.compressed_bytes_arr(blk_len, widths.astype(np.int64))
        dst = np.cumsum(sizes) - sizes
        payload = np.empty(int(sizes.sum()), dtype=np.uint8)
        native.pack_blocks_flat(src, flat, blk_start, blk_len32, widths,
                                cinits, dst, mode, payload)
        payload_lens = np.zeros(nrows, dtype=np.int64)
        np.add.at(payload_lens, row_id, sizes)
        return EncodedFlat(nblocks, widths, inits, payload, payload_lens)

    # pass 1: analyze (widths per block), grouped by block length
    group_cache: list[tuple[np.ndarray, np.ndarray, int]] = []
    for blen in np.unique(blk_len):
        blen = int(blen)
        sel = np.nonzero(blk_len == blen)[0]
        mat = _gather_rows(src, blk_start[sel], blen)
        if mode == "for":
            mn = mat.min(axis=1)
            inits[sel] = mn
            widths[sel] = K.bits_u32(mat.max(axis=1) - mn).astype(np.uint8)
            vals = mat - mn[:, None]
        else:  # plain / d1 (src already holds deltas for d1)
            vals = mat
            widths[sel] = K.maxbits_rows(mat).astype(np.uint8)
        group_cache.append((sel, vals, blen))

    # sizes + destination offsets (blocks are already in (row, seq) order)
    sizes = K.compressed_bytes_arr(blk_len, widths.astype(np.int64))
    dst = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    payload = np.zeros(int(sizes.sum()), dtype=np.uint8)

    # pass 2: pack per (blen, width) group, scatter into the payload buffer
    for sel, vals, blen in group_cache:
        w_here = widths[sel]
        for b in np.unique(w_here):
            b = int(b)
            if b == 0:
                continue
            gmask = w_here == b
            gsel = sel[gmask]
            if b == 32:
                # raw ORIGINAL values in all families (simdbitpacking.c:14198,
                # ipackFOR32 simdfor.c:6954, ipackwithoutmask32)
                by = _gather_rows(flat, blk_start[gsel], blen) \
                    .view(np.uint8).reshape(gsel.size, blen * 4)
            else:
                padded = vals[gmask]
                if blen % 4:
                    pad = np.zeros((padded.shape[0], 4 - blen % 4), dtype=U32)
                    padded = np.concatenate([padded, pad], axis=1)
                by = K.pack_blocks(np.ascontiguousarray(padded), b)
            idx = dst[gsel][:, None] + np.arange(by.shape[1], dtype=np.int64)
            payload[idx] = by

    payload_lens = np.zeros(nrows, dtype=np.int64)
    np.add.at(payload_lens, row_id, sizes)
    return EncodedFlat(nblocks, widths, inits, payload, payload_lens)


def decode_flat(lens: np.ndarray, widths: np.ndarray, inits: np.ndarray,
                payload: np.ndarray, payload_lens: np.ndarray, mode: str
                ) -> np.ndarray:
    """Inverse of :func:`encode_flat`: returns the flat uint32 token buffer
    (row offsets = cumsum of ``lens``)."""
    assert mode in MODES
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    out = np.empty(total, dtype=U32)
    if total == 0:
        return out
    row_id, blk_start, blk_len, nblocks = _block_table(lens)
    total_blocks = row_id.size
    widths = np.ascontiguousarray(widths, dtype=np.uint8)
    assert widths.size == total_blocks, (widths.size, total_blocks)
    if mode != "plain":
        inits = np.ascontiguousarray(inits, dtype=U32)

    sizes = K.compressed_bytes_arr(blk_len, widths.astype(np.int64))
    # per-block source offset: exclusive cumsum restarted per row, plus the
    # row's payload start
    excl = np.cumsum(sizes) - sizes
    row_first_block = np.cumsum(nblocks) - nblocks
    row_base = excl[np.minimum(row_first_block, total_blocks - 1)]
    row_pl_starts = np.concatenate(([0], np.cumsum(payload_lens)[:-1]))
    src_start = row_pl_starts[row_id] + (excl - row_base[row_id])
    payload = np.ascontiguousarray(payload, dtype=np.uint8)

    # fused C fast path: one pass, codec semantics applied in-block
    from . import native
    if native.have_flat_codec():
        cinits = inits if mode != "plain" else np.zeros(1, dtype=U32)
        native.unpack_blocks_flat(payload, src_start, blk_start,
                                  blk_len.astype(np.int32), widths,
                                  cinits, mode, out)
        return out

    keys = blk_len.astype(np.int64) * 64 + widths.astype(np.int64)
    for key in np.unique(keys):
        blen, b = int(key) // 64, int(key) % 64
        sel = np.nonzero(keys == key)[0]
        nb = int(sizes[sel[0]])
        if b == 0:
            # plain: zeros; FOR: broadcast base; d1: broadcast chain init
            # (iunpackFOR0 src/simdfor.c:7-20, iunpack0
            # src/simdintegratedbitpacking.c:21-35)
            src0 = inits[sel] if mode != "plain" else np.zeros(sel.size, U32)
            vals = np.broadcast_to(src0[:, None], (sel.size, blen))
        else:
            seg = _gather_rows(payload, src_start[sel], nb)
            if b == 32:
                vals = np.ascontiguousarray(seg).view(U32).reshape(sel.size, blen)
            else:
                rows4 = (blen + 3) // 4
                words = np.ascontiguousarray(seg).view(U32).reshape(sel.size, -1, 4)
                vals = K.unpack_lanes(words, rows4, b).reshape(sel.size, -1)[:, :blen]
                if mode == "for":
                    vals = vals + inits[sel][:, None]
                elif mode == "d1":
                    acc = np.cumsum(vals, axis=1, dtype=np.uint64) + \
                        inits[sel][:, None].astype(np.uint64)
                    vals = acc.astype(U32)
        idx = blk_start[sel][:, None] + np.arange(blen, dtype=np.int64)[None, :]
        out[idx] = vals
    return out


# ---------------------------------------------------------------------------
# Batched compressed-domain point ops — the vectorized forms of
# ``simdselectFOR``/``simdselectd1`` (/root/reference/src/simdfor.c:14987,
# src/simdpackedselect.c:8096) and ``simdsearchd1``+``simdscand1`` lifted to
# the zone-map level (src/simdpackedsearch.c).  One row batch → one pass of
# grouped unpacks; NO per-row Python.
# ---------------------------------------------------------------------------

def _block_geometry(lens: np.ndarray, widths: np.ndarray):
    """Shared offset math: per-block sizes + per-row payload byte offsets."""
    row_id, blk_start, blk_len, nblocks = _block_table(lens)
    widths = np.ascontiguousarray(widths, dtype=np.uint8)
    assert widths.size == row_id.size, (widths.size, row_id.size)
    sizes = K.compressed_bytes_arr(blk_len, widths.astype(np.int64))
    excl = np.cumsum(sizes) - sizes            # global exclusive cumsum
    row_first_block = np.cumsum(nblocks) - nblocks
    return row_id, blk_len, nblocks, widths, sizes, excl, row_first_block


def _decode_block_group(payload, src, blen, b, mode, inits_grp):
    """Decode one (width, block-length) group of target blocks into a dense
    (g, blen) uint32 matrix with codec semantics applied."""
    g = src.size
    if b == 0:
        # plain: zeros; FOR/d1: every value equals the block init
        base = inits_grp if mode != "plain" else np.zeros(g, U32)
        return np.broadcast_to(base[:, None], (g, blen))
    nb = int(K.compressed_bytes(blen, b))
    seg = _gather_rows(payload, src, nb)
    if b == 32:  # raw ORIGINAL values in all families
        return np.ascontiguousarray(seg).view(U32).reshape(g, blen)
    words = np.ascontiguousarray(seg).view(U32).reshape(g, -1, 4)
    vals = K.unpack_lanes(words, (blen + 3) // 4, b).reshape(g, -1)[:, :blen]
    if mode == "for":
        return vals + inits_grp[:, None]
    if mode == "d1":
        acc = np.cumsum(vals, axis=1, dtype=np.uint64) \
            + inits_grp[:, None].astype(np.uint64)
        return acc.astype(U32)
    return vals


def select_flat(lens: np.ndarray, widths: np.ndarray, inits: np.ndarray,
                payload: np.ndarray, payload_lens: np.ndarray,
                idxs: np.ndarray, mode: str) -> np.ndarray:
    """Value at position ``idxs[r]`` of every row — decoding AT MOST ONE
    block per row.  All indices must satisfy ``0 <= idx < len`` (callers
    filter first).  Returns uint32 per row."""
    assert mode in MODES
    lens = np.asarray(lens, dtype=np.int64)
    idxs = np.asarray(idxs, dtype=np.int64)
    out = np.zeros(lens.size, dtype=U32)
    if lens.size == 0 or int(lens.sum()) == 0:
        return out
    (row_id, blk_len, _nb, widths, _sizes, excl,
     row_first_block) = _block_geometry(lens, widths)
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    inits = np.ascontiguousarray(inits, dtype=U32) if mode != "plain" \
        else np.zeros(0, U32)
    row_pl_starts = np.concatenate(([0], np.cumsum(payload_lens)[:-1]))

    tb = row_first_block + idxs // K.FULL_BLOCK      # target block per row
    slot = (idxs % K.FULL_BLOCK).astype(np.int64)
    b_t = widths[tb].astype(np.int64)
    blen_t = blk_len[tb]
    src = row_pl_starts + (excl[tb] - excl[row_first_block])
    init_t = inits[tb] if mode != "plain" else np.zeros(tb.size, U32)

    keys = blen_t * 64 + b_t
    for key in np.unique(keys):
        blen, b = int(key) // 64, int(key) % 64
        sel = np.nonzero(keys == key)[0]
        vals = _decode_block_group(payload, src[sel], blen, b, mode,
                                   init_t[sel])
        out[sel] = vals[np.arange(sel.size), slot[sel]]
    return out


def search_sorted_flat(lens: np.ndarray, widths: np.ndarray,
                       inits: np.ndarray, payload: np.ndarray,
                       payload_lens: np.ndarray, key: int) -> np.ndarray:
    """Lower-bound index of ``key`` in every d1-encoded SORTED row, probing
    exactly one block per row: the per-block chain inits are the zone map
    (init of block j+1 == last value of block j), so only each row's LAST
    block and its single TARGET block are ever touched.  Returns int64 per
    row; idx == n when every value < key."""
    lens = np.asarray(lens, dtype=np.int64)
    out = np.zeros(lens.size, dtype=np.int64)
    if lens.size == 0 or int(lens.sum()) == 0:
        return out
    (row_id, blk_len, nblocks, widths, _sizes, excl,
     row_first_block) = _block_geometry(lens, widths)
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    inits = np.ascontiguousarray(inits, dtype=U32)
    row_pl_starts = np.concatenate(([0], np.cumsum(payload_lens)[:-1]))
    k32 = U32(key & 0xFFFFFFFF)
    total_blocks = row_id.size

    # zone map: last value of block j. Interior blocks read it from the next
    # block's chain init; each row's final block is decoded (grouped).
    lasts = np.empty(total_blocks, dtype=U32)
    lasts[:-1] = inits[1:]
    ne = np.nonzero(nblocks > 0)[0]
    last_blk = row_first_block[ne] + nblocks[ne] - 1
    src_last = row_pl_starts[ne] + (excl[last_blk] - excl[row_first_block[ne]])
    b_l = widths[last_blk].astype(np.int64)
    blen_l = blk_len[last_blk]
    keys_l = blen_l * 64 + b_l
    for kk in np.unique(keys_l):
        blen, b = int(kk) // 64, int(kk) % 64
        sel = np.nonzero(keys_l == kk)[0]
        vals = _decode_block_group(payload, src_last[sel], blen, b, "d1",
                                   inits[last_blk[sel]])
        lasts[last_blk[sel]] = vals[:, -1]

    # first block per row whose last value >= key (count of blocks < key)
    j = np.add.reduceat((lasts < k32).astype(np.int64),
                        row_first_block[ne])
    found = j < nblocks[ne]
    out[ne[~found]] = lens[ne[~found]]          # every value < key
    probe_rows = ne[found]
    if probe_rows.size:
        jf = j[found]
        tb = row_first_block[probe_rows] + jf
        src = row_pl_starts[probe_rows] + \
            (excl[tb] - excl[row_first_block[probe_rows]])
        b_t = widths[tb].astype(np.int64)
        blen_t = blk_len[tb]
        keys_t = blen_t * 64 + b_t
        within = np.empty(probe_rows.size, dtype=np.int64)
        for kk in np.unique(keys_t):
            blen, b = int(kk) // 64, int(kk) % 64
            sel = np.nonzero(keys_t == kk)[0]
            vals = _decode_block_group(payload, src[sel], blen, b, "d1",
                                       inits[tb[sel]])
            within[sel] = (vals < k32).sum(axis=1)
        out[probe_rows] = jf * K.FULL_BLOCK + within
    return out


def search_sorted_for_flat(lens: np.ndarray, widths: np.ndarray,
                           inits: np.ndarray, payload: np.ndarray,
                           payload_lens: np.ndarray, key: int) -> np.ndarray:
    """Lower-bound search over FOR-encoded SORTED rows, probing exactly one
    block per row — the engine-level multi-block extension of
    ``simdsearchwithlengthFOR`` (/root/reference/src/simdfor.c:15016-15032).

    Zone map: FOR stores each block's min as its init, which for sorted
    rows is the block's FIRST value.  The target is the first block j with
    (j is the last block) or first[j+1] >= key: every earlier block's last
    value ≤ first[j+1] < key, and if the probe finds nothing (< key
    throughout) the answer is the start of block j+1, whose first value is
    ≥ key by construction.  Returns int64 per row; idx == n when every
    value < key."""
    lens = np.asarray(lens, dtype=np.int64)
    out = np.zeros(lens.size, dtype=np.int64)
    if lens.size == 0 or int(lens.sum()) == 0:
        return out
    (row_id, blk_len, nblocks, widths, _sizes, excl,
     row_first_block) = _block_geometry(lens, widths)
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    inits = np.ascontiguousarray(inits, dtype=U32)
    row_pl_starts = np.concatenate(([0], np.cumsum(payload_lens)[:-1]))
    k32 = U32(key & 0xFFFFFFFF)

    ne = np.nonzero(nblocks > 0)[0]
    # count of blocks j' (excluding block 0) with first[j'] < key, per row —
    # that IS the target block index j (see docstring)
    not_first = np.ones(row_id.size, dtype=bool)
    # rows with 0 blocks have row_first_block == the NEXT row's first block
    # (or one past the end for a trailing empty row) — only mark rows that
    # actually own a first block, else a trailing empty row indexes OOB
    not_first[row_first_block[nblocks > 0]] = False
    lt = (inits < k32) & not_first
    j = np.add.reduceat(lt.astype(np.int64), row_first_block[ne])

    tb = row_first_block[ne] + j
    src = row_pl_starts[ne] + (excl[tb] - excl[row_first_block[ne]])
    b_t = widths[tb].astype(np.int64)
    blen_t = blk_len[tb]
    keys_t = blen_t * 64 + b_t
    within = np.empty(ne.size, dtype=np.int64)
    for kk in np.unique(keys_t):
        blen, b = int(kk) // 64, int(kk) % 64
        sel = np.nonzero(keys_t == kk)[0]
        vals = _decode_block_group(payload, src[sel], blen, b, "for",
                                   inits[tb[sel]])
        within[sel] = (vals < k32).sum(axis=1)
    # within == blen ⇒ answer is the start of the next block (or n)
    out[ne] = np.minimum(j * K.FULL_BLOCK + within, lens[ne])
    return out


def intersect_sorted_flat(lens_a: np.ndarray, widths_a: np.ndarray,
                          inits_a: np.ndarray, payload_a: np.ndarray,
                          plens_a: np.ndarray,
                          lens_b: np.ndarray, widths_b: np.ndarray,
                          inits_b: np.ndarray, payload_b: np.ndarray,
                          plens_b: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Rowwise sorted-set intersection of two d1-encoded batches — the
    inverted-index SvS kernel the reference's search/select symbols exist
    to serve (``simdsearchd1``'s per-block init zone map,
    /root/reference/src/simdpackedsearch.c, applied list-vs-list).

    Per row r: values common to A[r] and B[r], both SORTED ascending
    (the d1 contract :func:`search_sorted_flat` already assumes).  Side A
    (callers pass the smaller/probe side) decodes fully — one batched
    pass; side B is ZONE-SKIPPED: a B block decodes only when some A
    value of the same row falls inside its [init_b, next_init_b]
    envelope, so probe lists touching few blocks leave most of B's
    payload bytes unread.  With strictly increasing rows this is set
    intersection; if B carries duplicates the output keeps B's
    multiplicity for matched values.

    Everything is batch-vectorized — the per-row membership tests ride on
    ONE global ``searchsorted`` over (row_index << 32 | value) uint64
    keys, monotone because rows are concatenated in order and sorted
    within.  Returns (flat uint32 matches, int64 match count per row).
    """
    lens_a = np.asarray(lens_a, dtype=np.int64)
    lens_b = np.asarray(lens_b, dtype=np.int64)
    nrows = lens_a.size
    assert lens_b.size == nrows, (lens_a.size, lens_b.size)
    out_lens = np.zeros(nrows, dtype=np.int64)
    if nrows == 0 or int(lens_a.sum()) == 0 or int(lens_b.sum()) == 0:
        return np.zeros(0, dtype=U32), out_lens

    # side A: full batched decode → global monotone uint64 keys
    flat_a = decode_flat(lens_a, widths_a, inits_a, payload_a, plens_a,
                         "d1")
    row_of_a = np.repeat(np.arange(nrows, dtype=np.uint64),
                         lens_a).astype(np.uint64)
    keyed_a = (row_of_a << np.uint64(32)) | flat_a.astype(np.uint64)

    # side B geometry + per-block sorted-d1 envelopes (same zone math as
    # engine.contains_token's assume_sorted path: block b's values lie in
    # [init_b, init_{b+1}], each row's LAST block bounded by its own
    # cumulative-delta span)
    (row_id, blk_len, nblocks, widths_b, sizes, excl,
     row_first_block) = _block_geometry(lens_b, widths_b)
    total_blocks = row_id.size
    inits_b = np.ascontiguousarray(inits_b, dtype=U32)
    payload_b = np.ascontiguousarray(payload_b, dtype=np.uint8)
    row_pl_starts = np.concatenate(([0], np.cumsum(plens_b)[:-1]))
    row_base = excl[np.minimum(row_first_block, total_blocks - 1)]
    src_start = row_pl_starts[row_id] + (excl - row_base[row_id])

    span = np.where(widths_b >= 32, np.int64(0xFFFFFFFF),
                    (np.int64(1) << widths_b.astype(np.int64)) - 1)
    lb = inits_b.astype(np.int64)
    ub = np.empty(total_blocks, dtype=np.int64)
    ub[:-1] = lb[1:]
    ne = np.nonzero(nblocks > 0)[0]
    last_blk = row_first_block[ne] + nblocks[ne] - 1
    blen_last = lens_b[ne] - K.FULL_BLOCK * (nblocks[ne] - 1)
    ub[last_blk] = np.minimum(lb[last_blk] + blen_last * span[last_blk],
                              0xFFFFFFFF)

    rk = row_id.astype(np.uint64) << np.uint64(32)
    g_lb = rk | lb.astype(np.uint64)
    g_ub = rk | ub.astype(np.uint64)
    surv = np.nonzero(np.searchsorted(keyed_a, g_lb, side="left")
                      < np.searchsorted(keyed_a, g_ub, side="right"))[0]
    if surv.size == 0:
        return np.zeros(0, dtype=U32), out_lens

    # decode ONLY surviving blocks, grouped by (block length, width)
    cand_lens = blk_len[surv]
    cand_off = np.cumsum(cand_lens) - cand_lens
    cand_flat = np.empty(int(cand_lens.sum()), dtype=U32)
    keys = cand_lens * 64 + widths_b[surv].astype(np.int64)
    for key in np.unique(keys):
        blen, b = int(key) // 64, int(key) % 64
        sel = np.nonzero(keys == key)[0]
        vals = _decode_block_group(payload_b, src_start[surv[sel]], blen,
                                   b, "d1", inits_b[surv[sel]])
        idx = cand_off[sel][:, None] + np.arange(blen, dtype=np.int64)
        cand_flat[idx] = vals

    cand_row = np.repeat(row_id[surv], cand_lens).astype(np.uint64)
    keyed_c = (cand_row << np.uint64(32)) | cand_flat.astype(np.uint64)
    pos = np.searchsorted(keyed_a, keyed_c, side="left")
    hit = pos < keyed_a.size
    hit[hit] = keyed_a[pos[hit]] == keyed_c[hit]
    out_lens = np.bincount(cand_row[hit].astype(np.int64),
                           minlength=nrows).astype(np.int64)
    return cand_flat[hit], out_lens


# ---------------------------------------------------------------------------
# list-of-bytes wrappers (codec-registry interface; tests + pandas UDF path)
# ---------------------------------------------------------------------------

def _concat_rows(arrs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    nrows = len(arrs)
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=nrows)
    if nrows == 0 or lens.sum() == 0:
        return np.zeros(0, dtype=U32), lens
    if nrows == 1:
        return np.ascontiguousarray(arrs[0], dtype=U32), lens
    return np.concatenate([np.ascontiguousarray(a, dtype=U32) for a in arrs]), lens


def encode_batch(arrs: list[np.ndarray], mode: str
                 ) -> tuple[list[bytes], list[bytes], list[bytes]]:
    """Encode a batch of uint32 rows. Returns per-row (widths, inits, payload).

    widths = uint8 per block; inits = uint32-LE per block ('for': block min,
    'd1': chain init; 'plain': empty); payload = concatenated packed blocks.
    """
    flat, lens = _concat_rows(arrs)
    enc = encode_flat(flat, lens, mode)
    wo = enc.widths_offsets()
    po = enc.payload_offsets()
    wbuf, ibuf, pbuf = enc.widths.tobytes(), enc.inits.tobytes(), \
        enc.payload.tobytes()
    widths_out, inits_out, payload_out = [], [], []
    for r in range(lens.size):
        a, b = int(wo[r]), int(wo[r + 1])
        widths_out.append(wbuf[a:b])
        inits_out.append(ibuf[4 * a:4 * b] if mode != "plain" else b"")
        payload_out.append(pbuf[int(po[r]):int(po[r + 1])])
    return widths_out, inits_out, payload_out


def decode_batch(n_toks: np.ndarray, widths_list: list[bytes],
                 inits_list: list[bytes], payload_list: list[bytes],
                 mode: str) -> list[np.ndarray]:
    """Inverse of :func:`encode_batch`. Returns list of uint32 arrays."""
    lens = np.asarray(n_toks, dtype=np.int64)
    widths = np.frombuffer(b"".join(widths_list), dtype=np.uint8)
    inits = np.frombuffer(b"".join(inits_list), dtype=U32) \
        if mode != "plain" else np.zeros(0, U32)
    payload = np.frombuffer(b"".join(payload_list), dtype=np.uint8)
    payload_lens = np.fromiter((len(p) for p in payload_list),
                               dtype=np.int64, count=len(payload_list))
    out = decode_flat(lens, widths, inits, payload, payload_lens, mode)
    row_starts = np.concatenate(([0], np.cumsum(lens)))
    return [out[row_starts[r]:row_starts[r + 1]] for r in range(lens.size)]


def encoded_sizes_flat(flat: np.ndarray, lens: np.ndarray, mode: str
                       ) -> np.ndarray:
    """Exact payload bytes per row for ``mode`` WITHOUT materializing the
    payload — the analyze pass only (used by the codec auto-selector)."""
    flat = np.ascontiguousarray(flat, dtype=U32)
    lens = np.asarray(lens, dtype=np.int64)
    nrows = lens.size
    if flat.size == 0:
        return np.zeros(nrows, dtype=np.int64)
    row_id, blk_start, blk_len, nblocks = _block_table(lens)
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    widths = np.zeros(row_id.size, dtype=np.int64)
    for blen in np.unique(blk_len):
        blen = int(blen)
        sel = np.nonzero(blk_len == blen)[0]
        mat = _gather_rows(flat, blk_start[sel], blen)
        if mode == "plain":
            widths[sel] = K.maxbits_rows(mat)
        elif mode == "for":
            widths[sel] = K.bits_u32(mat.max(axis=1) - mat.min(axis=1))
        else:
            d = mat.copy()
            d[:, 1:] = mat[:, 1:] - mat[:, :-1]
            first = blk_start == row_starts[row_id]
            prev = np.where(first[sel], U32(0),
                            flat[np.maximum(blk_start[sel] - 1, 0)])
            d[:, 0] = mat[:, 0] - prev
            widths[sel] = K.maxbits_rows(d)
    sizes = K.compressed_bytes_arr(blk_len, widths)
    per_row = np.zeros(nrows, dtype=np.int64)
    np.add.at(per_row, row_id, sizes)
    return per_row


def encoded_sizes(arrs: list[np.ndarray], mode: str) -> np.ndarray:
    flat, lens = _concat_rows(arrs)
    return encoded_sizes_flat(flat, lens, mode)


def payload_bytes_from_widths(lens: np.ndarray, widths_flat: np.ndarray
                              ) -> np.ndarray:
    """Per-row payload byte counts reconstructed from row lengths + the flat
    per-block widths stream (decode-side bookkeeping; pure formula)."""
    lens = np.asarray(lens, dtype=np.int64)
    if widths_flat.size == 0:
        return np.zeros(lens.size, dtype=np.int64)
    row_id, _bs, blk_len, _nb = _block_table(lens)
    sizes = K.compressed_bytes_arr(blk_len, widths_flat.astype(np.int64))
    out = np.zeros(lens.size, dtype=np.int64)
    np.add.at(out, row_id, sizes)
    return out
