"""Codec-layer tests: batched block engine vs the single-array kernel
oracles, round-trips for every codec over the FIXTURES.md pattern corpus,
auto-selector sanity."""

from __future__ import annotations

import numpy as np
import pytest

from simdcomp_spark import blocks, kernels as K
from simdcomp_spark.codecs import REGISTRY
from simdcomp_spark.codecs import fsst
from simdcomp_spark.codecs.auto import choose_codec

U32 = np.uint32
RNG = np.random.default_rng(42)

LENGTHS = [0, 1, 2, 3, 4, 5, 127, 128, 129, 255, 256, 257, 1000, 4096]


def corpus() -> list[np.ndarray]:
    """FIXTURES.md row patterns."""
    rows = []
    for b in (0, 1, 7, 16, 30):
        for n in (1, 127, 128, 129, 1000):
            rows.append(np.full(n, (1 << b) - 1, dtype=U32))          # const_bw
    for b in (1, 5, 11, 20, 31, 32):
        mask = 0xFFFFFFFF if b == 32 else (1 << b) - 1
        for n in LENGTHS:
            rows.append(RNG.integers(0, 2**32, size=n, dtype=U32) & U32(mask))
    for g in (1, 3, 81, 243):                                          # sorted_gap
        rows.append(np.cumsum(RNG.integers(0, g + 1, size=500, dtype=U32)).astype(U32))
    for g in (3, 19683, 387420489):                                    # lingap wrap
        rows.append((np.arange(300, dtype=np.uint64) * g).astype(U32))
    rows.append(RNG.integers(0, 50257, size=1024, dtype=U32))          # tokenish
    rows.append(np.repeat(RNG.integers(0, 100, size=30, dtype=U32),
                          RNG.integers(1, 40, size=30)))               # runs
    rows.append(np.empty(0, dtype=U32))
    return rows


def test_block_batch_matches_single_array_kernels():
    """encode_batch('plain') must byte-match simdpack_length applied per row
    with per-block maxbits — i.e. the demo format of example.c minus the
    inline headers."""
    arrs = corpus()
    widths, inits, payloads = blocks.encode_batch(arrs, "plain")
    for a, w, p in zip(arrs, widths, payloads):
        wid = np.frombuffer(w, dtype=np.uint8)
        expect = b""
        for i in range(0, a.size, 128):
            blk = a[i:i + 128]
            b = K.maxbits(blk)
            assert b == wid[i // 128]
            expect += K.simdpack_length(blk, b)
        assert p == expect


def test_block_batch_for_matches_kernel():
    arrs = [a for a in corpus() if a.size]
    widths, inits, payloads = blocks.encode_batch(arrs, "for")
    for a, w, ini, p in zip(arrs, widths, inits, payloads):
        wid = np.frombuffer(w, dtype=np.uint8)
        bases = np.frombuffer(ini, dtype=U32)
        expect = b""
        for j, i in enumerate(range(0, a.size, 128)):
            blk = a[i:i + 128]
            mn, mx = K.minmax(blk)
            b = int(K.bits_u32(np.asarray([mx - mn], U32))[0])
            assert b == wid[j] and mn == bases[j]
            if b == 32:
                expect += blk.tobytes()
            else:
                expect += K.simdpackFOR_length(mn, blk, b)
        assert p == expect


def test_block_batch_d1_matches_reference_chaining():
    """Full 128-blocks of the d1 codec must byte-match the reference's
    chained simdpackwithoutmaskd1 (example.c:56-75) because our stored
    per-block init IS the previous element."""
    a = np.cumsum(RNG.integers(0, 100, size=512, dtype=U32)).astype(U32)
    widths, inits, payloads = blocks.encode_batch([a], "d1")
    wid = np.frombuffer(widths[0], np.uint8)
    ini = np.frombuffer(inits[0], U32)
    pos = 0
    prev = 0
    for j in range(4):
        blk = a[j * 128:(j + 1) * 128]
        assert ini[j] == prev
        b = K.maxbits_d1(blk, prev)
        assert wid[j] == b
        sz = K.compressed_bytes(128, b)
        expect = K.pack_blocks(K.deltas_u32(blk, prev).reshape(1, 128), b).tobytes() \
            if 0 < b < 32 else (blk.tobytes() if b == 32 else b"")
        assert payloads[0][pos:pos + sz] == expect
        pos += sz
        prev = int(blk[-1])


@pytest.mark.parametrize("name", ["bitpack", "for", "d1", "rle", "dict"])
def test_codec_roundtrip_corpus(name):
    codec = REGISTRY[name]
    arrs = corpus()
    n_toks = np.array([a.size for a in arrs])
    w, i, p = codec.encode_rows(arrs)
    back = codec.decode_rows(n_toks, w, i, p)
    for a, b in zip(arrs, back):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ["bitpack", "for", "d1", "rle", "dict"])
def test_payload_sizes_exact(name):
    codec = REGISTRY[name]
    arrs = [a for a in corpus()]
    sizes = codec.payload_sizes(arrs)
    _, _, payloads = codec.encode_rows(arrs)
    np.testing.assert_array_equal(sizes, [len(p) for p in payloads])


def test_bitpack_size_is_reference_bound():
    """north rule: compressed size ≤ reference bits(max)-per-block packing.
    For the bitpack codec it's exactly equal; the selector can only improve."""
    arrs = [a for a in corpus() if a.size]
    _, _, payloads = blocks.encode_batch(arrs, "plain")
    for a, p in zip(arrs, payloads):
        bound = sum(K.compressed_bytes(min(128, a.size - i), K.maxbits(a[i:i + 128]))
                    for i in range(0, a.size, 128))
        assert len(p) == bound


def test_auto_selector_prefers_sensible_codecs():
    sorted_rows = [np.cumsum(RNG.integers(0, 4, size=1000, dtype=U32)).astype(U32)
                   for _ in range(8)]
    name, costs = choose_codec(sorted_rows)
    assert name == "d1", costs
    const_rows = [np.repeat(U32(7), 5000) for _ in range(8)]
    name, costs = choose_codec(const_rows)
    # a 1-entry dict (codes at 0 bits) is even cheaper than RLE here
    assert name in ("rle", "dict") and costs[name] < costs["bitpack"], costs
    run_rows = [np.repeat(RNG.integers(0, 2**30, size=100, dtype=U32),
                          RNG.integers(40, 60, size=100)) for _ in range(8)]
    name, costs = choose_codec(run_rows)
    assert name == "rle", costs
    shifted = [U32(1 << 30) + RNG.integers(0, 16, size=1000).astype(U32)
               for _ in range(8)]
    name, costs = choose_codec(shifted)
    assert name in ("for", "d1"), costs
    random_rows = [RNG.integers(0, 50257, size=1000, dtype=U32) for _ in range(8)]
    name, costs = choose_codec(random_rows)
    assert name in ("bitpack", "for"), costs
    # every candidate's predicted bytes must be achievable (≥ actual is a bug)
    for codec_name, predicted in costs.items():
        codec = REGISTRY[codec_name]
        w, i, p = codec.encode_rows(random_rows)
        actual = sum(len(x) for x in p)
        assert predicted >= actual  # prediction includes metadata overhead


def test_fsst_roundtrip():
    strings = [f"doc_{i:08d}_common_prefix_{i % 7}".encode() for i in range(200)]
    strings += [b"", b"x", b"\xff\x00\xfe escape bytes \xff\xff"]
    table, encs = fsst.encode_batch(strings)
    back = fsst.decode_batch(encs, table)
    assert back == strings
    # compresses the redundant corpus
    assert sum(map(len, encs)) < sum(map(len, strings))
    # table survives serialization
    t2 = fsst.SymbolTable.deserialize(table.serialize())
    assert fsst.decode_batch(encs, t2) == strings
    assert [t2.encode(s) for s in strings] == encs


def test_fsst_native_numpy_identical():
    """The optional C kernel and the batched-numpy path must produce
    byte-identical encodes and decodes from the same tables."""
    import os
    import numpy as np
    from simdcomp_spark import native

    rng = np.random.default_rng(99)
    docs = [bytes(rng.integers(97, 123, size=int(n)).astype(np.uint8))
            for n in rng.integers(0, 400, size=200)]
    docs += [b"", b"\xff" * 9, bytes(range(256)), b"\xff\xff\x00"]
    table = fsst.SymbolTable(fsst.train(docs[:64]))
    flat = np.frombuffer(b"".join(docs), np.uint8)
    lens = np.fromiter(map(len, docs), np.int64, count=len(docs))
    bounds = np.concatenate(([0], np.cumsum(lens)))
    c = native.encode_flat(table, flat, bounds)
    if c is None:
        import pytest
        pytest.skip("no C toolchain: numpy fallback is the only path")
    os.environ["SIMDCOMP_NO_NATIVE"] = "1"
    native._lib, native._tried = None, False
    try:
        np_out, np_lens = table.encode_flat(flat, lens)
        assert np.array_equal(c[0], np_out) and np.array_equal(c[1], np_lens)
        np_dec, np_dl = table.decode_flat(np_out, np_lens)
    finally:
        del os.environ["SIMDCOMP_NO_NATIVE"]
        native._lib, native._tried = None, False
    cd = native.decode_flat(table, c[0], np.concatenate(([0],
                                                         np.cumsum(c[1]))))
    assert np.array_equal(cd[0], np_dec) and np.array_equal(cd[1], np_dl)
    assert np.array_equal(cd[0], flat) and np.array_equal(cd[1], lens)


def test_flat_codec_native_numpy_identical():
    """The fused C block codec (analyze+pack / unpack on flat buffers) must
    be byte-identical to the grouped-numpy path for every mode, including
    b==32 raw blocks, empty rows (incl. trailing), and multi-block rows."""
    import os
    import numpy as np
    from simdcomp_spark import blocks, native

    if not native.have_flat_codec():
        import pytest
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(123)
    lens = np.array([0, 1, 5, 127, 128, 129, 300, 1000, 4096, 50, 0])
    tot = int(lens.sum())
    base = np.cumsum(rng.integers(0, 64, size=tot, dtype=np.uint32),
                     dtype=np.uint64).astype(np.uint32)
    wide = rng.integers(0, 2**32, size=tot, dtype=np.uint64) \
        .astype(np.uint32)
    mixed = np.where(rng.random(tot) < 0.05, wide, base).astype(np.uint32)
    for mode, buf in (("plain", mixed), ("d1", base), ("for", mixed)):
        enc_c = blocks.encode_flat(buf, lens, mode)
        dec_c = blocks.decode_flat(lens, enc_c.widths, enc_c.inits,
                                   enc_c.payload, enc_c.payload_lens, mode)
        os.environ["SIMDCOMP_NO_NATIVE"] = "1"
        native._lib, native._tried = None, False
        try:
            enc_n = blocks.encode_flat(buf, lens, mode)
            dec_n = blocks.decode_flat(lens, enc_c.widths, enc_c.inits,
                                       enc_c.payload, enc_c.payload_lens,
                                       mode)
        finally:
            del os.environ["SIMDCOMP_NO_NATIVE"]
            native._lib, native._tried = None, False
        assert np.array_equal(enc_c.payload, enc_n.payload), mode
        assert np.array_equal(enc_c.widths, enc_n.widths), mode
        assert np.array_equal(enc_c.inits, enc_n.inits), mode
        assert np.array_equal(enc_c.payload_lens, enc_n.payload_lens), mode
        assert np.array_equal(dec_c, buf) and np.array_equal(dec_n, buf), mode


def test_dict_rle_native_numpy_identical():
    """The C dict_streams / gather_rows / dict_gather kernels must produce
    byte-identical encodes and decodes to the pure-numpy paths for the dict
    and rle codecs, across empty rows, constant rows, wide values, and
    multi-block rows."""
    import os
    from simdcomp_spark import native
    from simdcomp_spark.codecs import REGISTRY

    if native._load() is None:
        pytest.skip("no C toolchain: numpy fallback is the only path")
    rng = np.random.default_rng(41)
    rows = [np.zeros(0, np.uint32),
            rng.integers(0, 1 << 16, 300, dtype=np.int64).astype(np.uint32),
            np.full(400, 0xFFFFFFFF, np.uint32),
            np.repeat(rng.integers(0, 9, 40, dtype=np.int64), 13
                      ).astype(np.uint32),
            rng.integers(0, 1 << 31, 700, dtype=np.int64).astype(np.uint32),
            np.zeros(0, np.uint32)]
    flat = np.concatenate(rows)
    lens = np.fromiter((r.size for r in rows), np.int64, count=len(rows))
    for name in ("dict", "rle"):
        codec = REGISTRY[name]
        ce = codec.encode_flat(flat, lens)
        cdec = codec.decode_flat(lens, ce.widths, ce.widths_lens, ce.inits,
                                 ce.inits_lens, ce.payload, ce.payload_lens)
        os.environ["SIMDCOMP_NO_NATIVE"] = "1"
        native._lib, native._tried = None, False
        try:
            ne = codec.encode_flat(flat, lens)
            assert np.array_equal(ce.payload, ne.payload), name
            assert np.array_equal(ce.payload_lens, ne.payload_lens), name
            ndec = codec.decode_flat(lens, ne.widths, ne.widths_lens,
                                     ne.inits, ne.inits_lens, ne.payload,
                                     ne.payload_lens)
        finally:
            del os.environ["SIMDCOMP_NO_NATIVE"]
            native._lib, native._tried = None, False
        assert np.array_equal(cdec, ndec) and np.array_equal(cdec, flat), name


def test_content_hash_native_numpy_identical():
    """The C block-Horner content hash must be bit-identical to the numpy
    prefix-sum formulation across empty rows, tail lengths 1-3 (the
    unroll remainder), wide values, and long rows; distinct inputs must
    hash apart (the dedup-key contract)."""
    import os
    from simdcomp_spark import kernels as K, native

    if native._load() is None:
        pytest.skip("no C toolchain: numpy fallback is the only path")
    rng = np.random.default_rng(43)
    rows = [np.zeros(0, np.uint32),
            rng.integers(0, 1 << 31, 1, dtype=np.int64).astype(np.uint32),
            rng.integers(0, 1 << 31, 2, dtype=np.int64).astype(np.uint32),
            rng.integers(0, 1 << 31, 3, dtype=np.int64).astype(np.uint32),
            np.full(257, 0xFFFFFFFF, np.uint32),
            rng.integers(0, 1 << 16, 5000, dtype=np.int64).astype(np.uint32),
            np.zeros(128, np.uint32)]
    flat = np.concatenate(rows)
    lens = np.fromiter((r.size for r in rows), np.int64, count=len(rows))
    fast = np.asarray(K.content_hash_flat(flat, lens)).copy()
    os.environ["SIMDCOMP_NO_NATIVE"] = "1"
    native._lib, native._tried = None, False
    try:
        ref = np.asarray(K.content_hash_flat(flat, lens))
    finally:
        del os.environ["SIMDCOMP_NO_NATIVE"]
        native._lib, native._tried = None, False
    assert np.array_equal(fast, ref)
    hs = {bytes(h) for h in fast.reshape(lens.size, 16)}
    assert len(hs) == lens.size               # all-distinct rows hash apart

    # int32 input with NEGATIVE values (Arrow tokens are int32): both
    # paths must agree in the uint32 domain — a sign-extending numpy
    # astype(uint64) would silently hash apart from the C path
    neg = np.array([-1, 5, -2147483648, 7, 123, -42], dtype=np.int32)
    nlens = np.array([3, 3], dtype=np.int64)
    fast_neg = np.asarray(K.content_hash_flat(neg.view(np.uint32),
                                              nlens)).copy()
    os.environ["SIMDCOMP_NO_NATIVE"] = "1"
    native._lib, native._tried = None, False
    try:
        ref_neg = np.asarray(K.content_hash_flat(neg, nlens))
    finally:
        del os.environ["SIMDCOMP_NO_NATIVE"]
        native._lib, native._tried = None, False
    assert np.array_equal(fast_neg, ref_neg)


def test_dict_d1_values_extreme_deltas():
    """The dict values sub-stream is delta-packed; full-range u32 deltas
    must route through the b==32 raw-block path and round-trip exactly."""
    from simdcomp_spark.codecs import REGISTRY
    c = REGISTRY["dict"]
    rows = [np.array([0, 2**32 - 1], np.uint32),
            np.array([2**32 - 1] * 7 + [0], np.uint32),
            np.arange(2**32 - 130, 2**32, dtype=np.uint32),
            np.array([1], np.uint32),
            np.zeros(0, np.uint32)]
    flat = np.concatenate(rows)
    lens = np.fromiter((r.size for r in rows), np.int64, count=len(rows))
    e = c.encode_flat(flat, lens)
    d = c.decode_flat(lens, e.widths, e.widths_lens, e.inits, e.inits_lens,
                      e.payload, e.payload_lens)
    assert np.array_equal(d, flat)
    assert np.array_equal(np.asarray(c.payload_sizes_flat(flat, lens)),
                          e.payload_lens)
