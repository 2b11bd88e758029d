"""Bit-identity and property tests for the numpy kernel core.

Three independent oracles:
1. golden.jsonl — byte vectors dumped from the COMPILED reference C library
   (tests/golden/gen_golden.c linked against /root/reference/src/*.c);
2. tests/reference_packer.py — a loop-based pure-Python packer implementing
   the layout literally;
3. round-trip identity + exact-size properties mirroring the reference's own
   suite (issue21 / testshortpack / testlongpack / test, tests/unit.c).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from simdcomp_spark import kernels as K
from tests import reference_packer as RP

GOLDEN = Path(__file__).parent / "golden" / "golden.jsonl"


def _golden_rows(family):
    with GOLDEN.open() as f:
        for line in f:
            row = json.loads(line)
            if row["family"] == family:
                yield row


# ---------------------------------------------------------------------------
# 1. Golden bytes from the compiled reference
# ---------------------------------------------------------------------------

def test_golden_plain_pack_and_unpack():
    n = 0
    for row in _golden_rows("plain"):
        data = np.array(row["data"], dtype=np.uint32)
        got = K.simdpack_length(data, row["bit"], mask=True)
        assert got.hex() == row["packed"], (row["bit"], row["len"])
        back = K.simdunpack_length(bytes.fromhex(row["packed"]), row["len"], row["bit"])
        np.testing.assert_array_equal(back, data)
        n += 1
    assert n > 500


def test_golden_for_pack_and_unpack():
    n = 0
    for row in _golden_rows("for"):
        data = np.array(row["data"], dtype=np.uint32)
        got = K.simdpackFOR_length(row["init"], data, row["bit"])
        assert got.hex() == row["packed"], (row["bit"], row["len"], row["init"])
        back = K.simdunpackFOR_length(row["init"], bytes.fromhex(row["packed"]),
                                      row["len"], row["bit"])
        np.testing.assert_array_equal(back, data)
        n += 1
    assert n > 500


def test_golden_d1_blocks():
    n = 0
    for row in _golden_rows("d1"):
        data = np.array(row["data"], dtype=np.uint32)
        init, bit = row["init"], row["bit"]
        assert K.maxbits_d1(data, init) == bit
        deltas = K.deltas_u32(data, init)
        if bit == 32:
            got = data.tobytes()
        else:
            got = K.pack_blocks(deltas.reshape(1, 128), bit).tobytes()
        assert got.hex() == row["packed"], (bit, init)
        # decode: unpack deltas then wrapping prefix sum
        if bit == 32:
            back = np.frombuffer(bytes.fromhex(row["packed"]), dtype=np.uint32)
        else:
            d = K.unpack_blocks(
                np.frombuffer(bytes.fromhex(row["packed"]), dtype=np.uint8).reshape(1, -1),
                128, bit).reshape(-1)
            back = K.prefix_sum_u32(d, init)
        np.testing.assert_array_equal(back, data)
        n += 1
    assert n >= 60


def test_golden_analyzers():
    for row in _golden_rows("maxbits"):
        data = np.array(row["data"], dtype=np.uint32)
        assert K.maxbits(data) == row["bit"]
    for row in _golden_rows("maxbitsd1"):
        data = np.array(row["data"], dtype=np.uint32)
        assert K.maxbits_d1(data, 7) == row["bit"]


def test_golden_select_search_for():
    rows = list(_golden_rows("selectFOR"))
    assert rows
    # rebuild the packed block from the matching FOR inputs is not needed:
    # replay select against our own pack of the same data distribution is
    # covered below; here check C-reported (slot, value) pairs against our
    # compressed-domain select over our own packing of the SAME stream.
    # The generator used one fixed stream; reconstruct it from search rows.
    # Instead assert agreement property-style in test_select_search_property.


# ---------------------------------------------------------------------------
# 2. Cross-check vs the pure-Python literal packer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bit", list(range(0, 33)))
def test_pure_python_crosscheck_plain(bit):
    rng = np.random.default_rng(42 + bit)
    for n in (0, 1, 3, 4, 5, 63, 127, 128, 129, 300, 1024):
        mask = 0xFFFFFFFF if bit == 32 else (1 << bit) - 1
        data = (rng.integers(0, 2**32, size=n, dtype=np.uint32) & np.uint32(mask))
        ours = K.simdpack_length(data, bit)
        theirs = RP.pack_plain([int(v) for v in data], bit)
        assert ours == theirs, (bit, n)
        np.testing.assert_array_equal(K.simdunpack_length(ours, n, bit), data)
        assert [int(v) for v in data] == RP.unpack_plain(theirs, n, bit)


@pytest.mark.parametrize("bit", [0, 1, 2, 5, 7, 8, 11, 16, 19, 25, 31, 32])
def test_pure_python_crosscheck_for(bit):
    rng = np.random.default_rng(1000 + bit)
    for n in (1, 4, 5, 127, 128, 129, 500):
        mask = 0xFFFFFFFF if bit == 32 else (1 << bit) - 1
        base = 0 if bit == 32 else 77777
        data = base + (rng.integers(0, 2**32, size=n, dtype=np.uint32) & np.uint32(mask))
        init = 0 if bit == 32 else int(data.min())
        ours = K.simdpackFOR_length(init, data, bit)
        theirs = RP.pack_for(init, [int(v) for v in data], bit)
        assert ours == theirs, (bit, n)
        np.testing.assert_array_equal(
            K.simdunpackFOR_length(init, ours, n, bit), data)


# ---------------------------------------------------------------------------
# 3. Property sweeps mirroring tests/unit.c
# ---------------------------------------------------------------------------

def test_issue21_constant_sweep():
    """issue21 (tests/unit.c:9-44): constant (1<<bw)-1 data, every width,
    many lengths; identity + EXACT compressed size."""
    for bw in range(0, 31):
        for n in (1, 4, 127, 128, 129, 1024, 4096):
            data = np.full(n, (1 << bw) - 1, dtype=np.uint32)
            b = K.maxbits(data)
            packed = K.simdpack_length(data, b)
            nfull, ntail = n // 128, n % 128
            expect = nfull * K.compressed_bytes(128, b) + (
                K.compressed_bytes(ntail, b) if ntail else 0)
            assert len(packed) == expect
            np.testing.assert_array_equal(K.simdunpack_length(packed, n, b), data)


def test_longpack_random_sweep():
    """testlongpack (tests/unit.c:131-171): every width, random masked data,
    lengths 0..2048 sampled."""
    rng = np.random.default_rng(7)
    for bit in range(0, 33):
        mask = 0xFFFFFFFF if bit == 32 else (1 << bit) - 1
        for n in (0, 1, 2, 3, 5, 8, 13, 21, 127, 128, 129, 777, 2048):
            data = rng.integers(0, 2**32, size=n, dtype=np.uint32) & np.uint32(mask)
            packed = K.simdpack_length(data, bit)
            np.testing.assert_array_equal(K.simdunpack_length(packed, n, bit), data)


def test_gap_pattern_d1_roundtrip():
    """test (tests/unit.c:583-642): datain[k] = k*gap mod 2^32 — wraparound
    deltas across every realistic width."""
    gap = 1
    while gap <= 387420489:
        n = 256
        data = (np.arange(n, dtype=np.uint64) * gap).astype(np.uint32)
        init = 0
        prev = init
        for s in range(0, n, 128):
            blk = data[s:s + 128]
            b = K.maxbits_d1(blk, prev)
            deltas = K.deltas_u32(blk, prev)
            if b == 32:
                packed = blk.tobytes()
                back = np.frombuffer(packed, dtype=np.uint32)
            elif b == 0:
                back = np.full(128, prev, dtype=np.uint32)
            else:
                packed = K.pack_blocks(deltas.reshape(1, 128), b).tobytes()
                d = K.unpack_blocks(
                    np.frombuffer(packed, dtype=np.uint8).reshape(1, -1), 128, b
                ).reshape(-1)
                back = K.prefix_sum_u32(d, prev)
            np.testing.assert_array_equal(back, blk)
            prev = int(blk[-1])
        gap *= 3


def test_maxbitsd1_length_crafted():
    """test_simdmaxbitsd1_length (tests/unit.c:695-723): deltas 1,...,1,2 →
    maxbits exactly 2, every length 1..300."""
    for n in range(1, 301):
        deltas = np.ones(n, dtype=np.uint32)
        deltas[-1] = 2
        data = np.cumsum(deltas).astype(np.uint32)  # init 0
        assert K.maxbits_d1(data, 0) == 2


def test_chars_reinterpret_roundtrip():
    """unit_chars.c:11-96: random bytes viewed as uint32 survive the codec —
    bijection on raw 32-bit words."""
    rng = np.random.default_rng(99)
    raw = rng.integers(0, 256, size=512 * 4, dtype=np.uint8)
    data = raw.view(np.uint32)
    b = K.maxbits(data)
    packed = K.simdpack_length(data, b)
    back = K.simdunpack_length(packed, data.size, b)
    np.testing.assert_array_equal(back.view(np.uint8), raw)


def test_select_search_property():
    """test_simdpackedsearch/-select shape (tests/unit.c:736-981): select and
    lower-bound search agree with full decode + np.searchsorted."""
    rng = np.random.default_rng(5)
    for bit in (1, 7, 13, 24, 31):
        vals = np.cumsum(rng.integers(0, 1 << min(bit, 8), size=128,
                                      dtype=np.uint32)).astype(np.uint32) + 31
        mn, mx = K.minmax(vals)
        b = K.bits_u32(np.asarray([mx - mn], dtype=np.uint32))[0]
        packed = K.simdpackFOR_length(mn, vals, int(b))
        for slot in range(0, 128, 11):
            assert K.select_for(mn, packed, int(b), slot) == int(vals[slot])
        for key in [int(vals[0]) - 1, int(vals[50]), int(vals[50]) + 1,
                    int(vals[-1]), int(vals[-1]) + 5]:
            idx, val = K.search_for(mn, packed, int(b), 128, key)
            expect = int(np.searchsorted(vals, key, side="left"))
            assert idx == expect
            if idx < 128:
                assert val == int(vals[idx])
        # d1 variants
        bd = K.maxbits_d1(vals, 0)
        if 0 < bd < 32:
            dp = K.pack_blocks(K.deltas_u32(vals, 0).reshape(1, 128), bd).tobytes()
            for slot in range(0, 128, 13):
                assert K.select_d1(0, dp, bd, slot) == int(vals[slot])
            idx, val = K.search_d1(0, dp, bd, 128, int(vals[77]))
            assert idx == int(np.searchsorted(vals, vals[77], side="left"))


def test_multi_arange():
    starts = np.array([10, 0, 100])
    lens = np.array([3, 0, 2])
    np.testing.assert_array_equal(K.multi_arange(starts, lens),
                                  [10, 11, 12, 100, 101])


def test_compressed_bytes_matches_reference_formula():
    for n in (0, 1, 4, 127, 128, 129, 1000):
        for b in range(0, 33):
            assert K.compressed_bytes(n, b) == RP.compressed_bytes(n, b)
    lens = np.array([0, 1, 4, 127, 128, 129, 1000])
    for b in range(33):
        np.testing.assert_array_equal(
            K.compressed_bytes_arr(lens, np.full(len(lens), b)),
            [RP.compressed_bytes(int(n), b) for n in lens])


def test_golden_fastset_chain():
    """Replay the C reference's fastset update chains: applying our fastset
    to the reference's packed state k must yield its state k+1
    (gen_golden_fastset.c, simdfastset/simdfastsetFOR)."""
    import collections
    chains = collections.defaultdict(list)
    path = GOLDEN.parent / "golden_fastset.jsonl"
    with path.open() as f:
        for line in f:
            row = json.loads(line)
            chains[(row["family"], row["bit"], row["init"])].append(row)
    assert chains
    n_checked = 0
    for (family, bit, init), rows in chains.items():
        for prev, cur in zip(rows, rows[1:]):
            buf = bytearray(bytes.fromhex(prev["packed"]))
            slot, value = cur["data"]
            if family == "fastset":
                K.fastset(buf, bit, value, slot)
            else:
                K.fastset_for(buf, init, bit, value, slot)
            assert buf.hex() == cur["packed"], (family, bit, slot)
            n_checked += 1
    assert n_checked >= 40


def test_fastset_d1_and_scan():
    rng = np.random.default_rng(11)
    vals = np.cumsum(rng.integers(1, 7, size=128, dtype=np.uint32)).astype(np.uint32)
    b = K.maxbits_d1(vals, 0)
    packed = bytearray(K.pack_blocks(K.deltas_u32(vals, 0).reshape(1, 128), b).tobytes())
    # set slot 50 to the midpoint of its neighbors (deltas stay in width)
    newv = (int(vals[49]) + int(vals[51])) // 2
    K.fastset_d1(packed, 0, b, newv, 50)
    expect = vals.copy()
    expect[50] = newv
    d = K.unpack_blocks(np.frombuffer(bytes(packed), np.uint8).reshape(1, -1),
                        128, b).reshape(-1)
    np.testing.assert_array_equal(K.prefix_sum_u32(d, 0), expect)
    assert K.scan_d1(0, bytes(packed), b) == int(expect[-1])
