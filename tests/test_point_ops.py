"""Vectorized compressed-domain point ops (blocks.select_flat /
blocks.search_sorted_flat) vs per-row kernel oracles, plus the Arrow int32
offset-overflow guard."""

import numpy as np
import pytest

from simdcomp_spark import blocks, kernels as K

LENS = np.array([0, 1, 5, 127, 128, 129, 300, 1000, 4096, 50])


def _rows(rng, sorted_=False):
    rows = [rng.integers(0, 2**31, size=n, dtype=np.uint32) for n in LENS]
    if sorted_:
        rows = [np.sort(r) for r in rows]
    flat = np.concatenate([r for r in rows if r.size]
                          or [np.zeros(0, np.uint32)]).astype(np.uint32)
    return rows, flat


def _sub_flat(buf, lens_, selrows):
    off = np.cumsum(lens_) - lens_
    return buf[K.multi_arange(off[selrows], lens_[selrows])]


@pytest.mark.parametrize("mode", ["plain", "for", "d1"])
def test_select_flat_matches_raw(mode):
    rng = np.random.default_rng(7)
    rows, flat = _rows(rng, sorted_=(mode == "d1"))
    enc = blocks.encode_flat(flat, LENS, mode)
    wl = enc.nblocks.copy()
    il = wl * 4 if mode != "plain" else np.zeros_like(wl)
    sub = np.nonzero(LENS > 0)[0]
    idxs = np.minimum(200, LENS - 1)
    sw = _sub_flat(enc.widths, wl, sub)
    si = _sub_flat(enc.inits.view(np.uint8), il, sub).view(np.uint32) \
        if mode != "plain" else np.zeros(0, np.uint32)
    sp = _sub_flat(enc.payload, enc.payload_lens, sub)
    vals = blocks.select_flat(LENS[sub], sw, si, sp,
                              enc.payload_lens[sub], idxs[sub], mode)
    expect = np.array([rows[r][idxs[r]] for r in sub], dtype=np.uint32)
    assert (vals == expect).all()


@pytest.mark.parametrize("key", [0, 1, 2**20, 2**30, 2**31 - 1,
                                 2**31, 2**32 - 1])
def test_search_sorted_flat_matches_searchsorted(key):
    rng = np.random.default_rng(11)
    rows, flat = _rows(rng, sorted_=True)
    enc = blocks.encode_flat(flat, LENS, "d1")
    idx = blocks.search_sorted_flat(LENS, enc.widths, enc.inits,
                                    enc.payload, enc.payload_lens, key)
    expect = np.array([np.searchsorted(r, np.uint32(key), "left")
                       for r in rows])
    assert (idx == expect).all()


@pytest.mark.parametrize("key", [0, 1, 2**20, 2**30, 2**31 - 1,
                                 2**31, 2**32 - 1])
def test_search_sorted_for_flat_matches_searchsorted(key):
    rng = np.random.default_rng(17)
    rows, flat = _rows(rng, sorted_=True)
    enc = blocks.encode_flat(flat, LENS, "for")
    idx = blocks.search_sorted_for_flat(LENS, enc.widths, enc.inits,
                                        enc.payload, enc.payload_lens, key)
    expect = np.array([np.searchsorted(r, np.uint32(key), "left")
                       for r in rows])
    assert (idx == expect).all()


def test_search_sorted_for_flat_duplicates_across_blocks():
    """Duplicates spanning a block boundary must resolve to the FIRST
    occurrence (the earlier block), not the block whose min equals key."""
    rng = np.random.default_rng(19)
    rows = [np.sort(rng.integers(0, 60, size=n, dtype=np.uint32))
            for n in (77, 500, 128, 256)]
    flat = np.concatenate(rows)
    lens = np.array([77, 500, 128, 256])
    enc = blocks.encode_flat(flat, lens, "for")
    for key in range(0, 65, 5):
        idx = blocks.search_sorted_for_flat(lens, enc.widths, enc.inits,
                                            enc.payload, enc.payload_lens,
                                            key)
        expect = np.array([np.searchsorted(r, np.uint32(key), "left")
                           for r in rows])
        assert (idx == expect).all(), key


def test_search_sorted_flat_duplicates():
    rng = np.random.default_rng(13)
    rows = [np.sort(rng.integers(0, 50, size=n, dtype=np.uint32))
            for n in (77, 500, 128)]
    flat = np.concatenate(rows)
    lens = np.array([77, 500, 128])
    enc = blocks.encode_flat(flat, lens, "d1")
    for key in range(0, 55, 7):
        idx = blocks.search_sorted_flat(lens, enc.widths, enc.inits,
                                        enc.payload, enc.payload_lens, key)
        expect = np.array([np.searchsorted(r, np.uint32(key), "left")
                           for r in rows])
        assert (idx == expect).all(), key


def test_arrow_offset_overflow_raises():
    """A batch whose payload exceeds int32 offset range must raise, not
    silently wrap (the corruption mode the int64-accumulate guard blocks)."""
    from simdcomp_spark.engine import _binary_from_flat, _list_from_flat
    lens = np.full(3, 2**30, dtype=np.int64)  # 3 GiB total
    with pytest.raises(ValueError, match="int32 offset"):
        _binary_from_flat(np.zeros(1, dtype=np.uint8), lens)
    with pytest.raises(ValueError, match="int32 offset"):
        _list_from_flat(np.zeros(1, dtype=np.int32), lens)


@pytest.mark.parametrize("mode", ["for", "d1"])
def test_search_sorted_flat_trailing_empty_row(mode):
    """Regression: a trailing 0-length row made row_first_block[-1] point
    one past the per-block arrays; the FOR variant crashed with IndexError
    (LENS puts its 0-length row first, which missed this)."""
    rng = np.random.default_rng(23)
    lens = np.array([300, 0, 5, 0])
    rows = [np.sort(rng.integers(0, 2**31, size=n, dtype=np.uint32))
            for n in lens]
    flat = np.concatenate([r for r in rows if r.size]).astype(np.uint32)
    enc = blocks.encode_flat(flat, lens, mode)
    fn = blocks.search_sorted_flat if mode == "d1" \
        else blocks.search_sorted_for_flat
    for key in (0, 2**20, 2**30, 2**32 - 1):
        idx = fn(lens, enc.widths, enc.inits, enc.payload,
                 enc.payload_lens, key)
        expect = np.array([np.searchsorted(r, np.uint32(key), "left")
                           for r in rows])
        assert (idx == expect).all(), key


def test_progressive_search_cursor_matches_reference_protocol():
    """Mirror of the reference's simdsearchd1 unit test
    (tests/unit.c:736-773): buffer = 1..128 delta-packed at every width,
    key k must return index k-1 with value k; key 0 returns 0; key 200
    returns 128 (not found).  Then the PROGRESSIVE multi-block protocol:
    1..384 across three blocks, the cursor carrying the running init
    between calls exactly like the reference's initOffset vector."""
    arr = np.arange(1, 129, dtype=np.uint32)
    deltas = np.diff(arr, prepend=np.uint32(0)).astype(np.uint32)
    for b in range(1, 33):
        # engine wire format: b==32 blocks store RAW values, not deltas
        # (pack_blocks_flat's b==32 fast path); narrower blocks store deltas
        packed = K.simdpack_length(arr if b == 32 else deltas, b)
        cur = K.SearchCursorD1(0)
        assert cur.search(packed, b, 0)[0] == 0
        for k in range(1, 129):
            idx, val = K.SearchCursorD1(0).search(packed, b, k)
            assert idx == k - 1 and val == k, (b, k)
        assert K.SearchCursorD1(0).search(packed, b, 200)[0] == 128
    # multi-block progressive scan: 3 blocks of 128, running cursor
    full = np.arange(1, 385, dtype=np.uint32)
    blocks_ = []
    prev = np.uint32(0)
    for blk in range(3):
        seg = full[blk * 128:(blk + 1) * 128]
        d = np.diff(seg, prepend=prev).astype(np.uint32)
        blocks_.append((K.simdpack_length(d, 9), 9, 128))
        prev = seg[-1]
    for key in (1, 128, 129, 200, 384):
        idx, val = K.scan_search_d1(blocks_, key)
        assert idx == key - 1 and val == key, key
    assert K.scan_search_d1(blocks_, 1000) == (384, 0)
    # cursor state advances identically on found and not-found paths
    cur = K.SearchCursorD1(0)
    cur.search(*blocks_[0][:2], 1000, 128)        # not found in block 0
    assert cur.init == 128


def test_contains_token_zone_prune(spark):
    """Compressed-domain membership: exact hits, and the zone prescreen
    PROVABLY skips payloads — out-of-zone probes run against rows whose
    payload bytes were replaced with garbage, so any decode attempt
    would throw; a clean empty result means the bytes were never
    touched."""
    from pyspark.sql import functions as F
    from simdcomp_spark import engine

    df = spark.createDataFrame(
        [(str(i), [100 + i, 200 + i, 300 + i], 3, "u")
         for i in range(50)],
        "doc_id string, tokens array<int>, n_tok int, source string")
    enc = engine.encode(df, codec="for", split_threshold=None).cache()
    got = {r["doc_id"] for r in engine.contains_token(enc, 210).collect()}
    assert got == {"10"}
    # absent but inside the zone envelope: candidates decode, none match
    assert engine.contains_token(enc, 199).count() == 0
    # outside every block zone: poisoned payloads prove no decode happens
    poisoned = enc.withColumn("payload", F.lit(b"").cast("binary"))
    assert engine.contains_token(poisoned, 50).count() == 0
    assert engine.contains_token(poisoned, 1 << 20).count() == 0
    # bitpack envelope: t above 2^maxwidth prunes, in-range decodes
    enc_bp = engine.encode(df, codec="bitpack", split_threshold=None)
    got = {r["doc_id"]
           for r in engine.contains_token(enc_bp, 349).collect()}
    assert got == {"49"}
    poisoned_bp = enc_bp.withColumn("payload",
                                    F.lit(b"").cast("binary"))
    assert engine.contains_token(poisoned_bp, 1 << 20).count() == 0
    # mixed codecs via auto (d1/rle rows stay conservative candidates)
    enc_auto = engine.encode(df, codec="auto", split_threshold=None)
    got = {r["doc_id"]
           for r in engine.contains_token(enc_auto, 225).collect()}
    assert got == {"25"}
    # widened seg_id (bigint) casts back instead of failing mapInArrow
    wide = enc.withColumn("seg_id", F.col("seg_id").cast("long"))
    got = {r["doc_id"]
           for r in engine.contains_token(wide, 210).collect()}
    assert got == {"10"}
    # probe SET (blocklist scan): union of single-probe results
    got = {r["doc_id"] for r in
           engine.contains_token(enc, [210, 305, 999999]).collect()}
    assert got == {"10", "5"}
    # all probes out of zone: poisoned payloads still never decode
    assert engine.contains_token(poisoned, [1, 50, 1 << 20]).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="empty probe"):
        engine.contains_token(enc, [])


def test_contains_token_sorted_d1_zone(spark):
    """assume_sorted extends zone pruning to d1: probes above every
    row's maximum never decode (poisoned payloads prove it), in-range
    probes resolve exactly, and the default stays conservative."""
    from pyspark.sql import functions as F
    from simdcomp_spark import engine

    rows = [(str(i), [1000 * i + 2 * j for j in range(300)], 300, "u")
            for i in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    enc = engine.encode(df, codec="d1", split_threshold=None).cache()
    got = {r["doc_id"] for r in
           engine.contains_token(enc, 3 * 1000 + 2 * 77,
                                 assume_sorted=True).collect()}
    assert got == {"3"}
    # absent odd value inside the range: candidate, decodes, no hit
    assert engine.contains_token(enc, 3 * 1000 + 1,
                                 assume_sorted=True).count() == 0
    poisoned = enc.withColumn("payload", F.lit(b"").cast("binary"))
    assert engine.contains_token(poisoned, 1 << 22,
                                 assume_sorted=True).count() == 0
    # default: conservative (d1 decodes) — still exact
    got = {r["doc_id"] for r in
           engine.contains_token(enc, 5 * 1000).collect()}
    assert got == {"5"}


def _enc_quintuple(rows):
    """Encode a ragged list of sorted uint32 rows with d1; return the
    flat-arg tuple intersect_sorted_flat takes for one side."""
    lens = np.fromiter((r.size for r in rows), dtype=np.int64,
                       count=len(rows))
    flat = np.concatenate([r for r in rows if r.size]
                          or [np.zeros(0, np.uint32)]).astype(np.uint32)
    enc = blocks.encode_flat(flat, lens, "d1")
    return lens, enc.widths, enc.inits, enc.payload, enc.payload_lens


def test_intersect_sorted_flat_matches_numpy():
    """Zone-skipped SvS intersection == np.intersect1d per row on random
    sorted DISTINCT rows of many shapes (empty, short-tail, multi-block,
    disjoint, identical)."""
    rng = np.random.default_rng(23)
    shapes = [(0, 0), (1, 1), (5, 300), (128, 128), (129, 4096),
              (1000, 1000), (300, 0), (4096, 50), (127, 129)]
    rows_a, rows_b = [], []
    for na, nb in shapes:
        # overlapping domains so intersections are non-trivial
        pool = rng.choice(2**20, size=max(na + nb, 1) * 2, replace=False)
        rows_a.append(np.sort(pool[:na]).astype(np.uint32))
        rows_b.append(np.sort(pool[na // 2:na // 2 + nb])
                      .astype(np.uint32))
    # plus: disjoint ranges (all B blocks prunable), identical rows
    rows_a += [np.arange(100, dtype=np.uint32),
               np.arange(500, dtype=np.uint32) * 3]
    rows_b += [np.arange(10**6, 10**6 + 900, dtype=np.uint32),
               np.arange(500, dtype=np.uint32) * 3]
    out_flat, out_lens = blocks.intersect_sorted_flat(
        *_enc_quintuple(rows_a), *_enc_quintuple(rows_b))
    off = np.cumsum(out_lens) - out_lens
    for i, (a, b) in enumerate(zip(rows_a, rows_b)):
        want = np.intersect1d(a, b)
        got = out_flat[off[i]:off[i] + out_lens[i]]
        assert (got == want).all(), (i, got[:5], want[:5])


def test_intersect_sorted_flat_skips_pruned_payload():
    """Pruning proof: garble the payload bytes of every B block whose
    zone envelope excludes all A values — identical result means those
    bytes were never decoded."""
    rng = np.random.default_rng(29)
    # A probes live in [0, 1000); B has those plus far-away blocks
    a = [np.sort(rng.choice(1000, 80, replace=False)).astype(np.uint32)]
    b = [np.concatenate([
        np.sort(rng.choice(1000, 100, replace=False)),
        np.arange(10**7, 10**7 + 512)]).astype(np.uint32)]
    la, wa, ia, pa_, pla = _enc_quintuple(a)
    lb, wb, ib, pb, plb = _enc_quintuple(b)
    want_flat, want_lens = blocks.intersect_sorted_flat(
        la, wa, ia, pa_, pla, lb, wb, ib, pb, plb)
    assert want_lens[0] > 0
    # garble every byte belonging to blocks with init >= 10**7 (the
    # far-away half) — sound zones must never read them
    row_id, blk_start, blk_len, _nb = blocks._block_table(lb)
    sizes = K.compressed_bytes_arr(blk_len, wb.astype(np.int64))
    excl = np.cumsum(sizes) - sizes
    poisoned = pb.copy()
    for j in np.nonzero(ib.astype(np.int64) >= 10**7)[0]:
        poisoned[excl[j]:excl[j] + sizes[j]] = 0xFF
    got_flat, got_lens = blocks.intersect_sorted_flat(
        la, wa, ia, pa_, pla, lb, wb, ib, poisoned, plb)
    assert (got_lens == want_lens).all()
    assert (got_flat == want_flat).all()


def test_intersect_encoded_spark(spark):
    """Engine-level pairwise intersection: broadcast-join pairs, exact
    vs a driver-computed oracle; non-d1 input raises in-plan."""
    from pyspark.sql import functions as F
    from simdcomp_spark import engine

    rng = np.random.default_rng(31)
    lists = {f"t{i}": np.sort(rng.choice(5000, size=400 + 64 * i,
                                         replace=False))
             for i in range(4)}
    df = spark.createDataFrame(
        [(k, [int(x) for x in v], int(v.size), "u")
         for k, v in lists.items()],
        "doc_id string, tokens array<int>, n_tok int, source string")
    enc = engine.encode(df, codec="d1", split_threshold=None).cache()
    quint = ["n_tok", "codec", "widths", "inits", "payload"]
    a = enc.select(F.col("doc_id").alias("ka"),
                   *[F.col(c).alias(f"a_{c}") for c in quint])
    b = enc.select(F.col("doc_id").alias("kb"),
                   *[F.col(c).alias(f"b_{c}") for c in quint])
    pairs = a.join(F.broadcast(b), F.col("ka") < F.col("kb"))
    out = {(r["ka"], r["kb"]): (r["common"], r["n_common"])
           for r in engine.intersect_encoded(pairs, ["ka", "kb"])
           .collect()}
    assert len(out) == 6
    for (ka, kb), (common, n) in out.items():
        want = np.intersect1d(lists[ka], lists[kb])
        assert n == want.size and (np.array(common) == want).all()
    # non-d1 rows must refuse loudly (zone math unsound otherwise)
    enc_bp = engine.encode(df, codec="bitpack", split_threshold=None)
    bad = (enc_bp.select(F.col("doc_id").alias("ka"),
                         *[F.col(c).alias(f"a_{c}") for c in quint])
           .join(F.broadcast(b), F.col("ka") < F.col("kb")))
    with pytest.raises(Exception, match="d1-only"):
        engine.intersect_encoded(bad, ["ka", "kb"]).collect()
