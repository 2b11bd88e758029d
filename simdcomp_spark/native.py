"""Optional C fast path for the FSST string codec hot loops.

The FSST tokenizer is the one loop in the engine that is inherently
sequential per row (the next match position depends on the previous match
length), so it cannot be fully vectorized in numpy.  This module compiles a
small self-contained C kernel (written here, ~100 lines — NOT derived from
any reference source) with the system gcc on first use and loads it via
ctypes.  Everything degrades gracefully: if gcc or a C toolchain is
unavailable the callers keep using the batched-numpy path, which computes
byte-identical output from the same lookup tables.

The kernel implements exactly the numpy semantics (same LUTs, same hash
slots, same match priority), so `fsst.SymbolTable.encode_flat` is
bit-identical with or without it — tested in tests/test_codecs.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

/* Greedy FSST tokenizer over concatenated rows.
 * buf MUST be padded with >=8 zero bytes past position n.
 * Tables: lut1[256]/lut2[65536] hold a symbol code or 255 (escape);
 * hash slots (1<<hbits) hold one candidate symbol of length 3..8 as a
 * little-endian masked 8-byte value.  Returns total output bytes.
 * out must have capacity 2*n (worst case: all escapes). */
int64_t fsst_encode(const uint8_t *buf, int64_t n,
                    const int64_t *bounds, int64_t nrows,
                    const uint8_t *lut1, const uint8_t *lut2,
                    const uint8_t *slot_len, const uint8_t *slot_code,
                    const uint64_t *slot_val, const uint64_t *slot_mask,
                    int hbits, uint8_t *out, int64_t *out_lens)
{
    int64_t o = 0;
    for (int64_t r = 0; r < nrows; r++) {
        int64_t pos = bounds[r], end = bounds[r + 1];
        int64_t o0 = o;
        while (pos < end) {
            int64_t rem = end - pos;
            uint64_t w;
            memcpy(&w, buf + pos, 8);       /* LE on all target platforms */
            uint32_t key3 = (uint32_t)(w & 0xFFFFFF);
            uint32_t h = (key3 * 2654435761u) >> (32 - hbits);
            int L = slot_len[h];
            if (L >= 3 && L <= rem && (w & slot_mask[h]) == slot_val[h]) {
                out[o++] = slot_code[h];
                pos += L;
                continue;
            }
            if (rem >= 2) {
                uint8_t c2 = lut2[(uint16_t)(w & 0xFFFF)];
                if (c2 != 255) { out[o++] = c2; pos += 2; continue; }
            }
            uint8_t c1 = lut1[buf[pos]];
            out[o++] = c1;
            if (c1 == 255) out[o++] = buf[pos];   /* escape pair */
            pos += 1;
        }
        out_lens[r] = o - o0;
    }
    return o;
}

/* FSST decode: codes -> bytes.  sym_mat is (256 x 8) padded symbol bytes
 * (row 255 unused), sym_len[256] with sym_len[255] == 0 sentinel.
 * Returns total output bytes.  out must have capacity 8*n. */
int64_t fsst_decode(const uint8_t *codes, int64_t n,
                    const int64_t *bounds, int64_t nrows,
                    const uint8_t *sym_mat, const uint8_t *sym_len,
                    uint8_t *out, int64_t *out_lens)
{
    int64_t o = 0;
    for (int64_t r = 0; r < nrows; r++) {
        int64_t pos = bounds[r], end = bounds[r + 1];
        int64_t o0 = o;
        while (pos < end) {
            uint8_t c = codes[pos];
            if (c == 255) {                 /* escape: next byte literal */
                out[o++] = codes[pos + 1];
                pos += 2;
            } else {
                memcpy(out + o, sym_mat + ((size_t)c << 3), 8);
                o += sym_len[c];
                pos += 1;
            }
        }
        out_lens[r] = o - o0;
    }
    return o;
}
"""

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build_dir() -> str:
    d = os.environ.get("SIMDCOMP_NATIVE_DIR") or os.path.join(
        tempfile.gettempdir(), "simdcomp_spark_native")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> ctypes.CDLL | None:
    """Compile (once per machine) and load the kernel; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SIMDCOMP_NO_NATIVE"):
            return None
        try:
            d = _build_dir()
            so = os.path.join(d, "fsst_kernel.so")
            if not os.path.exists(so):
                src = os.path.join(d, "fsst_kernel.c")
                with open(src, "w") as f:
                    f.write(_C_SRC)
                tmp = so + f".tmp.{os.getpid()}"
                subprocess.run(
                    ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True, timeout=60)
                os.replace(tmp, so)           # atomic: racing procs are fine
            lib = ctypes.CDLL(so)
            i64, u8p, i64p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_int64))
            u64p = ctypes.POINTER(ctypes.c_uint64)
            lib.fsst_encode.restype = i64
            lib.fsst_encode.argtypes = [u8p, i64, i64p, i64, u8p, u8p, u8p,
                                        u8p, u64p, u64p, ctypes.c_int, u8p,
                                        i64p]
            lib.fsst_decode.restype = i64
            lib.fsst_decode.argtypes = [u8p, i64, i64p, i64, u8p, u8p, u8p,
                                        i64p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _p8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pu64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def encode_flat(table, buf: np.ndarray, bounds: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray] | None:
    """C fsst encode; returns (out, out_lens) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(bounds[-1])
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = buf
    out = np.empty(max(2 * n, 1), dtype=np.uint8)
    out_lens = np.empty(bounds.size - 1, dtype=np.int64)
    total = lib.fsst_encode(
        _p8(padded), n, _p64(bounds), bounds.size - 1,
        _p8(table._lut1), _p8(table._lut2), _p8(table._slot_len),
        _p8(table._slot_code), _pu64(table._slot_val64),
        _pu64(table._slot_mask64), table._hbits, _p8(out), _p64(out_lens))
    return out[:total].copy(), out_lens


def decode_flat(table, codes: np.ndarray, bounds: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray] | None:
    """C fsst decode; returns (out, out_lens) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(bounds[-1])
    padded = np.zeros(n + 1, dtype=np.uint8)      # escape reads pos+1
    padded[:n] = codes
    out = np.empty(max(8 * n, 1), dtype=np.uint8)
    out_lens = np.empty(bounds.size - 1, dtype=np.int64)
    total = lib.fsst_decode(
        _p8(padded), n, _p64(bounds), bounds.size - 1,
        _p8(table._dec_mat256), _p8(table._dec_len256),
        _p8(out), _p64(out_lens))
    return out[:total].copy(), out_lens
