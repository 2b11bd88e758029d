"""FSST-style string symbol-table codec (north-rule addition, SURVEY.md
§2.6) for the string columns (doc_id, source, documents.text).

Simplified from the published FSST design (Boncz/Neumann/Kuiper, VLDB'20 —
see PAPERS.md): a table of up to 255 byte symbols of length 1..8, learned
iteratively from a sample by merging frequently adjacent symbols; code 255 is
the escape marker (next byte is a literal).  Unlike the block codecs this is
NOT a reference-parity format (the reference is integers-only); it only has
to round-trip exactly and compress.

The symbol table is learned once per Spark partition and stored in a side
table joined back on partition id at decode time (a broadcast dimension
join — Spark-idiomatic replacement for FSST's per-block table header).

Encode uses one compiled regex alternation (longest-match-first) so the hot
loop is C-side; decode is vectorized numpy gather over a concatenated symbol
buffer.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8


def train(sample: list[bytes], rounds: int = 3, budget: int = 1 << 20) -> list[bytes]:
    """Learn a symbol table from sample strings.  Deterministic."""
    data = b"\x00".join(sample)[:budget]
    if not data:
        return []
    # round 0: frequent single bytes are free candidates; then iteratively
    # merge adjacent symbol pairs weighted by gain = count * (len-1)
    symbols: list[bytes] = [bytes([b]) for b, _ in
                            Counter(data).most_common(MAX_SYMBOLS)]
    for _ in range(rounds):
        pat = _compile(symbols)
        toks = pat.findall(data)
        pair_counts: Counter = Counter()
        for a, b in zip(toks, toks[1:]):
            m = a + b
            if len(m) <= MAX_LEN:
                pair_counts[m] += 1
        gains = Counter()
        for s, c in Counter(toks).items():
            gains[s] = c * (len(s) - 1) + (1 if len(s) == 1 else 0)
        for m, c in pair_counts.items():
            gains[m] = max(gains[m], c * (len(m) - 1))
        symbols = [s for s, g in sorted(gains.items(),
                                        key=lambda kv: (-kv[1], kv[0]))
                   if g > 0][:MAX_SYMBOLS]
        if not symbols:
            break
    return symbols


def _compile(symbols: list[bytes]) -> re.Pattern:
    # longest alternatives first → greedy longest match at each position
    alts = sorted(symbols, key=len, reverse=True)
    pat = b"|".join(re.escape(s) for s in alts)
    if pat:
        pat += b"|"
    return re.compile(pat + b"(?s:.)")


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self.code_of = {s: i for i, s in enumerate(symbols)}
        self._pat = _compile(symbols)
        # token → emitted bytes: escape pairs for every single byte,
        # overridden by symbol codes (the pattern only ever yields symbols
        # or single bytes, so this lookup is total)
        self._enc_lut = {bytes([b]): bytes([ESCAPE, b]) for b in range(256)}
        self._enc_lut.update({s: bytes([i]) for i, s in enumerate(symbols)})
        # decode side: concatenated symbol buffer + offsets for numpy gather
        lens = np.fromiter((len(s) for s in symbols), dtype=np.int64,
                           count=len(symbols))
        self._sym_lens = np.concatenate((lens, [1]))  # escape slot
        self._sym_starts = np.concatenate(
            ([0], np.cumsum(self._sym_lens)))[:-1]
        self._sym_buf = np.frombuffer(b"".join(symbols) + b"\x00", dtype=np.uint8)

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, data: bytes) -> "SymbolTable":
        n = data[0]
        pos = 1
        syms = []
        for _ in range(n):
            ln = data[pos]
            syms.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        return cls(syms)

    def encode(self, s: bytes) -> bytes:
        # findall runs the tokenization fully in C; the join maps each token
        # to its 1-byte code (or escape pair) via a pre-built lookup
        lut = self._enc_lut
        return b"".join([lut[tok] for tok in self._pat.findall(s)])

    def decode(self, enc: bytes) -> bytes:
        codes = np.frombuffer(enc, dtype=np.uint8)
        if codes.size == 0:
            return b""
        # escape handling: a 255 byte means "next byte literal".  A literal
        # can itself be 255, so within each maximal run of 255s only the
        # even-offset ones are escapes (each consumes the following byte).
        is255 = codes == ESCAPE
        if is255.any():
            n = codes.size
            idx = np.arange(n, dtype=np.int64)
            run_start = is255 & ~np.concatenate(([False], is255[:-1]))
            start_ff = np.maximum.accumulate(np.where(run_start, idx, -1))
            esc = is255 & ((idx - start_ff) % 2 == 0)
            lit_pos = np.nonzero(esc)[0] + 1
            lit_pos = lit_pos[lit_pos < n]
            keep = np.ones(n, dtype=bool)
            keep[lit_pos] = False
            toks = codes[keep]          # symbol codes, ESCAPE marks literal
            literals = codes[lit_pos]
        else:
            toks = codes
            literals = np.empty(0, dtype=np.uint8)
        n_sym = len(self.symbols)
        safe = np.minimum(toks, n_sym)   # ESCAPE → sentinel slot
        lens = self._sym_lens[safe]
        starts = self._sym_starts[safe]
        total = int(lens.sum())
        # gather symbol bytes
        from ..kernels import multi_arange
        out = self._sym_buf[multi_arange(starts, lens)]
        # patch literal positions (each escape contributes exactly 1 byte)
        if literals.size:
            ends = np.cumsum(lens)
            lit_slots = np.nonzero(toks == ESCAPE)[0]
            out[ends[lit_slots] - 1] = literals
        assert out.size == total
        return out.tobytes()


def encode_batch(strings: list[bytes], table: SymbolTable | None = None
                 ) -> tuple[SymbolTable, list[bytes]]:
    if table is None:
        table = SymbolTable(train(strings))
    return table, [table.encode(s) for s in strings]


def decode_batch(encs: list[bytes], table: SymbolTable) -> list[bytes]:
    return [table.decode(e) for e in encs]
