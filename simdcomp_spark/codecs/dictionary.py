"""Per-row dictionary codec (north-rule addition, SURVEY.md §2.6).

Wire format per row:
    u32 n_dict | u8 bd | u8 bc | u16 pad |
    simdpack_length(sorted_unique_values, bd) | simdpack_length(codes, bc)

Rows stay self-contained (decodable in isolation — the property that makes
blocks skippable at 100 TB scale); the dictionary is the row's own sorted
distinct set, codes are positions in it.  The two sub-streams reuse the
reference bit-packing layout.  A dict of size 1 gives bc=0 → codes cost
nothing (constant rows compress to the header + one value).
"""

from __future__ import annotations

import numpy as np

from .. import kernels as K
from .base import Codec

U32 = np.uint32
_HDR = 8


class DictCodec(Codec):
    name = "dict"
    _per_block_overhead = 0

    def encode_rows(self, arrs):
        payloads = []
        for a in arrs:
            a = np.ascontiguousarray(a, dtype=U32)
            if a.size == 0:
                payloads.append(b"")
                continue
            uniq, codes = np.unique(a, return_inverse=True)
            bd = K.maxbits(uniq)
            bc = K.bits_u32(np.asarray([uniq.size - 1], dtype=U32))[0] \
                if uniq.size > 1 else 0
            hdr = int(uniq.size).to_bytes(4, "little") + bytes([bd, int(bc), 0, 0])
            payloads.append(hdr + K.simdpack_length(uniq, bd)
                            + K.simdpack_length(codes.astype(U32), int(bc)))
        n = len(arrs)
        return [b""] * n, [b""] * n, payloads

    def decode_rows(self, n_toks, widths, inits, payloads):
        out = []
        for n, p in zip(n_toks, payloads):
            n = int(n)
            if n == 0:
                out.append(np.empty(0, U32))
                continue
            nd = int.from_bytes(p[:4], "little")
            bd, bc = p[4], p[5]
            db = K.compressed_bytes(nd, bd)
            uniq = K.simdunpack_length(p[_HDR:_HDR + db], nd, bd)
            codes = K.simdunpack_length(p[_HDR + db:], n, bc)
            out.append(uniq[codes])
        return out
