"""The three reference block codecs (SURVEY.md §2.2-§2.4), thin wrappers over
the batched block engine in :mod:`simdcomp_spark.blocks`:

* ``bitpack`` — per-block-maxbits binary packing
  (``simdpackwithoutmask``/``simdunpack``, src/simdbitpacking.c);
* ``for`` — frame-of-reference vs per-block min
  (``simdpackFOR``/``simdunpackFOR``, src/simdfor.c, width per
  tests/unit.c:659-666);
* ``d1`` — integrated delta+bit-pack for sorted runs
  (``simdpackwithoutmaskd1``/``simdunpackd1``,
  src/simdintegratedbitpacking.c), per-block chain inits stored explicitly
  for parallel decode (vs example.c:71's sequential chaining).
"""

from __future__ import annotations

import numpy as np

from .. import blocks
from .base import Codec, FlatEncoded


class _BlockCodec(Codec):
    mode: str

    def encode_flat(self, flat, lens):
        e = blocks.encode_flat(flat, lens, self.mode)
        ini_lens = e.nblocks * 4 if e.inits.size else \
            np.zeros(lens.size, dtype=np.int64)
        return FlatEncoded(e.widths, e.nblocks.astype(np.int64),
                           e.inits.view(np.uint8), ini_lens,
                           e.payload, e.payload_lens)

    def decode_flat(self, lens, widths, widths_lens, inits, inits_lens,
                    payload, payload_lens):
        return blocks.decode_flat(lens, widths, inits.view(np.uint32),
                                  payload, payload_lens, self.mode)

    def payload_sizes_flat(self, flat, lens):
        return blocks.encoded_sizes_flat(flat, lens, self.mode)


class BitPackCodec(_BlockCodec):
    name = "bitpack"
    mode = "plain"
    _per_block_overhead = 1


class FORCodec(_BlockCodec):
    name = "for"
    mode = "for"
    _per_block_overhead = 5  # uint8 width + uint32 base


class DeltaFORCodec(_BlockCodec):
    name = "d1"
    mode = "d1"
    _per_block_overhead = 5  # uint8 width + uint32 chain init
