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
from .base import Codec


class _BlockCodec(Codec):
    mode: str

    def encode_rows(self, arrs):
        return blocks.encode_batch(arrs, self.mode)

    def decode_rows(self, n_toks, widths, inits, payloads):
        return blocks.decode_batch(n_toks, widths, inits, payloads, self.mode)

    def payload_sizes(self, arrs):
        return blocks.encoded_sizes(arrs, self.mode)


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
