"""Per-partition cost-model codec auto-selector (north rule,
BASELINE.json — "per-partition cost-model auto-selector"; SURVEY.md §2.6).

The reference's per-block adaptive width (b = maxbits,
/root/reference/example.c:143-145) is the seed idea; we extend it across
whole codecs: on a bounded sample of each partition, compute the EXACT
encoded size each candidate codec would produce (closed-form from the
analyze pass — no trial encode for the block family) and pick the argmin of
payload + per-row metadata overhead.  The choice is recorded per partition
in the metrics stream.
"""

from __future__ import annotations

import numpy as np

from .blockfamily import BitPackCodec, DeltaFORCodec, FORCodec
from .dictionary import DictCodec
from .rle import RLECodec

SAMPLE_TOKEN_CAP = 1 << 18  # analyze at most 256k tokens per partition
SAMPLE_ROW_CAP = 512

CANDIDATES = (BitPackCodec(), FORCodec(), DeltaFORCodec(), RLECodec(),
              DictCodec())


def choose_codec_flat(flat: np.ndarray, lens: np.ndarray
                      ) -> tuple[str, dict[str, int]]:
    """Pick the cheapest codec for a partition given a flat sample of its
    rows.  Returns (codec_name, {codec: predicted_total_bytes})."""
    lens = np.asarray(lens, dtype=np.int64)
    # bound the sample: first ≤512 rows, ≤256k tokens
    nrows = min(lens.size, SAMPLE_ROW_CAP)
    csum = np.cumsum(lens[:nrows])
    cut = int(np.searchsorted(csum, SAMPLE_TOKEN_CAP)) + 1
    nrows = max(1, min(nrows, cut))
    slens = lens[:nrows]
    sflat = np.ascontiguousarray(flat[:int(slens.sum())], dtype=np.uint32)
    if sflat.size == 0:
        return "bitpack", {}
    nblocks = (slens + 127) // 128
    costs: dict[str, int] = {}
    for codec in CANDIDATES:
        total = int(codec.payload_sizes_flat(sflat, slens).sum()
                    + nblocks.sum() * codec._per_block_overhead)
        costs[codec.name] = total
    best = min(costs.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return best, costs


def choose_codec(arrs: list[np.ndarray]) -> tuple[str, dict[str, int]]:
    from .base import concat_rows
    flat, lens = concat_rows(arrs[:SAMPLE_ROW_CAP])
    return choose_codec_flat(flat, lens)
