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


def choose_codec(arrs: list[np.ndarray]) -> tuple[str, dict[str, int]]:
    """Pick the cheapest codec for a partition given a sample of its rows.

    Returns (codec_name, {codec: predicted_total_bytes}).
    """
    sample: list[np.ndarray] = []
    tok = 0
    for a in arrs[:SAMPLE_ROW_CAP]:
        sample.append(a)
        tok += a.size
        if tok >= SAMPLE_TOKEN_CAP:
            break
    if not sample or tok == 0:
        return "bitpack", {}
    costs: dict[str, int] = {}
    for codec in CANDIDATES:
        total = int(codec.payload_sizes(sample).sum()
                    + codec.overhead_bytes(sample).sum())
        costs[codec.name] = total
    best = min(costs.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return best, costs
