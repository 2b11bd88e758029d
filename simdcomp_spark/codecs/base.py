"""Codec plugin interface.

Every codec is BATCH-oriented: it consumes a list of uint32 numpy rows (one
Arrow batch worth) and produces three parallel per-row byte columns
(widths, inits, payload) so the Spark schema stays uniform across codecs.
Codecs that don't use a column return b"" for it.
"""

from __future__ import annotations

import numpy as np


class Codec:
    """Abstract lightweight-compression codec over uint32 token rows."""

    name: str = "?"

    def encode_rows(self, arrs: list[np.ndarray]
                    ) -> tuple[list[bytes], list[bytes], list[bytes]]:
        raise NotImplementedError

    def decode_rows(self, n_toks: np.ndarray, widths: list[bytes],
                    inits: list[bytes], payloads: list[bytes]
                    ) -> list[np.ndarray]:
        raise NotImplementedError

    def payload_sizes(self, arrs: list[np.ndarray]) -> np.ndarray:
        """Exact (or tight) per-row payload bytes without materializing the
        encode — used by the cost-model auto-selector.  Default: encode."""
        _, _, payloads = self.encode_rows(arrs)
        return np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=len(payloads))

    def overhead_bytes(self, arrs: list[np.ndarray]) -> np.ndarray:
        """Per-row metadata bytes (widths + inits columns) for cost modeling."""
        nblocks = np.fromiter(((a.size + 127) // 128 for a in arrs),
                              dtype=np.int64, count=len(arrs))
        return nblocks * self._per_block_overhead

    _per_block_overhead = 1  # uint8 width
