"""AVX2 / AVX-512 wire-format bit-identity vs the COMPILED reference
(tests/golden/golden_avx.jsonl, dumped by tests/golden/gen_golden_avx.c
from /root/reference/src/avxbitpacking.c + avx512bitpacking.c)."""

import json
from pathlib import Path

import numpy as np
import pytest

from simdcomp_spark import kernels as K

GOLDEN = Path(__file__).parent / "golden" / "golden_avx.jsonl"


def _xorshift32(seed: int, n: int) -> np.ndarray:
    """Replays gen_golden_avx.c's data generator exactly."""
    out = np.empty(n, dtype=np.uint32)
    x = np.uint32(seed)
    for i in range(n):
        x ^= np.uint32((int(x) << 13) & 0xFFFFFFFF)
        x ^= x >> np.uint32(17)
        x ^= np.uint32((int(x) << 5) & 0xFFFFFFFF)
        out[i] = x
    return out


def _rows():
    with open(GOLDEN) as f:
        return [json.loads(line) for line in f]


@pytest.mark.parametrize("row", _rows(),
                         ids=lambda r: f"{r['family']}-b{r['bit']}")
def test_avx_family_bit_identical(row):
    bit, n = row["bit"], row["n"]
    mask = np.uint32(0xFFFFFFFF if bit == 32 else (1 << bit) - 1)
    data = _xorshift32(row["seed"], n) & mask
    if row["family"] == "avx":
        pack, unpack, mb = K.avxpack, K.avxunpack, K.avxmaxbits
    else:
        pack, unpack, mb = K.avx512pack, K.avx512unpack, K.avx512maxbits
    assert mb(data) == row["maxbits"]
    packed = pack(data, bit)
    assert packed.hex() == row["packed"], (row["family"], bit)
    assert (unpack(packed, bit) == data).all()
    # masked variant: wider inputs truncate to the same bytes
    if 0 < bit < 32:
        wide = data | (np.uint32(1) << np.uint32(bit))
        assert pack(wide, bit, mask=True) == packed
