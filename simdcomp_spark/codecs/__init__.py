"""Codec registry: name → codec instance."""

from __future__ import annotations

from .base import Codec
from .blockfamily import BitPackCodec, DeltaFORCodec, FORCodec
from .dictionary import DictCodec
from .rle import RLECodec

REGISTRY: dict[str, Codec] = {c.name: c for c in (
    BitPackCodec(), FORCodec(), DeltaFORCodec(), RLECodec(), DictCodec())}


def get(name: str) -> Codec:
    return REGISTRY[name]
